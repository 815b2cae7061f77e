"""Round-10 CH SQL-surface additions (VERDICT r9 items 3/5/7):
deterministic groupArray over a sorted subquery, the row-count
SAMPLE n form, and the join-backed large-dictionary dictGet path."""
from __future__ import annotations

import pytest

from rsyslog_nginx_clickhouse_spark.functions.macros import (
    declare_sample_by,
    rewrite_aggregates,
    rewrite_group_array,
    rewrite_sample,
)

# --------------------------------------------------------- groupArray --


def test_group_array_sorted_subquery_rewrite():
    out = rewrite_aggregates(
        "SELECT g, groupArray(x) AS seq "
        "FROM (SELECT g, x, k FROM t ORDER BY k) GROUP BY g")
    assert ("transform(sort_array(collect_list(struct(k AS __o0, "
            "(x) AS __v))), s -> s.__v)") in out
    assert "groupArray" not in out


def test_group_array_multi_key_and_multi_call():
    out = rewrite_group_array(
        "SELECT g, groupArray(a), groupArray(b || c) "
        "FROM (SELECT * FROM t ORDER BY k1, k2 ASC) GROUP BY g")
    assert out.count("sort_array(collect_list(struct(k1 AS __o0, "
                     "k2 AS __o1,") == 2
    assert "(b || c) AS __v" in out


def test_group_array_refusals():
    # no sorted subquery at all
    with pytest.raises(ValueError, match="order-dependent"):
        rewrite_group_array("SELECT groupArray(x) FROM t GROUP BY g")
    # DESC keys
    with pytest.raises(ValueError, match="order-dependent"):
        rewrite_group_array(
            "SELECT groupArray(x) FROM (SELECT x FROM t ORDER BY k "
            "DESC) GROUP BY g")
    # expression keys
    with pytest.raises(ValueError, match="order-dependent"):
        rewrite_group_array(
            "SELECT groupArray(x) FROM (SELECT x FROM t ORDER BY "
            "abs(k)) GROUP BY g")
    # two sorted subqueries with DIFFERENT key lists: ambiguous
    with pytest.raises(ValueError, match="one shared key list"):
        rewrite_group_array(
            "SELECT groupArray(x) FROM (SELECT x FROM t ORDER BY a) "
            "JOIN (SELECT y FROM u ORDER BY b) ON x = y")


def test_group_array_literal_safety():
    # string DATA mentioning groupArray comes back byte-identical
    q = "SELECT 'groupArray(x)' AS s FROM t"
    assert rewrite_group_array(q) == q
    assert rewrite_aggregates(q) == q
    # groupUniqArray is NOT captured by the groupArray pass
    out = rewrite_aggregates(
        "SELECT groupUniqArray(x) FROM t GROUP BY g")
    assert "sort_array(collect_set(x))" in out


def test_group_array_executes(spark):
    spark.createDataFrame(
        [(1, 3, "c"), (1, 1, "a"), (1, 2, "b"), (2, 1, "z")],
        "g int, k int, x string").createOrReplaceTempView("ga_t")
    from rsyslog_nginx_clickhouse_spark.functions.macros import sql

    rows = sql(spark, """
        SELECT g, arrayStringConcat(groupArray(x), ',') AS seq
        FROM (SELECT g, k, x FROM ga_t ORDER BY k)
        GROUP BY g ORDER BY g
    """).collect()
    assert [(r.g, r.seq) for r in rows] == [(1, "a,b,c"), (2, "z")]


def test_group_array_partition_invariance(spark):
    """The sorted-collect is identical at any partition count — the
    distributed determinism ClickHouse itself cannot promise."""
    from rsyslog_nginx_clickhouse_spark.functions.macros import sql

    base = spark.range(0, 200).selectExpr(
        "CAST(id % 7 AS INT) AS g", "CAST(id AS INT) AS k",
        "CAST(id * 37 % 100 AS STRING) AS x")
    q = """
        SELECT g, arrayStringConcat(groupArray(x), ',') AS seq
        FROM (SELECT g, k, x FROM ga_p ORDER BY k)
        GROUP BY g ORDER BY g
    """
    base.coalesce(1).createOrReplaceTempView("ga_p")
    one = [tuple(r) for r in sql(spark, q).collect()]
    base.repartition(13).createOrReplaceTempView("ga_p")
    many = [tuple(r) for r in sql(spark, q).collect()]
    assert one == many


# ----------------------------------------------------------- SAMPLE n --


def test_sample_rowcount_inverts_fraction():
    declare_sample_by("srt", "user_id")
    out = rewrite_sample("SELECT 1 FROM srt SAMPLE 3000",
                         count_of=lambda t: 12000)
    # 3000/12000 = 0.25 → factor 4.0, hi = 2^30
    assert "CAST(4.0 AS DOUBLE) AS _sample_factor" in out
    assert "< 1073741824" in out and ">= 0" in out


def test_sample_rowcount_at_least_total_reads_everything():
    declare_sample_by("srt", "user_id")
    out = rewrite_sample("SELECT 1 FROM srt SAMPLE 5000",
                         count_of=lambda t: 100)
    assert "_sample_factor" in out and "md5" not in out
    assert "CAST(1.0 AS DOUBLE)" in out


def test_sample_one_is_the_whole_table():
    # CH: SAMPLE 1 is the FRACTION 1.0 — never a 1-row sample
    declare_sample_by("srt", "user_id")
    out = rewrite_sample("SELECT 1 FROM srt SAMPLE 1")
    assert "md5" not in out and "CAST(1.0 AS DOUBLE)" in out


def test_sample_rowcount_refusals():
    declare_sample_by("srt", "user_id")
    with pytest.raises(ValueError, match="OFFSET is defined only"):
        rewrite_sample("SELECT 1 FROM srt SAMPLE 1000 OFFSET 0.5",
                       count_of=lambda t: 10)
    with pytest.raises(ValueError, match="row count to invert"):
        rewrite_sample("SELECT 1 FROM srt SAMPLE 1000")  # no counter
    with pytest.raises(ValueError, match="empty"):
        rewrite_sample("SELECT 1 FROM srt SAMPLE 1000",
                       count_of=lambda t: 0)


# ------------------------------------------------------ dictGet large --


def _mk_dim(spark, n):
    return spark.range(n).selectExpr(
        "CAST(id AS INT) AS k",
        "concat('name_', CAST(id AS STRING)) AS nm")


def test_join_dictionary_values_and_default(spark):
    from rsyslog_nginx_clickhouse_spark.functions.dictionary import (
        declare_dictionary,
    )
    from rsyslog_nginx_clickhouse_spark.functions.macros import sql

    declare_dictionary(spark, "jd", _mk_dim(spark, 50), key_col="k",
                       attrs={"nm": "'missing'"}, style="join")
    spark.createDataFrame([(3,), (49,), (777,)], "k int") \
         .createOrReplaceTempView("jd_facts")
    rows = sql(spark, "SELECT k, dictGet('jd', 'nm', k) AS nm "
                      "FROM jd_facts ORDER BY k").collect()
    assert [(r.k, r.nm) for r in rows] == [
        (3, "name_3"), (49, "name_49"), (777, "missing")]


def test_join_dictionary_plans_broadcast_hash(spark):
    from rsyslog_nginx_clickhouse_spark.functions.dictionary import (
        declare_dictionary,
    )
    from rsyslog_nginx_clickhouse_spark.functions.macros import sql

    declare_dictionary(spark, "jdp", _mk_dim(spark, 50), key_col="k",
                       attrs={"nm": "'missing'"}, style="join")
    spark.range(10).selectExpr("CAST(id AS INT) AS k") \
         .createOrReplaceTempView("jdp_facts")
    plan = sql(spark, "SELECT dictGet('jdp', 'nm', k) AS nm "
                      "FROM jdp_facts")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan


def test_auto_style_degrades_over_cap(spark):
    from rsyslog_nginx_clickhouse_spark.functions import dictionary
    from rsyslog_nginx_clickhouse_spark.functions.macros import sql

    # shrink the cap so the test doesn't build a 10k-literal plan
    old = dictionary.MAX_DICT_ROWS
    dictionary.MAX_DICT_ROWS = 20
    try:
        dictionary.declare_dictionary(
            spark, "bigd", _mk_dim(spark, 200), key_col="k",
            attrs={"nm": "'missing'"})  # auto
        with pytest.raises(ValueError, match="style='join'"):
            dictionary.declare_dictionary(
                spark, "bigd2", _mk_dim(spark, 200), key_col="k",
                attrs={"nm": "'missing'"}, style="literal")
    finally:
        dictionary.MAX_DICT_ROWS = old
    spark.createDataFrame([(150,), (999,)], "k int") \
         .createOrReplaceTempView("bigd_facts")
    rows = sql(spark, "SELECT dictGet('bigd', 'nm', k) AS nm "
                      "FROM bigd_facts ORDER BY k").collect()
    assert [r.nm for r in rows] == ["name_150", "missing"]


def test_join_dictionary_duplicate_keys_refused(spark):
    from rsyslog_nginx_clickhouse_spark.functions.dictionary import (
        declare_dictionary,
    )

    dup = spark.createDataFrame([(1, "a"), (1, "b")], "k int, nm string")
    with pytest.raises(ValueError, match="duplicate key"):
        declare_dictionary(spark, "dupd", dup, key_col="k",
                           attrs={"nm": "'x'"}, style="join")


# --------------------------------------------------- ANY/GLOBAL JOIN --


def test_any_join_rewrite_shapes():
    from rsyslog_nginx_clickhouse_spark.functions.macros import (
        rewrite_any_join,
    )

    out = rewrite_any_join(
        "SELECT a FROM e GLOBAL ANY LEFT JOIN s AS x USING (k) "
        "GROUP BY a")
    assert "GLOBAL" not in out
    assert ("LEFT JOIN (SELECT __s.* FROM (SELECT max(struct(*)) AS "
            "__s FROM s GROUP BY k) __anyd1) AS x USING (k)") in out
    # bare ANY JOIN defaults to INNER (CH semantics); multi-key GROUP
    out = rewrite_any_join("SELECT a FROM e ANY JOIN s USING (k1, k2)")
    assert out.startswith("SELECT a FROM e INNER JOIN (")
    assert "GROUP BY k1, k2" in out and "USING (k1, k2)" in out
    # ALL and GLOBAL strip to the bare join
    assert rewrite_any_join("SELECT a FROM e ALL INNER JOIN s "
                            "USING (k)") == \
        "SELECT a FROM e INNER JOIN s USING (k)"
    assert rewrite_any_join("SELECT a FROM e GLOBAL LEFT JOIN s "
                            "USING (k)") == \
        "SELECT a FROM e LEFT JOIN s USING (k)"
    # GLOBAL also precedes ASOF in distributed CH — the strip feeds
    # the ASOF rewrite downstream
    assert rewrite_any_join("SELECT a FROM e GLOBAL ASOF LEFT JOIN s "
                            "ON e.u = s.u AND e.t >= s.t") == \
        "SELECT a FROM e ASOF LEFT JOIN s ON e.u = s.u AND e.t >= s.t"


def test_any_join_refusals_and_literal_safety():
    import pytest

    from rsyslog_nginx_clickhouse_spark.functions.macros import (
        rewrite_any_join,
    )

    # r11: ANY RIGHT (left-side mirror dedup) and the qualified
    # equi-ON form now REWRITE instead of refusing — their shapes and
    # refusal boundaries are pinned in test_round11.py; what must
    # still refuse here is a left side that isn't a simple FROM table
    out = rewrite_any_join("SELECT a FROM e ANY RIGHT JOIN s USING (k)")
    assert "max(struct(*)) AS __s FROM e" in out
    out = rewrite_any_join("SELECT a FROM e ANY LEFT JOIN s ON e.k = s.k")
    assert "ON e.k = s.k" in out
    with pytest.raises(ValueError, match="simple"):
        rewrite_any_join("SELECT a FROM x JOIN y USING (j) "
                         "ANY RIGHT JOIN s USING (k)")
    # string DATA and the any() aggregate survive untouched
    q = "SELECT 'GLOBAL ANY JOIN' AS s FROM t"
    assert rewrite_any_join(q) == q
    q2 = "SELECT any(x) FROM t"
    assert rewrite_any_join(q2) == q2


def test_any_join_executes_deterministic_pick(spark):
    from rsyslog_nginx_clickhouse_spark.functions.macros import sql

    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k int, lbl string"
    ).createOrReplaceTempView("anyl")
    # two matches for k=1: the pick must be the greatest full row
    spark.createDataFrame(
        [(1, 10, "old"), (1, 20, "new"), (2, 5, "only")],
        "k int, v int, tag string"
    ).createOrReplaceTempView("anyr")
    rows = sql(spark, """
        SELECT k, lbl, v, tag
        FROM anyl ANY LEFT JOIN anyr USING (k) ORDER BY k
    """).collect()
    assert [tuple(r) for r in rows] == [
        (1, "a", 20, "new"), (2, "b", 5, "only")]
    # exactly one output row per left row — never a multi-match fanout
    assert len(rows) == 2


# --------------------------------------------- multiIf / uniq aliases --


def test_multi_if_rewrites_to_case():
    out = rewrite_aggregates(
        "SELECT multiIf(a > 1, 'x', b < 2, 'y', 'z') AS c FROM t")
    assert out == ("SELECT CASE WHEN a > 1 THEN 'x' WHEN b < 2 "
                   "THEN 'y' ELSE 'z' END AS c FROM t")
    # nested multiIf in the arguments
    assert rewrite_aggregates("SELECT multiIf(a, multiIf(b, 1, 2), 3) "
                              "FROM t") == \
        ("SELECT CASE WHEN a THEN CASE WHEN b THEN 1 ELSE 2 END "
         "ELSE 3 END FROM t")
    # literal safety + loud even-arity refusal
    q = "SELECT 'multiIf(a,b)' AS s FROM t"
    assert rewrite_aggregates(q) == q
    with pytest.raises(ValueError, match="odd number"):
        rewrite_aggregates("SELECT multiIf(a, 1) FROM t")


def test_uniq_sketch_variant_aliases():
    out = rewrite_aggregates(
        "SELECT uniqCombined(u), uniqCombined64(u), uniqHLL12(v) "
        "FROM t")
    assert out.count("approx_count_distinct(") == 3
    assert "uniq" not in out


def test_multi_if_executes(spark):
    from rsyslog_nginx_clickhouse_spark.functions.macros import sql

    spark.createDataFrame([(1,), (5,), (50,)], "v int") \
         .createOrReplaceTempView("mi_t")
    rows = sql(spark, """
        SELECT v, multiIf(v < 3, 'small', v < 10, 'mid', 'big') AS b
        FROM mi_t ORDER BY v
    """).collect()
    assert [r.b for r in rows] == ["small", "mid", "big"]


# ------------------------------------------------------ array lambdas --


def test_array_lambda_reordering():
    assert rewrite_aggregates("SELECT arrayMap(x -> x * 2, arr) "
                              "FROM t") == \
        "SELECT transform(arr, x -> x * 2) FROM t"
    assert rewrite_aggregates(
        "SELECT arrayFilter(t -> length(t) > 5, split(s, ' ')) "
        "FROM t") == \
        "SELECT filter(split(s, ' '), t -> length(t) > 5) FROM t"
    out = rewrite_aggregates(
        "SELECT arrayCount(x -> x > 0, arr), "
        "arrayExists(x -> x = 1, arr), "
        "arrayAll(x -> x >= 0, arr) FROM t")
    assert ("size(filter(arr, x -> x > 0)), exists(arr, x -> x = 1), "
            "forall(arr, x -> x >= 0)") in out
    # 2-array arrayMap zips; nested calls rewrite inside-out
    assert rewrite_aggregates("SELECT arrayMap((x, y) -> x + y, a, b) "
                              "FROM t") == \
        "SELECT zip_with(a, b, (x, y) -> x + y) FROM t"
    assert rewrite_aggregates(
        "SELECT arrayMap(x -> arrayCount(y -> y > x, b), a) FROM t") \
        == "SELECT transform(a, x -> size(filter(b, y -> y > x))) FROM t"


def test_array_lambda_refusals_and_literal_safety():
    with pytest.raises(ValueError, match="lambda form"):
        rewrite_aggregates("SELECT arrayCount(arr) FROM t")
    with pytest.raises(ValueError, match="single-array"):
        rewrite_aggregates("SELECT arrayFilter(f -> 1, a, b) FROM t")
    q = "SELECT 'arrayMap(x -> 1, a)' AS s FROM t"
    assert rewrite_aggregates(q) == q


def test_array_lambda_executes(spark):
    from rsyslog_nginx_clickhouse_spark.functions.macros import sql

    spark.createDataFrame([("a bb ccc dddd",)], "s string") \
         .createOrReplaceTempView("alam_t")
    rows = sql(spark, """
        SELECT arrayCount(t -> length(t) > 2, split(s, ' ')) AS n,
               arrayExists(t -> t = 'bb', split(s, ' ')) AS has_bb
        FROM alam_t
    """).collect()
    assert rows[0].n == 2 and rows[0].has_bb is True


# -------------------------------------------- bloom decontamination --


def test_decontamination_bloom_equals_exact(spark):
    """The bloom prefilter must be value-invisible: no false negatives
    (bloom property) and every false positive removed by the exact
    verify — so the bloom query's rows equal plain decontamination's
    on the same corpus."""
    from rsyslog_nginx_clickhouse_spark.queries import load_all

    reg = load_all()
    sf = "/root/testdata/sf0.001"
    exact = {tuple(r) for r in
             reg["decontamination"].spark(spark, sf).collect()}
    bloom = {tuple(r) for r in
             reg["decontamination_bloom"].spark(spark, sf).collect()}
    assert exact == bloom and len(exact) > 0


def test_global_in_strips():
    from rsyslog_nginx_clickhouse_spark.functions.macros import (
        rewrite_any_join,
    )

    assert rewrite_any_join(
        "SELECT a FROM t WHERE u GLOBAL IN (SELECT u FROM s)") == \
        "SELECT a FROM t WHERE u IN (SELECT u FROM s)"
    assert rewrite_any_join(
        "SELECT a FROM t WHERE u GLOBAL NOT IN (SELECT u FROM s)") == \
        "SELECT a FROM t WHERE u NOT IN (SELECT u FROM s)"
    q = "SELECT 'GLOBAL IN (x)' AS s FROM t"
    assert rewrite_any_join(q) == q
