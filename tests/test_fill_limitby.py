"""WITH FILL gap densification + the LIMIT BY rewrite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rsyslog_nginx_clickhouse_spark.functions.macros import rewrite_limit_by
from rsyslog_nginx_clickhouse_spark.operators.timeseries import (
    fill_time_gaps,
)


def test_fill_time_gaps_densifies(spark):
    rows = [("2024-01-01 00:00:00", 3), ("2024-01-01 03:00:00", 5)]
    df = spark.createDataFrame(rows, "t string, cnt long") \
              .select(F.col("t").cast("timestamp").alias("t"), "cnt")
    got = {(str(r.t), r.cnt) for r in
           fill_time_gaps(df, "t", 3600).collect()}
    assert got == {("2024-01-01 00:00:00", 3),
                   ("2024-01-01 01:00:00", 0),
                   ("2024-01-01 02:00:00", 0),
                   ("2024-01-01 03:00:00", 5)}


def test_fill_time_gaps_no_gaps_is_identity(spark):
    rows = [("2024-01-01 00:00:00", 1), ("2024-01-01 00:15:00", 2)]
    df = spark.createDataFrame(rows, "t string, cnt long") \
              .select(F.col("t").cast("timestamp").alias("t"), "cnt")
    assert fill_time_gaps(df, "t", 900).count() == 2


def test_limit_by_rewrite_shape():
    q = ("SELECT user_id, event_id FROM events WHERE user_id < 20 "
         "ORDER BY event_id DESC LIMIT 2 BY user_id")
    out = rewrite_limit_by(q)
    assert "row_number() OVER (PARTITION BY user_id" in out
    assert "ORDER BY event_id DESC" in out
    assert "__rn <= 2" in out
    assert out.rstrip().endswith("ORDER BY event_id DESC")
    # trailing global LIMIT is applied after the per-group cut
    out2 = rewrite_limit_by(q + " LIMIT 5")
    assert out2.rstrip().endswith("LIMIT 5")
    # multi-column BY
    out3 = rewrite_limit_by(
        "SELECT a, b, c FROM t ORDER BY c LIMIT 1 BY a, b")
    assert "PARTITION BY a, b" in out3


def test_limit_by_without_order_by_is_refused():
    with pytest.raises(ValueError, match="ORDER BY"):
        rewrite_limit_by("SELECT a FROM t LIMIT 2 BY a")


def test_limit_by_passthrough_on_plain_sql():
    q = "SELECT a FROM t ORDER BY a LIMIT 5"
    assert rewrite_limit_by(q) == q


def test_limit_by_executes(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21)], "u int, e int")
    df.createOrReplaceTempView("lb_t")
    got = spark.sql(rewrite_limit_by(
        "SELECT u, e FROM lb_t ORDER BY e DESC LIMIT 2 BY u")).collect()
    assert [(r.u, r.e) for r in got] == [(2, 21), (2, 20), (1, 12),
                                         (1, 11)]
    assert [c for c in got[0].asDict()] == ["u", "e"]  # __rn dropped


def test_with_totals_rewrite_and_execution(spark):
    from rsyslog_nginx_clickhouse_spark.functions.macros import (
        rewrite_with_totals,
    )

    q = "SELECT a, count(*) c FROM t GROUP BY a WITH TOTALS ORDER BY a"
    out = rewrite_with_totals(q)
    assert "GROUPING SETS ((a), ())" in out and "TOTALS" not in out
    # multi-key
    out2 = rewrite_with_totals("SELECT a,b,sum(x) s FROM t "
                               "GROUP BY a, b WITH TOTALS")
    assert "GROUPING SETS ((a, b), ())" in out2
    # passthrough
    q3 = "SELECT a, count(*) c FROM t GROUP BY a"
    assert rewrite_with_totals(q3) == q3
    df = spark.createDataFrame([("x", 1), ("x", 2), ("y", 3)],
                               "a string, v int")
    df.createOrReplaceTempView("wt_t")
    got = {(r.a, r.s) for r in spark.sql(rewrite_with_totals(
        "SELECT a, sum(v) AS s FROM wt_t GROUP BY a WITH TOTALS"))
        .collect()}
    assert got == {("x", 3), ("y", 3), (None, 6)}


# ------------------------------------------------------------- SAMPLE --


def test_sample_rewrite_shape():
    from rsyslog_nginx_clickhouse_spark.functions.macros import (
        declare_sample_by,
        rewrite_sample,
    )

    declare_sample_by("st", "user_id")
    out = rewrite_sample("SELECT count(*) FROM st SAMPLE 0.25")
    assert "_sample_factor" in out and "AS st" in out
    assert ">= 0" in out and "< 1073741824" in out  # 0.25 * 2^32
    out = rewrite_sample("SELECT 1 FROM st SAMPLE 0.25 OFFSET 0.5")
    assert ">= 2147483648" in out and "< 3221225472" in out


def test_sample_refusals():
    from rsyslog_nginx_clickhouse_spark.functions.macros import (
        declare_sample_by,
        rewrite_sample,
    )

    declare_sample_by("st", "user_id")
    with pytest.raises(ValueError, match="row-count form"):
        rewrite_sample("SELECT 1 FROM st SAMPLE 1000")
    with pytest.raises(ValueError, match="exceeds"):
        rewrite_sample("SELECT 1 FROM st SAMPLE 0.5 OFFSET 0.75")
    with pytest.raises(ValueError, match="no declared sampling key"):
        rewrite_sample("SELECT 1 FROM undeclared_t SAMPLE 0.1")


def test_sample_ratio_and_integer_offset_forms():
    """ClickHouse's ratio spelling ('SAMPLE 1/10 OFFSET 1/2') rewrites
    like its decimal twin, and integer OFFSET reaches the loud
    out-of-range error instead of leaking 'OFFSET 1' into Spark SQL
    (ADVICE r7)."""
    from rsyslog_nginx_clickhouse_spark.functions.macros import (
        declare_sample_by,
        rewrite_sample,
    )

    declare_sample_by("st", "user_id")
    ratio = rewrite_sample("SELECT 1 FROM st SAMPLE 1/4 OFFSET 1/2")
    decimal = rewrite_sample("SELECT 1 FROM st SAMPLE 0.25 OFFSET 0.5")
    assert ratio == decimal
    assert "OFFSET" not in ratio
    with pytest.raises(ValueError, match="exceeds"):
        rewrite_sample("SELECT 1 FROM st SAMPLE 1/2 OFFSET 1")
    with pytest.raises(ValueError, match="row-count form"):
        rewrite_sample("SELECT 1 FROM st SAMPLE 5/2")


# --------------------------------------------------- PREWHERE / FORMAT --


def test_prewhere_rewrite_shapes():
    from rsyslog_nginx_clickhouse_spark.functions.macros import (
        rewrite_format,
        rewrite_prewhere,
    )

    # merge with existing WHERE: both sides parenthesized so an OR in
    # either cannot rebind against the AND
    out = rewrite_prewhere(
        "SELECT a FROM t PREWHERE v > 50 "
        "WHERE e = 'x' OR e = 'y' GROUP BY a")
    assert "WHERE (v > 50) AND (e = 'x' OR e = 'y') GROUP BY a" in out
    assert "PREWHERE" not in out
    # no WHERE: PREWHERE becomes WHERE
    assert rewrite_prewhere("SELECT a FROM t PREWHERE v > 50 LIMIT 5") \
        == "SELECT a FROM t WHERE v > 50 LIMIT 5"
    # passthrough without the clause
    q = "SELECT a FROM t WHERE v > 1"
    assert rewrite_prewhere(q) == q
    # FORMAT stripped only as a trailing output directive
    assert rewrite_format("SELECT 1 FROM t FORMAT JSONEachRow") \
        == "SELECT 1 FROM t"
    assert rewrite_format("SELECT 1 FROM t ORDER BY format") \
        == "SELECT 1 FROM t ORDER BY format"


def test_prewhere_predicate_reaches_the_scan(spark, sf_dir):
    """The folded PREWHERE predicate must appear in PushedFilters —
    Spark's scan-layer evaluation IS the PREWHERE strategy."""
    from rsyslog_nginx_clickhouse_spark.queries import load_all

    df = load_all()["prewhere_format_scan"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "GreaterThan(value,50" in plan


# ----------------------------------------------------- WITH FILL (SQL) --


def test_with_fill_sql_rewrite_and_execution(spark):
    from rsyslog_nginx_clickhouse_spark.functions import macros
    from rsyslog_nginx_clickhouse_spark.functions.macros import (
        rewrite_with_fill,
    )

    out = rewrite_with_fill(
        "SELECT vb, cnt FROM t GROUP BY vb "
        "ORDER BY vb WITH FILL FROM 0 TO 200 STEP 20")
    assert "sequence(0, 200, 20)" in out and "WHERE vb < 200" in out
    assert out.startswith("WITH __fill_src AS")
    # derived bounds use scalar subqueries; trailing LIMIT survives
    out2 = rewrite_with_fill(
        "SELECT a FROM t ORDER BY a WITH FILL STEP 5 LIMIT 3")
    assert "(SELECT min(a) FROM __fill_src)" in out2
    assert out2.rstrip().endswith("LIMIT 3")
    with pytest.raises(ValueError, match="explicit STEP"):
        rewrite_with_fill("SELECT a FROM t ORDER BY a WITH FILL")
    # DESC fills are SUPPORTED since round 13 (VERDICT r12 item 5) —
    # but the step sign must match the direction (the CH contract)
    with pytest.raises(ValueError, match="direction mismatch"):
        rewrite_with_fill("SELECT a FROM t ORDER BY a DESC "
                          "WITH FILL STEP 2")
    with pytest.raises(ValueError, match="direction mismatch"):
        rewrite_with_fill("SELECT a FROM t ORDER BY a "
                          "WITH FILL STEP -2")
    out3 = rewrite_with_fill("SELECT a FROM t ORDER BY a DESC "
                             "WITH FILL FROM 9 TO 1 STEP -2")
    assert "sequence(9, 1, -2)" in out3 and "WHERE a > 1" in out3
    assert out3.rstrip().endswith("ORDER BY a DESC")
    q = "SELECT a FROM t ORDER BY a"
    assert rewrite_with_fill(q) == q

    # execution: gaps densify with NULL payload, TO is exclusive,
    # empty source yields an empty (not NULL-keyed) result
    spark.createDataFrame([(0, 7), (40, 9)], "vb int, cnt int") \
        .createOrReplaceTempView("wf_t")
    rows = macros.sql(spark, """
        SELECT vb, cnt FROM wf_t
        ORDER BY vb WITH FILL FROM 0 TO 60 STEP 20
    """).collect()
    assert [(r.vb, r.cnt) for r in rows] == \
        [(0, 7), (20, None), (40, 9)]
    rows2 = macros.sql(spark, """
        SELECT vb, cnt FROM wf_t WHERE vb < -1
        ORDER BY vb WITH FILL STEP 20
    """).collect()
    assert rows2 == []


# --------------------------------------------------------- ASOF JOIN --


def test_asof_join_rewrite_inner_and_refusals(spark):
    """The SQL surface must match the operator row-for-row; plain
    (inner) ASOF JOIN drops unmatched left rows like ClickHouse;
    strict/forward inequalities and malformed ON clauses are refused
    loudly rather than silently mis-joined."""
    from rsyslog_nginx_clickhouse_spark.functions import macros
    from rsyslog_nginx_clickhouse_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 5, "b"), (2, 7, "c"), (3, 4, "d")],
        "k long, t long, pay string")
    right = spark.createDataFrame(
        [(1, 8, "r1"), (1, 2, "r0"), (2, 7, "r2"), (9, 1, "rx")],
        "k long, t long, rv string")
    left.createOrReplaceTempView("asof_l")
    right.createOrReplaceTempView("asof_r")

    got = {tuple(r) for r in macros.sql(spark, """
        SELECT a.k, a.t, a.pay, b.rv AS rv, b.t AS t_asof
        FROM asof_l a ASOF LEFT JOIN asof_r b
          ON a.k = b.k AND b.t <= a.t
    """).collect()}
    want = {tuple(r) for r in
            asof_join(left, right, on="k", time_col="t",
                      value_cols=["rv"])
            .select("k", "t", "pay", F.col("rv_asof").alias("rv"),
                    "t_asof").collect()}
    assert got == want
    assert (1, 10, "a", "r1", 8) in got      # latest at-or-before
    assert (3, 4, "d", None, None) in got    # LEFT keeps unmatched

    # the >= spelling is the same join
    got2 = {tuple(r) for r in macros.sql(spark, """
        SELECT a.k, a.t, b.t AS t_asof FROM asof_l a
        ASOF LEFT JOIN asof_r b ON a.k = b.k AND a.t >= b.t
    """).collect()}
    assert got2 == {(r[0], r[1], r[4]) for r in want}

    # inner form drops the unmatched left rows (CH semantics)
    inner = {tuple(r) for r in macros.sql(spark, """
        SELECT a.k, a.t FROM asof_l a ASOF JOIN asof_r b
          ON a.k = b.k AND b.t <= a.t
    """).collect()}
    assert inner == {(1, 10), (1, 5), (2, 7)}

    with pytest.raises(ValueError, match="at-or-before"):
        macros.sql(spark, "SELECT a.k FROM asof_l a ASOF JOIN asof_r b "
                          "ON a.k = b.k AND b.t < a.t")
    with pytest.raises(ValueError, match="at-or-before"):
        macros.sql(spark, "SELECT a.k FROM asof_l a ASOF JOIN asof_r b "
                          "ON a.k = b.k AND b.t >= a.t")
    with pytest.raises(ValueError, match="unsupported ASOF"):
        macros.sql(spark, "SELECT 1 FROM (SELECT 1) a ASOF JOIN "
                          "asof_r b ON a.k = b.k AND b.t <= a.t")


# -------------------------------------------------------------- FINAL --


def test_final_rewrite_shape_and_refusals():
    from rsyslog_nginx_clickhouse_spark.functions.macros import (
        declare_final_table,
        rewrite_final,
    )

    declare_final_table("prof", "replacing", keys=["id"],
                        payload=["name", "v"], version_col="ver")
    out = rewrite_final("SELECT id, v FROM prof FINAL WHERE id < 5")
    assert "max(struct(ver, name, v))" in out
    assert "GROUP BY id" in out and out.rstrip().endswith("WHERE id < 5")
    assert "FINAL" not in out

    declare_final_table("st8", "collapsing", keys=["id"],
                        payload=["v"])
    out = rewrite_final("SELECT * FROM st8 FINAL")
    assert "HAVING sum(sign) > 0" in out and "GROUP BY id, v" in out

    with pytest.raises(ValueError, match="not declared"):
        rewrite_final("SELECT 1 FROM plain_t FINAL")
    with pytest.raises(ValueError, match="only directly on"):
        rewrite_final("SELECT 1 FROM (SELECT 1) FINAL")
    with pytest.raises(ValueError, match="version_col"):
        declare_final_table("bad", "replacing", keys=["id"],
                            payload=["v"])
    with pytest.raises(ValueError, match="replacing.*collapsing"):
        declare_final_table("bad", "aggregating", keys=["id"],
                            payload=["v"])
    # summing kind: FINAL re-sums the payload per key (the
    # plans/summing.read_summed plan in SQL)
    declare_final_table("sm8", "summing", keys=["day", "etype"],
                        payload=["hits", "bytes"])
    out = rewrite_final("SELECT day, hits FROM sm8 FINAL")
    assert "sum(hits) AS hits" in out and "sum(bytes) AS bytes" in out
    assert "GROUP BY day, etype" in out and "FINAL" not in out


def test_final_matches_dataframe_merge_paths(spark, tmp_path):
    """FROM t FINAL must return exactly what read_latest /
    read_collapsed return — the SQL surface and the DataFrame API are
    the same plan."""
    from rsyslog_nginx_clickhouse_spark.functions import macros
    from rsyslog_nginx_clickhouse_spark.plans.collapsing import (
        append_signed,
        read_collapsed,
    )
    from rsyslog_nginx_clickhouse_spark.plans.replacing import (
        append_versions,
        read_latest,
    )

    rp = str(tmp_path / "rp")
    rows = spark.createDataFrame(
        [(1, "a", 0), (1, "b", 1), (2, "c", 0), (3, "d", 2),
         (3, "e", 1)],
        "id long, name string, ver int")
    append_versions(rows, rp)
    spark.read.parquet(rp).createOrReplaceTempView("t_final_r")
    macros.declare_final_table("t_final_r", "replacing", keys=["id"],
                               payload=["name"], version_col="ver")
    got = {tuple(r) for r in macros.sql(
        spark, "SELECT id, name, ver FROM t_final_r FINAL").collect()}
    want = {tuple(r) for r in read_latest(
        spark, rp, ["id"], "ver", ["name"])
        .select("id", "name", "ver").collect()}
    assert got == want == {(1, "b", 1), (2, "c", 0), (3, "d", 2)}

    cp = str(tmp_path / "cp")
    signed = spark.createDataFrame(
        [(1, "a", 1), (1, "a", -1), (1, "b", 1), (2, "c", 1)],
        "id long, name string, sign int")
    append_signed(signed, cp)
    spark.read.parquet(cp).createOrReplaceTempView("t_final_c")
    macros.declare_final_table("t_final_c", "collapsing", keys=["id"],
                               payload=["name"])
    got = {tuple(r) for r in macros.sql(
        spark, "SELECT id, name FROM t_final_c FINAL").collect()}
    want = {tuple(r) for r in read_collapsed(
        spark, cp, ["id"], ["name"]).collect()}
    assert got == want == {(1, "b"), (2, "c")}


def test_sample_slices_partition_exactly(spark):
    """Disjoint OFFSET slices must cover every row exactly once, and
    the same slice must select the SAME rows regardless of
    partitioning — the reproducibility contract rand() sampling
    breaks."""
    from rsyslog_nginx_clickhouse_spark.functions.macros import (
        declare_sample_by,
        sql as engine_sql,
    )

    df = spark.range(0, 1000).select(F.col("id").alias("user_id"))
    declare_sample_by("sample_t", "user_id")

    def ids(npart, frac, off):
        df.repartition(npart).createOrReplaceTempView("sample_t")
        q = f"SELECT user_id FROM sample_t SAMPLE {frac} OFFSET {off}"
        return {r.user_id for r in engine_sql(spark, q).collect()}

    quarters = [ids(4, 0.25, o) for o in (0.0, 0.25, 0.5, 0.75)]
    assert sum(len(q) for q in quarters) == 1000
    assert set().union(*quarters) == set(range(1000))
    # partitioning-independent
    assert ids(1, 0.25, 0.0) == quarters[0]
    assert ids(17, 0.25, 0.5) == quarters[2]


def test_sample_factor_extrapolates(spark):
    from rsyslog_nginx_clickhouse_spark.functions.macros import (
        declare_sample_by,
        sql as engine_sql,
    )

    spark.range(0, 4000).select(F.col("id").alias("user_id")) \
         .createOrReplaceTempView("sample_f")
    declare_sample_by("sample_f", "user_id")
    row = engine_sql(spark, """
        SELECT count(*) AS n,
               count(*) * any_value(_sample_factor) AS est
        FROM sample_f SAMPLE 0.5
    """).collect()[0]
    assert row.est == row.n * 2.0
    # a uniform hash keeps the slice near its nominal share
    assert abs(row.n - 2000) < 200


# --------------------------------------------------------- ARRAY JOIN --


def test_array_join_rewrite_shape():
    from rsyslog_nginx_clickhouse_spark.functions.macros import (
        rewrite_array_join,
    )

    out = rewrite_array_join(
        "SELECT x FROM t ARRAY JOIN split(s, ',') AS x GROUP BY x")
    assert "LATERAL VIEW explode(split(s, ',')) __aj AS x" in out
    out = rewrite_array_join(
        "SELECT id, x FROM t LEFT ARRAY JOIN arr AS x")
    assert "LATERAL VIEW OUTER explode(arr) __aj AS x" in out
    # untouched passthrough
    q = "SELECT 1 FROM t WHERE a = 2"
    assert rewrite_array_join(q) == q
    with pytest.raises(ValueError, match="ARRAY JOIN needs"):
        rewrite_array_join("SELECT 1 FROM t ARRAY JOIN a, b")  # no alias


def test_array_join_executes_and_left_keeps_empty(spark):
    from rsyslog_nginx_clickhouse_spark.functions.macros import (
        sql as engine_sql,
    )

    spark.createDataFrame(
        [(1, ["a", "b"]), (2, [])],
        "id long, arr array<string>").createOrReplaceTempView("aj_t")
    inner = engine_sql(spark, """
        SELECT id, x FROM aj_t ARRAY JOIN arr AS x ORDER BY id, x
    """).collect()
    assert [(r.id, r.x) for r in inner] == [(1, "a"), (1, "b")]
    left = engine_sql(spark, """
        SELECT id, x FROM aj_t LEFT ARRAY JOIN arr AS x ORDER BY id, x
    """).collect()
    # LEFT keeps id=2 with a NULL element (CH emits the type default;
    # NULL is the documented relational spelling)
    assert [(r.id, r.x) for r in left] == [(1, "a"), (1, "b"), (2, None)]
