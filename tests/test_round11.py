"""Round-11 items: decontamination_bloom's unhinted verify join
(VERDICT r10 item 1), parametric topK(n)(x) (item 3), ANY
RIGHT/FULL + ON join forms (item 4), the arraySort(groupArray(x))
composite (item 5), the dictionary broadcast budget (item 7), and
the ADVICE r10 fixes (_GLOBAL_RE anchoring, groupArray key-scope
refusal, dictionary view-leak)."""

from __future__ import annotations

import pytest

from rsyslog_nginx_clickhouse_spark.functions.macros import (
    rewrite_aggregates,
    rewrite_any_join,
    rewrite_group_array,
    sql,
)

# ------------------------------------- decontamination_bloom plan --


def test_decontamination_bloom_verify_join_not_hinted(spark):
    """The exact-verify join must carry NO mandatory broadcast hint:
    the eval shingle STRING set is the side that can outgrow a
    broadcast — the regime this query exists for — so the strategy
    is AQE's call. The three bloom-position probe joins keep their
    hints (the pos dim is ≤ 2^16 rows by construction), so the
    analyzed plan has exactly 3 ResolvedHints, and none of them
    sits over the bench-shingle (bs/hit) verify side."""
    from rsyslog_nginx_clickhouse_spark.plans.barrier import (
        set_audit_mode,
    )
    from rsyslog_nginx_clickhouse_spark.queries import load_all

    set_audit_mode(True)  # explain the REAL end-to-end plan
    try:
        df = load_all()["decontamination_bloom"].spark(
            spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().analyzed().toString()
    finally:
        set_audit_mode(False)
    import re

    lines = plan.splitlines()
    hint_idx = [i for i, ln in enumerate(lines) if "ResolvedHint" in ln]
    # audit mode disables the per_doc barrier, so its subplan (and the
    # 3 probe hints inside it) appears once per consumer — the count
    # is a multiple of 3, never more kinds than the 3 probe dims
    assert hint_idx and len(hint_idx) % 3 == 0, plan
    # positive form: every hint's only child is a bloom-position
    # probe dim (pN/hN projection) — so none can sit over the verify
    # join's bench-shingle side
    for i in hint_idx:
        child = lines[i + 1]
        assert re.search(r"AS p([012])#", child), child
        assert re.search(r"AS h[012]#", child), child


# --------------------------------------------------- topK surface --


def test_topk_rewrite_text():
    out = rewrite_aggregates("SELECT topK(3)(event_type) FROM t")
    assert "collect_list(event_type)" in out
    assert "slice(" in out and ", 1, 3)" in out
    assert "topK" not in out


def test_topk_default_k_is_10():
    out = rewrite_aggregates("SELECT topK(x) FROM t")
    assert ", 1, 10)" in out


def test_topkif_filters_via_case():
    out = rewrite_aggregates("SELECT topKIf(2)(x, v > 5) FROM t")
    assert "CASE WHEN (v > 5) THEN (x) END" in out
    assert ", 1, 2)" in out


def test_topk_values_exact_frequency_order(spark):
    spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (1, "b"), (1, "b"), (1, "c"),
         (2, "z")], "g int, x string").createOrReplaceTempView("tk_t")
    rows = sql(spark, """
        SELECT g, array_join(topK(2)(x), ',') AS top2
        FROM tk_t GROUP BY g ORDER BY g""").collect()
    # g=1: b(3) then a(2); g=2: z alone
    assert [(r.g, r.top2) for r in rows] == [(1, "b,a"), (2, "z")]


def test_topk_tie_breaks_by_value_asc(spark):
    spark.createDataFrame(
        [(1, "y"), (1, "x")], "g int, x string") \
        .createOrReplaceTempView("tk_tie")
    rows = sql(spark, """
        SELECT array_join(topK(2)(x), ',') AS top2
        FROM tk_tie GROUP BY g""").collect()
    assert rows[0].top2 == "x,y"


def test_topkif_empty_group_yields_empty_array(spark):
    spark.createDataFrame([(1, 1.0)], "g int, v double") \
        .createOrReplaceTempView("tk_e")
    rows = sql(spark, """
        SELECT size(topKIf(3)(g, v > 99)) AS n
        FROM tk_e GROUP BY g""").collect()
    assert rows[0].n == 0


def test_topk_refusals():
    with pytest.raises(ValueError, match="literal integer"):
        rewrite_aggregates("SELECT topK(n)(x) FROM t")
    # topKWeighted REWRITES since the weighted extension — only the
    # WeightedIf maps since r12 (see test_weighted_refusals)
    out = rewrite_aggregates("SELECT topKWeighted(3)(x, w) FROM t")
    assert "aggregate(filter" in out and "topK" not in out
    with pytest.raises(ValueError, match="2 arguments"):
        rewrite_aggregates("SELECT topKIf(3)(x) FROM t")
    # string DATA mentioning topK comes back byte-identical
    q = "SELECT 'use topK(3)(x) here' AS hint FROM t"
    assert rewrite_aggregates(q) == q


# --------------------------------------- ANY RIGHT/FULL + ON form --


def test_any_right_join_dedups_left_side():
    out = rewrite_any_join(
        "SELECT * FROM e ANY RIGHT JOIN s USING (k)")
    assert "RIGHT JOIN s AS s USING (k)" in out
    assert "max(struct(*)) AS __s FROM e GROUP BY k" in out


def test_any_full_join_dedups_both_sides():
    out = rewrite_any_join(
        "SELECT * FROM a ANY FULL JOIN b USING (k)")
    assert out.count("max(struct(*))") == 2
    assert "FULL JOIN" in out and "ANY" not in out


def test_any_left_join_on_form():
    out = rewrite_any_join(
        "SELECT * FROM ev e ANY LEFT JOIN sg s "
        "ON s.uid = e.uid AND s.d = e.d WHERE x > 1")
    assert "GROUP BY uid, d" in out
    assert "ON s.uid = e.uid AND s.d = e.d" in out
    assert "WHERE x > 1" in out


def test_any_right_join_on_values(spark):
    spark.createDataFrame(
        [(1, 10), (1, 20), (2, 30)], "k int, v int") \
        .createOrReplaceTempView("arj_dim")
    spark.createDataFrame(
        [(1, "p"), (1, "q"), (3, "r")], "k int, t string") \
        .createOrReplaceTempView("arj_facts")
    rows = sql(spark, """
        SELECT f.k AS k, f.t AS t, d.v AS v
        FROM arj_dim d ANY RIGHT JOIN arj_facts f ON d.k = f.k
        ORDER BY k, t""").collect()
    # every right (facts) row kept once; left dedups to max struct
    # (k=1 -> v=20); unmatched right row keeps NULL
    assert [(r.k, r.t, r.v) for r in rows] == [
        (1, "p", 20), (1, "q", 20), (3, "r", None)]


def test_any_join_on_refusals():
    with pytest.raises(ValueError, match="equi-comparison"):
        rewrite_any_join(
            "SELECT * FROM e ANY LEFT JOIN s ON s.k = e.k OR s.j = 1")
    with pytest.raises(ValueError, match="exactly one side"):
        rewrite_any_join(
            "SELECT * FROM e ANY LEFT JOIN s ON s.k = s.j")
    with pytest.raises(ValueError, match="simple"):
        rewrite_any_join(
            "SELECT * FROM a JOIN b USING (k) "
            "ANY RIGHT JOIN c USING (k)")


def test_global_identifier_survives_before_unrelated_join():
    # ADVICE r10: 'x AS global FROM t JOIN u' must keep its alias —
    # GLOBAL only strips when followed by actual join keywords
    q = "SELECT x AS global FROM t JOIN u USING (k)"
    assert rewrite_any_join(q) == q
    # the grammatical modifier still strips
    out = rewrite_any_join("SELECT a FROM t GLOBAL ANY LEFT JOIN u "
                           "USING (k)")
    assert "GLOBAL" not in out


# ------------------------------- arraySort(groupArray) composite --


def test_array_sort_group_array_composite():
    out = rewrite_group_array(
        "SELECT g, arraySort(groupArray(x)) FROM t GROUP BY g")
    assert "sort_array(collect_list(x))" in out
    out = rewrite_group_array(
        "SELECT g, arrayReverseSort(groupArray(x)) FROM t GROUP BY g")
    assert "sort_array(collect_list(x), false)" in out


def test_bare_group_array_still_refused():
    with pytest.raises(ValueError, match="order-dependent"):
        rewrite_group_array("SELECT g, groupArray(x) FROM t GROUP BY g")


def test_group_array_mixed_sorted_unsorted_subqueries_refused():
    # ADVICE r10: a sorted subquery in an unrelated scope must not
    # license the rewrite when another subquery is unsorted
    with pytest.raises(ValueError, match="order-dependent"):
        rewrite_group_array(
            "SELECT g, groupArray(x) FROM (SELECT * FROM t) a "
            "JOIN (SELECT * FROM d ORDER BY k) b USING (g) GROUP BY g")


def test_array_sort_group_array_values(spark):
    spark.createDataFrame(
        [(1, "c"), (1, "a"), (1, "b")], "g int, x string") \
        .createOrReplaceTempView("asga_t")
    rows = sql(spark, """
        SELECT array_join(arraySort(groupArray(x)), ',') AS up,
               array_join(arrayReverseSort(groupArray(x)), ',') AS dn
        FROM asga_t GROUP BY g""").collect()
    assert rows[0].up == "a,b,c" and rows[0].dn == "c,b,a"


# ------------------------------------ dictionary broadcast budget --


def _dim(spark, n):
    return spark.range(n).selectExpr(
        "CAST(id AS INT) AS k",
        "concat('name_', CAST(id AS STRING)) AS nm")


def test_join_dictionary_over_budget_plans_shuffle(spark):
    """VERDICT r10 item 7: past the broadcast budget the dictGet
    join must degrade to a shuffle join (no pinned hint), values
    unchanged."""
    from rsyslog_nginx_clickhouse_spark.functions.dictionary import (
        declare_dictionary,
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
    try:
        declare_dictionary(spark, "bigsh", _dim(spark, 2000),
                           key_col="k", attrs={"nm": "'missing'"},
                           style="join")
        spark.createDataFrame([(5,), (1999,), (9999,)], "k int") \
             .createOrReplaceTempView("bigsh_facts")
        q = ("SELECT k, dictGet('bigsh', 'nm', k) AS nm "
             "FROM bigsh_facts ORDER BY k")
        plan = sql(spark, q)._jdf.queryExecution().executedPlan() \
            .toString()
        assert "BroadcastHashJoin" not in plan, plan
        assert "NestedLoop" not in plan, plan
        rows = sql(spark, q).collect()
        assert [(r.k, r.nm) for r in rows] == [
            (5, "name_5"), (1999, "name_1999"), (9999, "missing")]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_join_dictionary_under_budget_still_broadcasts(spark):
    from rsyslog_nginx_clickhouse_spark.functions.dictionary import (
        declare_dictionary,
    )

    declare_dictionary(spark, "smallbh", _dim(spark, 50),
                       key_col="k", attrs={"nm": "'missing'"},
                       style="join")
    spark.range(5).selectExpr("CAST(id AS INT) AS k") \
         .createOrReplaceTempView("smallbh_facts")
    plan = sql(spark, "SELECT dictGet('smallbh', 'nm', k) AS nm "
                      "FROM smallbh_facts")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_rejected_join_dictionary_leaks_no_view(spark):
    # ADVICE r10: the duplicate-key check runs BEFORE the view
    # registers, so a rejected declaration leaves no __dictsrc_*
    from rsyslog_nginx_clickhouse_spark.functions.dictionary import (
        declare_dictionary,
    )

    dup = spark.createDataFrame([(1, "a"), (1, "b")],
                                "k int, nm string")
    with pytest.raises(ValueError, match="duplicate key"):
        declare_dictionary(spark, "leakd", dup, key_col="k",
                           attrs={"nm": "'x'"}, style="join")
    assert not spark.catalog.tableExists("__dictsrc_leakd")


# ----------------------------- property: topK vs a reference --


def test_topk_property_random_groups(spark):
    """Seeded random multisets: the SQL topK/topKWeighted templates
    must equal a direct Python reference (count/weight-sum DESC,
    value ASC) on every group — catches template regressions the
    hand-picked fixtures can't."""
    import random
    from collections import Counter, defaultdict

    rng = random.Random(11)
    rows = []
    for g in range(12):
        for _ in range(rng.randint(0, 40)):
            rows.append((g, f"v{rng.randint(0, 9)}",
                         float(rng.randint(1, 5))))
    df = spark.createDataFrame(rows, "g int, x string, w double")
    df.createOrReplaceTempView("tkprop_t")
    got = {r.g: (r.topc, r.topw) for r in sql(spark, """
        SELECT g, array_join(topK(3)(x), ',') AS topc,
               array_join(topKWeighted(3)(x, w), ',') AS topw
        FROM tkprop_t GROUP BY g""").collect()}
    counts = defaultdict(Counter)
    wsums = defaultdict(Counter)
    for g, x, w in rows:
        counts[g][x] += 1
        wsums[g][x] += w
    for g in counts:
        ref_c = ",".join(sorted(counts[g],
                                key=lambda v: (-counts[g][v], v))[:3])
        ref_w = ",".join(sorted(wsums[g],
                                key=lambda v: (-wsums[g][v], v))[:3])
        assert got[g] == (ref_c, ref_w), (g, got[g], ref_c, ref_w)


# ------------------------------------------- deltaSum counter --


def test_delta_sum_rewrite_and_values(spark):
    out = rewrite_group_array(
        "SELECT g, deltaSum(x) FROM "
        "(SELECT g, x, k FROM t ORDER BY k) GROUP BY g")
    assert "aggregate(sort_array" in out
    assert "deltaSum" not in out and "ORDER BY" not in out
    spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 13.0), (1, 3, 7.0), (1, 4, 12.0),
         (1, 5, None), (1, 6, 15.0)],
        "g int, k int, x double").createOrReplaceTempView("dsum_t")
    r = sql(spark, """
        SELECT g, deltaSum(x) AS ds
        FROM (SELECT g, k, x FROM dsum_t ORDER BY k)
        GROUP BY g""").collect()[0]
    # +3 (10→13), reset ignored (13→7), +5 (7→12), NULL skipped
    # without breaking the chain, +3 (12→15)
    assert r.ds == 11.0


def test_delta_sum_refusals():
    with pytest.raises(ValueError, match="order-dependent"):
        rewrite_group_array("SELECT deltaSum(x) FROM t GROUP BY g")
    # deltaSumTimestamp REWRITES since r12 (VERDICT r11 item 6):
    # self-ordering, so no sorted subquery is required
    out = rewrite_group_array("SELECT deltaSumTimestamp(x, ts) FROM t")
    assert "sort_array(collect_list" in out \
        and "deltaSumTimestamp" not in out
    # name-prefix safety: a user function sharing the prefix survives
    q = "SELECT deltaSummary(x) FROM t"
    assert rewrite_group_array(q) == q
    q2 = "SELECT 'deltaSum(x)' AS s FROM t"
    assert rewrite_group_array(q2) == q2


# --------------------------------------- SETTINGS clause strip --


def test_settings_clause_strips():
    from rsyslog_nginx_clickhouse_spark.functions.macros import (
        rewrite_format,
        rewrite_settings,
    )

    q = ("SELECT count() FROM t "
         "SETTINGS max_execution_time = 60, max_threads = 8")
    assert "SETTINGS" not in rewrite_settings(q)
    # CH grammar order: SETTINGS then FORMAT — both strip
    q2 = "SELECT 1 SETTINGS join_algorithm = 'hash' FORMAT JSON"
    assert "SETTINGS" not in rewrite_settings(rewrite_format(q2))
    # string DATA mentioning SETTINGS survives, and a NON-trailing
    # SETTINGS (not the CH clause) is left for the parser to reject
    s = "SELECT 'SETTINGS x = 1' AS s FROM t"
    assert rewrite_settings(s) == s


def test_settings_clause_executes(spark):
    spark.range(5).createOrReplaceTempView("sett_t")
    r = sql(spark, "SELECT count() AS c FROM sett_t "
                   "SETTINGS use_query_cache = true "
                   "FORMAT JSONEachRow").collect()
    assert r[0].c == 5


# ---------------------------------- -If combinator breadth --


def test_if_combinator_rewrite_shapes():
    for q, want in [
        ("SELECT uniqIf(u, v > 5) FROM t",
         "approx_count_distinct(if(v > 5, u, NULL))"),
        ("SELECT uniqExactIf(u, v > 5) FROM t",
         "count(DISTINCT if(v > 5, u, NULL))"),
        ("SELECT medianIf(x, c) FROM t",
         "percentile_approx(if(c, x, NULL), 0.5)"),
        ("SELECT argMaxIf(a, b, c) FROM t",
         "max_by(if(c, a, NULL), if(c, b, NULL))"),
        ("SELECT argMinIf(a, b, c) FROM t",
         "min_by(if(c, a, NULL), if(c, b, NULL))"),
    ]:
        assert want in rewrite_aggregates(q), q
    # literal safety: string DATA mentioning a combinator survives
    q = "SELECT 'argMaxIf(a, b, c)' AS s FROM t"
    assert rewrite_aggregates(q) == q


def test_quantile_if_combinators():
    for q, want in [
        ("SELECT quantileIf(0.9)(x, c) FROM t",
         "percentile_approx(if(c, x, NULL), 0.9)"),
        ("SELECT quantileExactIf(0.25)(x, v > 1) FROM t",
         "percentile(if(v > 1, x, NULL), 0.25)"),
        ("SELECT quantileIf(x, c) FROM t",
         "percentile_approx(if(c, x, NULL), 0.5)"),
    ]:
        assert want in rewrite_aggregates(q), q
    with pytest.raises(ValueError, match="exactly 2"):
        rewrite_aggregates("SELECT quantileIf(0.9)(x) FROM t")
    q = "SELECT 'quantileIf(0.9)(x, c)' AS s FROM t"
    assert rewrite_aggregates(q) == q


def test_quantile_exact_if_value(spark):
    spark.createDataFrame(
        [(1, float(i)) for i in range(1, 11)],
        "g int, v double").createOrReplaceTempView("qif_t")
    r = sql(spark, "SELECT quantileExactIf(0.5)(v, v <= 5) AS m "
                   "FROM qif_t GROUP BY g").collect()[0]
    assert r.m == 3.0


def test_arg_if_combinator_values(spark):
    spark.createDataFrame(
        [(1, 10, 5.0, 100), (1, 20, 60.0, 101), (1, 20, 70.0, 102),
         (1, 30, 80.0, 99)],
        "g int, u int, v double, eid int") \
        .createOrReplaceTempView("ifc_t")
    r = sql(spark, """
        SELECT CAST(uniqExactIf(u, v > 50) AS bigint) AS hu,
               argMaxIf(v, eid, v > 50) AS lastv,
               argMinIf(v, eid, v > 50) AS firstv,
               medianIf(v, v > 50) AS med,
               argMaxIf(v, eid, v > 999) AS none_match
        FROM ifc_t GROUP BY g""").collect()[0]
    assert (r.hu, r.lastv, r.firstv, r.med) == (2, 70.0, 80.0, 70.0)
    assert r.none_match is None


# -------------------------------- topKWeighted / avgWeighted --


def test_topk_weighted_ranks_by_weight_sum(spark):
    spark.createDataFrame(
        [(1, "a", 1.0), (1, "a", 1.0), (1, "b", 5.0), (1, "c", 2.0),
         (1, None, 9.0), (1, "d", None)],
        "g int, x string, w double").createOrReplaceTempView("tkw_t")
    rows = sql(spark, """
        SELECT array_join(topKWeighted(2)(x, w), ',') AS topw
        FROM tkw_t GROUP BY g""").collect()
    # b(5) first; a and c tie at 2 -> value-ASC picks a; NULL x and
    # NULL w rows are skipped (CH aggregate NULL contract)
    assert rows[0].topw == "b,a"


def test_avg_weighted_null_contract(spark):
    # a NULL on EITHER side must leave BOTH sums: the naive
    # sum(x*w)/sum(w) would keep the weight in the denominator
    spark.createDataFrame(
        [(1, 10.0, 1.0), (1, 20.0, 3.0), (1, None, 100.0),
         (1, 30.0, None)],
        "g int, x double, w double").createOrReplaceTempView("avw_t")
    rows = sql(spark, """
        SELECT avgWeighted(x, w) AS aw FROM avw_t GROUP BY g
    """).collect()
    assert abs(rows[0].aw - (10 * 1 + 20 * 3) / 4.0) < 1e-12


def test_weighted_refusals():
    # topKWeightedIf REWRITES since r12 (VERDICT r11 item 7) — the
    # refusal now starts at the State/Merge spellings
    out = rewrite_aggregates("SELECT topKWeightedIf(3)(x, w, c) FROM t")
    assert "aggregate(filter" in out and "topK" not in out
    with pytest.raises(ValueError, match="combinators"):
        rewrite_aggregates(
            "SELECT topKWeightedIfState(3)(x, w, c) FROM t")
    with pytest.raises(ValueError, match="exactly 2"):
        rewrite_aggregates("SELECT topKWeighted(3)(x) FROM t")
    with pytest.raises(ValueError, match="exactly 2"):
        rewrite_aggregates("SELECT avgWeighted(x) FROM t")
    q = "SELECT 'avgWeighted(x, w)' AS s FROM t"
    assert rewrite_aggregates(q) == q


# ------------------------------------ progressive JPEG (SOF2) --


def _random_blocks(rng, w, h, max_ac=12):
    import numpy as np

    nb = (w // 8) * (h // 8)
    blocks = np.zeros((nb, 64), dtype=np.int64)
    blocks[:, 0] = rng.randint(-600, 600, nb)
    for b in range(nb):
        for _ in range(rng.randint(0, max_ac)):
            blocks[b, rng.randint(1, 64)] = rng.randint(-9, 10)
    return blocks


def test_progressive_equals_baseline_on_random_coefficients():
    """The value anchor for every progressive scan kind the constant-
    block render can't reach: 40 random sparse coefficient sets
    (values needing refinement bits, ±1 newly-significant, EOB runs,
    ZRL-in-refinement) decode IDENTICALLY through the SOF2 multi-scan
    path and the already-value-trusted baseline path."""
    import numpy as np

    from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
        decode_jpeg,
        encode_baseline_jpeg,
        encode_progressive_jpeg,
    )

    rng = np.random.RandomState(42)
    for trial in range(40):
        w, h = 8 * rng.randint(1, 9), 8 * rng.randint(1, 5)
        blocks = _random_blocks(rng, w, h)
        base = decode_jpeg(encode_baseline_jpeg(blocks, w, h))
        prog = decode_jpeg(encode_progressive_jpeg(blocks, w, h))
        assert np.array_equal(base, prog), f"trial {trial}"


def test_progressive_dense_blocks_and_deep_approximation():
    """Dense coefficients + a 3-level successive-approximation ladder
    (Al=2 first scans, two refinement passes) — exercises repeated
    refinement of the same coefficient and long correction-bit runs."""
    import numpy as np

    from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
        decode_jpeg,
        encode_baseline_jpeg,
        encode_progressive_jpeg,
    )

    rng = np.random.RandomState(7)
    w = h = 16
    blocks = rng.randint(-40, 41, size=(4, 64)).astype(np.int64)
    scans = ((0, 0, 0, 2), (0, 0, 2, 1), (0, 0, 1, 0),
             (1, 63, 0, 2), (1, 63, 2, 1), (1, 63, 1, 0))
    base = decode_jpeg(encode_baseline_jpeg(blocks, w, h))
    prog = decode_jpeg(encode_progressive_jpeg(blocks, w, h, scans))
    assert np.array_equal(base, prog)


def test_progressive_render_matches_baseline_render():
    import numpy as np

    from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
        decode_jpeg,
        render_jpeg_bytes,
        render_progressive_jpeg_bytes,
    )

    for t in ("hello world", "A", "zz9xy"):
        a = decode_jpeg(render_jpeg_bytes(t))
        b = decode_jpeg(render_progressive_jpeg_bytes(t))
        assert np.array_equal(a, b), t


def test_progressive_rejects_stay_loud():
    from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
        decode_jpeg,
        render_progressive_jpeg_bytes,
    )

    good = render_progressive_jpeg_bytes("reject corpus")
    # arithmetic-coded progressive (SOF10) still refuses by marker
    sof2 = good.index(b"\xFF\xC2")
    arith = good[:sof2 + 1] + b"\xCA" + good[sof2 + 2:]
    with pytest.raises(NotImplementedError, match="0xFFCA"):
        decode_jpeg(arith)
    # DRI in progressive scans is SUPPORTED since r12 — an interval
    # (8) larger than the block count never fires, so this stream
    # must now decode identically to the unmodified one (streams
    # WITH live RSTn markers are pinned in test_round12)
    import numpy as np
    dri = b"\xFF\xDD\x00\x04\x00\x08"
    sos = good.index(b"\xFF\xDA")
    with_dri = good[:sos] + dri + good[sos:]
    np.testing.assert_array_equal(decode_jpeg(with_dri),
                                  decode_jpeg(good))
    # truncating entropy data mid-scan surfaces as ValueError
    with pytest.raises(ValueError, match="truncated or corrupt"):
        decode_jpeg(good[:sos + 12] + b"\xFF\xD9")


def test_parse_size_bytes():
    from rsyslog_nginx_clickhouse_spark.functions.dictionary import (
        _parse_size_bytes,
    )

    assert _parse_size_bytes("10485760") == 10 * 1024 * 1024
    assert _parse_size_bytes("10485760b") == 10 * 1024 * 1024
    assert _parse_size_bytes("10m") == 10 * 1024 * 1024
    assert _parse_size_bytes("1g") == 1024 ** 3
    assert _parse_size_bytes("-1") == -1
