"""Regression tests for the four ADVICE r8 findings.

1. rewrite_asof_join: alias substitution must not touch string
   literals, and an alias redefined in another scope is refused.
2. decode_jpeg: EOFError from the bit reader (premature marker /
   byte-boundary truncation) converts to the documented ValueError.
3. knn_join(exclude_same=): NULL labels follow SQL three-valued
   logic — a pair with NULL on either side is excluded.
4. _PREWHERE_RE: UNION bounds the condition; constructs the folder
   does not know are refused loudly, not swallowed.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------ 1. ASOF alias --


def test_asof_alias_substitution_skips_string_literals(spark):
    from rsyslog_nginx_clickhouse_spark.functions import macros

    left = spark.createDataFrame([(1, 10, "x")],
                                 "k long, t long, pay string")
    right = spark.createDataFrame([(1, 8, "r1")],
                                  "k long, t long, rv string")
    left.createOrReplaceTempView("asof_lit_l")
    right.createOrReplaceTempView("asof_lit_r")
    # 'b.rv' inside the string literal must survive verbatim; the
    # identifier reference outside it must still be rewritten
    rows = macros.sql(spark, """
        SELECT a.k, concat('lit=b.rv:', b.rv) AS tagged
        FROM asof_lit_l a ASOF LEFT JOIN asof_lit_r b
          ON a.k = b.k AND b.t <= a.t
    """).collect()
    assert rows == [(1, "lit=b.rv:r1")]


def test_asof_alias_redefined_in_other_scope_is_refused(spark):
    from rsyslog_nginx_clickhouse_spark.functions import macros

    spark.createDataFrame([(1, 1, "p")], "k long, t long, pay string") \
        .createOrReplaceTempView("asof_lit_l")
    spark.createDataFrame([(1, 1, "r")], "k long, t long, rv string") \
        .createOrReplaceTempView("asof_lit_r")
    with pytest.raises(ValueError, match="redefined"):
        macros.sql(spark, """
            SELECT a.k, b.rv AS rv,
                   (SELECT max(b.t) FROM asof_lit_r b) AS mx
            FROM asof_lit_l a ASOF LEFT JOIN asof_lit_r b
              ON a.k = b.k AND b.t <= a.t
        """)


# -------------------------------------------------- 2. JPEG EOFError --


def test_decode_jpeg_truncation_raises_valueerror_not_eoferror():
    from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
        decode_jpeg,
        render_jpeg_bytes,
    )

    payload = render_jpeg_bytes("advice r8")
    assert decode_jpeg(payload) is not None  # sanity: valid stream
    # entropy data cut at a byte boundary, EOI kept: the bit reader
    # meets the 0xFFD9 marker mid-scan → EOFError path
    with pytest.raises(ValueError, match="truncated or corrupt"):
        decode_jpeg(payload[:-10] + payload[-2:])
    # bare truncation (no trailing marker): IndexError path
    with pytest.raises(ValueError, match="truncated or corrupt"):
        decode_jpeg(payload[:-8])


# ---------------------------------------------- 3. knn_join NULL label --


def test_knn_join_null_labels_follow_sql_three_valued_logic(spark):
    from rsyslog_nginx_clickhouse_spark.operators.similarity import (
        knn_join,
    )

    dim = 4
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], "a"),    # query, labelled
        (1, [1.0, 0.1, 0.0, 0.0], None),   # near neighbor, NULL label
        (2, [0.9, 0.2, 0.0, 0.0], "b"),    # near neighbor, labelled
        (3, [1.0, 0.05, 0.0, 0.0], None),  # query, NULL label
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string")
    out = knn_join(emb, F.col("vec_id").isin(0, 3), k=3, dim=dim,
                   exclude_same="label").collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.qid, set()).add(r.cid)
    # query 0 ('a'): NULL-label candidates 1 and 3 are excluded
    # (NULL != 'a' is NULL in SQL), only 'b' survives
    assert by_q.get(0, set()) == {2}
    # NULL-label query 3 returns no neighbors at all
    assert 3 not in by_q


# ------------------------------------------------- 4. PREWHERE bounds --


def test_prewhere_union_bounds_and_leak_refusal():
    from rsyslog_nginx_clickhouse_spark.functions.macros import (
        rewrite_prewhere,
    )

    out = rewrite_prewhere(
        "SELECT a FROM t PREWHERE v > 1 "
        "UNION ALL SELECT a FROM u WHERE v > 2")
    assert out.startswith("SELECT a FROM t WHERE v > 1 UNION ALL")
    # an unknown trailing construct must refuse, not fold silently
    with pytest.raises(ValueError, match="unsupported PREWHERE"):
        rewrite_prewhere(
            "SELECT a FROM t PREWHERE v IN (SELECT v FROM u)")
    with pytest.raises(ValueError, match="unsupported PREWHERE"):
        rewrite_prewhere(
            "SELECT a FROM t PREWHERE v > 1; DROP TABLE t")
