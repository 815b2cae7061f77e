"""Round-12 ADVICE regressions: the dictionary NULL-key crash, JPEG
0xFF fill bytes between scans (spec B.1.1.2), and the _ANY_JOIN_RE
ON-extent missing its ')' terminator inside parenthesized subqueries."""

from __future__ import annotations

import numpy as np
import pytest

from rsyslog_nginx_clickhouse_spark.functions.macros import (
    rewrite_any_join,
    sql,
)

# ----------------------------------------- dictionary NULL key --


def test_dictionary_null_key_raises_value_error(spark):
    """ADVICE r11 (medium): a source with exactly one NULL-key row
    used to crash with a bare IndexError — count_distinct skips
    NULLs so n != nd fired, but the count>1 duplicate probe found
    no rows and dup[0][0] indexed an empty list. Now the stats pass
    counts NULL keys directly and names them."""
    from rsyslog_nginx_clickhouse_spark.functions.dictionary import (
        declare_dictionary,
    )

    src = spark.createDataFrame([(1, "a"), (None, "b")],
                                "k int, nm string")
    with pytest.raises(ValueError, match="NULL key"):
        declare_dictionary(spark, "nullkd", src, key_col="k",
                           attrs={"nm": "'x'"}, style="join")
    assert not spark.catalog.tableExists("__dictsrc_nullkd")


def test_dictionary_null_key_among_duplicates_still_distinct_error(
        spark):
    """NULL keys are reported even when real duplicates coexist (the
    NULL check runs first — it is the one that used to crash)."""
    from rsyslog_nginx_clickhouse_spark.functions.dictionary import (
        declare_dictionary,
    )

    src = spark.createDataFrame([(1, "a"), (1, "b"), (None, "c")],
                                "k int, nm string")
    with pytest.raises(ValueError, match="NULL key"):
        declare_dictionary(spark, "nulldupd", src, key_col="k",
                           attrs={"nm": "'x'"}, style="join")


# ------------------------------------ JPEG 0xFF fill bytes --


def _with_fill_bytes(payload: bytes, n: int = 3) -> bytes:
    """Insert runs of 0xFF fill bytes (spec-legal, B.1.1.2) before
    the last DHT marker (between progressive scans) and before EOI.
    Raw FF C4 after the first SOS is a real marker — entropy data
    stuffs 0xFF as FF 00 — so byte-search is structurally safe."""
    assert payload.endswith(b"\xff\xd9")
    out = payload[:-2] + b"\xff" * n + payload[-2:]
    dht = out.rfind(b"\xff\xc4")
    assert dht > 0
    return out[:dht] + b"\xff" * n + out[dht:]


def test_jpeg_fill_bytes_between_progressive_scans():
    """ADVICE r11: segment_end treated a fill 0xFF as a marker start,
    so the marker loop read marker 0xFF and misparsed the next bytes
    as a segment length. Fill runs must be skipped and the decode
    must match the unpadded stream bit-exactly."""
    from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
        decode_jpeg,
        render_progressive_jpeg_bytes,
    )

    clean = render_progressive_jpeg_bytes("round twelve fill bytes")
    padded = _with_fill_bytes(clean)
    assert padded != clean
    np.testing.assert_array_equal(decode_jpeg(padded),
                                  decode_jpeg(clean))


def test_jpeg_fill_bytes_before_baseline_eoi():
    from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
        decode_jpeg,
        render_jpeg_bytes,
    )

    clean = render_jpeg_bytes("baseline fill")
    padded = clean[:-2] + b"\xff" * 4 + clean[-2:]
    np.testing.assert_array_equal(decode_jpeg(padded),
                                  decode_jpeg(clean))


# ------------------------- ANY JOIN ON inside a subquery --


def test_any_join_on_inside_parenthesized_subquery():
    """ADVICE r11: the ON-extent lookahead had no ')' terminator, so
    an ANY ... ON join inside a parenthesized subquery swallowed text
    past the closing paren into the ON group and refused with a
    misleading 'not a qualified equi-comparison'."""
    out = rewrite_any_join(
        "SELECT * FROM (SELECT f.k, d.v FROM facts f "
        "ANY LEFT JOIN dims d ON f.k = d.k) t WHERE t.v > 0")
    assert not __import__("re").search(r"(?i)\bANY\b", out)
    assert "GROUP BY k) __anyd1) AS d ON f.k = d.k) t" in out
    assert out.rstrip().endswith("WHERE t.v > 0")


def test_any_join_on_subquery_values(spark):
    spark.createDataFrame([(1,), (2,), (3,)], "k int") \
         .createOrReplaceTempView("r12_facts")
    spark.createDataFrame([(1, 10), (1, 99), (2, 20)], "k int, v int") \
         .createOrReplaceTempView("r12_dims")
    rows = sql(spark,
               "SELECT t.k, t.v FROM (SELECT f.k, d.v FROM r12_facts "
               "f ANY LEFT JOIN r12_dims d ON f.k = d.k) t "
               "WHERE t.v IS NOT NULL ORDER BY t.k").collect()
    # ANY keeps one match per key — the lexicographically-greatest
    # full right row (documented deterministic deviation)
    assert [(r.k, r.v) for r in rows] == [(1, 99), (2, 20)]
