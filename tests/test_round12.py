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


# ---------------------------- bench contended-run guard --


def _load_bench_mod(name):
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        name, os.path.join(os.path.dirname(__file__),
                           os.pardir, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _R12Sink:
    def __init__(self, secs):
        self.secs = secs

    def mode(self, m):
        return self

    def format(self, f):
        return self

    def save(self):
        import time as _t
        _t.sleep(self.secs)


class _R12Query:
    def __init__(self, secs):
        self._sink = _R12Sink(secs)

    def spark(self, spark, sf):
        sink = self._sink

        class _DF:
            write = sink
        return _DF()


class _R12Spark:
    class catalog:
        @staticmethod
        def clearCache():
            pass


def test_bench_contended_run_cannot_convict_real():
    """VERDICT r11 item 3: the r11 driver pass ran at load 7.05 and
    labeled 7 queries 'real'; the quiet same-tree run refuted every
    one. A run that starts contended must cap reproduce-verdicts at
    'contended' — steal and plan-changed (exculpatory) still ship."""
    import gc as _gc

    bench = _load_bench_mod("bench_mod_r12a")
    best_known = ({"q": 0.4}, {"q": "BENCH_r04.json"},
                  {"q": "sigA"}, {"q": ("sigA", "BENCH_r04.json")})
    # in-suite wall 1.9s vs best 0.4s (same sig); isolated probe
    # ~1.5s reproduces the slowdown — on a quiet box this is 'real',
    # but the run is flagged contended so it cannot convict
    out = bench._adjudicate({"q": _R12Query(1.5)}, _R12Spark(),
                            {"q": 1.9}, {"q": "sigA"}, _gc,
                            best_known=best_known, best_by_sig={},
                            contended=True)
    assert out["q"]["verdict"] == "contended"
    assert out["q"]["probe"] > 0  # the probe still ships as context
    # a FAST probe is exculpatory evidence — 'steal' survives the flag
    out = bench._adjudicate({"q": _R12Query(0.05)}, _R12Spark(),
                            {"q": 1.9}, {"q": "sigA"}, _gc,
                            best_known=best_known, best_by_sig={},
                            contended=True)
    assert out["q"]["verdict"] == "steal"


def test_bench_contended_constants_exist():
    bench = _load_bench_mod("bench_mod_r12b")
    assert bench.CONTENDED_LOAD_1M == 2.0
    assert bench.DRAIN_WAIT_S >= 60


# ------------------------- JPEG 4:2:0 / 4:2:2 decode --


def test_jpeg_subsampled_matches_grayscale_reference():
    """The 4:2:0/4:2:2 color render keeps chroma neutral (128), so
    decoded RGB must equal the grayscale render of the same text —
    across single- and multi-MCU geometries."""
    from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
        decode_jpeg,
        render_jpeg_bytes,
        render_jpeg_subsampled_bytes,
    )

    for sampling in ("420", "422"):
        for dims in ((16, 16), (32, 32), (48, 16)):
            w, h = dims
            sub = render_jpeg_subsampled_bytes("mcu order pin!", w, h,
                                               sampling)
            ref = render_jpeg_bytes("mcu order pin!", w, h)
            np.testing.assert_array_equal(decode_jpeg(sub),
                                          decode_jpeg(ref))


def _encode_subsampled_dc(y_dc, c_dc_pairs, width, height, hs, vs):
    """Hand-rolled interleaved-MCU entropy coder: per-block DC values
    (y_dc: Y-plane block raster; c_dc_pairs: (cb, cr) per chroma
    block raster), EOB after every block — an encoder INDEPENDENT of
    render_jpeg_subsampled_bytes' (shared bit-writer only)."""
    from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
        _JPEG_AC_BITS,
        _JPEG_AC_VALS,
        _JPEG_DC_BITS,
        _JPEG_DC_VALS,
        _jpeg_canonical_codes,
        _JpegBitWriter,
    )

    dc_codes = _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    eob = _jpeg_canonical_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)[0x00]
    wtr = _JpegBitWriter()
    pred = [0, 0, 0]

    def block(ci, dc):
        dc = int(dc)
        diff = dc - pred[ci]
        pred[ci] = dc
        t = abs(diff).bit_length()
        wtr.emit(*dc_codes[t])
        if t:
            wtr.emit(diff if diff >= 0 else diff + (1 << t) - 1, t)
        wtr.emit(*eob)

    bx = width // 8
    cbx = width // (8 * hs)
    for my in range(height // (8 * vs)):
        for mx in range(width // (8 * hs)):
            for dy in range(vs):
                for dx in range(hs):
                    block(0, y_dc[(my * vs + dy) * bx + mx * hs + dx])
            cb, cr = c_dc_pairs[my * cbx + mx]
            block(1, cb)
            block(2, cr)
    wtr.flush()

    def seg(marker, body):
        return (bytes([0xFF, marker])
                + (len(body) + 2).to_bytes(2, "big") + body)

    dqt = seg(0xDB, bytes([0x00]) + bytes(64 * [1]))
    sof = seg(0xC0, bytes([8]) + height.to_bytes(2, "big")
              + width.to_bytes(2, "big")
              + bytes([3, 1, (hs << 4) | vs, 0, 2, 0x11, 0,
                       3, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS)
              + bytes(_JPEG_DC_VALS) + bytes([0x10])
              + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return (b"\xFF\xD8" + dqt + sof + dht + sos + bytes(wtr.out)
            + b"\xFF\xD9")


def test_jpeg_420_nonneutral_chroma_against_numpy_reference():
    """Varying chroma per chroma-block pins what neutral chroma
    cannot: chroma-plane MCU placement, the independent per-component
    DC predictors, the nearest upsample geometry, and the BT.601
    conversion — all checked against a from-scratch numpy oracle."""
    from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
        decode_jpeg,
    )

    w = h = 32
    hs = vs = 2
    rng = np.random.RandomState(12)
    n_y, n_c = (w // 8) * (h // 8), (w // 16) * (h // 16)
    y_vals = rng.randint(40, 216, size=n_y)
    cb_vals = rng.randint(90, 166, size=n_c)
    cr_vals = rng.randint(90, 166, size=n_c)
    payload = _encode_subsampled_dc(
        [8 * (v - 128) for v in y_vals],
        [(8 * (cb - 128), 8 * (cr - 128))
         for cb, cr in zip(cb_vals, cr_vals)], w, h, hs, vs)
    got = decode_jpeg(payload)

    # independent reference: constant blocks -> planes -> repeat -> BT.601
    ypl = np.repeat(np.repeat(
        y_vals.reshape(h // 8, w // 8), 8, 0), 8, 1).astype(np.float64)
    cpl = [np.repeat(np.repeat(np.repeat(np.repeat(
        v.reshape(h // 16, w // 16), 8, 0), 8, 1), vs, 0), hs, 1)
        .astype(np.float64) for v in (cb_vals, cr_vals)]
    cb, cr = cpl[0] - 128.0, cpl[1] - 128.0
    exp = np.stack([
        np.clip(np.round(ypl + 1.402 * cr), 0, 255),
        np.clip(np.round(ypl - 0.344136 * cb - 0.714136 * cr), 0, 255),
        np.clip(np.round(ypl + 1.772 * cb), 0, 255)],
        axis=2).astype(np.uint8)
    np.testing.assert_array_equal(got, exp)


def test_jpeg_422_nonneutral_chroma_against_numpy_reference():
    from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
        decode_jpeg,
    )

    w, h = 32, 16
    rng = np.random.RandomState(34)
    n_y, n_c = (w // 8) * (h // 8), (w // 16) * (h // 8)
    y_vals = rng.randint(40, 216, size=n_y)
    cb_vals = rng.randint(90, 166, size=n_c)
    cr_vals = rng.randint(90, 166, size=n_c)
    payload = _encode_subsampled_dc(
        [8 * (v - 128) for v in y_vals],
        [(8 * (cb - 128), 8 * (cr - 128))
         for cb, cr in zip(cb_vals, cr_vals)], w, h, 2, 1)
    got = decode_jpeg(payload)

    ypl = np.repeat(np.repeat(
        y_vals.reshape(h // 8, w // 8), 8, 0), 8, 1).astype(np.float64)
    cpl = [np.repeat(np.repeat(np.repeat(
        v.reshape(h // 8, w // 16), 8, 0), 8, 1), 2, 1)
        .astype(np.float64) for v in (cb_vals, cr_vals)]
    cb, cr = cpl[0] - 128.0, cpl[1] - 128.0
    exp = np.stack([
        np.clip(np.round(ypl + 1.402 * cr), 0, 255),
        np.clip(np.round(ypl - 0.344136 * cb - 0.714136 * cr), 0, 255),
        np.clip(np.round(ypl + 1.772 * cb), 0, 255)],
        axis=2).astype(np.uint8)
    np.testing.assert_array_equal(got, exp)


def test_jpeg_subsampled_renderer_refusals():
    from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
        render_jpeg_subsampled_bytes,
    )

    with pytest.raises(ValueError, match="ASCII"):
        render_jpeg_subsampled_bytes("")
    with pytest.raises(ValueError, match="ASCII"):
        render_jpeg_subsampled_bytes("héllo")
    with pytest.raises(ValueError, match="MCU"):
        render_jpeg_subsampled_bytes("x", width=8, height=8)
    with pytest.raises(ValueError, match="sampling"):
        render_jpeg_subsampled_bytes("x", sampling="444")


# ------------------- deltaSumTimestamp / topKWeightedIf --


def test_delta_sum_timestamp_fold(spark):
    """Self-ordering: the second argument is the order key — no
    sorted subquery required; NULL value or NULL ts rows are skipped
    without breaking the prev chain."""
    spark.createDataFrame(
        [(1, 10, 5.0), (1, 20, 3.0), (1, 30, 8.0),
         (2, 30, 1.0), (2, 10, 4.0), (2, 20, 2.0),
         (3, 10, 1.0), (3, 20, None), (3, 30, 5.0),
         (4, None, 7.0), (4, 10, 3.0), (4, 20, 9.0)],
        "k int, t int, v double").createOrReplaceTempView("r12_dst")
    rows = sql(spark, "SELECT k, deltaSumTimestamp(v, t) AS ds "
                      "FROM r12_dst GROUP BY k ORDER BY k").collect()
    assert [(r.k, r.ds) for r in rows] == [
        (1, 5.0), (2, 0.0), (3, 4.0), (4, 6.0)]


def test_delta_sum_timestamp_arity_refused():
    from rsyslog_nginx_clickhouse_spark.functions.macros import (
        rewrite_group_array,
    )

    with pytest.raises(ValueError, match="exactly"):
        rewrite_group_array("SELECT deltaSumTimestamp(v) FROM t")
    with pytest.raises(ValueError, match="exactly"):
        rewrite_group_array(
            "SELECT deltaSumTimestamp(v, t, z) FROM t")


def test_topk_weighted_if_values(spark):
    spark.createDataFrame(
        [(1, "a", 1.0, True), (1, "a", 5.0, False), (1, "b", 3.0, True),
         (1, "c", 2.0, True), (1, "b", 1.0, True), (2, "x", 9.0, False)],
        "k int, v string, w double, ok boolean") \
        .createOrReplaceTempView("r12_twi")
    rows = sql(spark, "SELECT k, topKWeightedIf(2)(v, w, ok) AS t "
                      "FROM r12_twi GROUP BY k ORDER BY k").collect()
    # k=1 qualifying weights: a=1, b=4, c=2 -> [b, c]; k=2: none
    assert [(r.k, list(r.t)) for r in rows] == [(1, ["b", "c"]),
                                                (2, [])]
    # bare-k default (k=10) and a NULL weight skipped like false cond
    rows = sql(spark, "SELECT k, topKWeightedIf(v, w, ok) AS t "
                      "FROM r12_twi GROUP BY k ORDER BY k").collect()
    assert [list(r.t) for r in rows] == [["b", "c", "a"], []]


def test_topk_weighted_if_arity_refused():
    from rsyslog_nginx_clickhouse_spark.functions.macros import (
        rewrite_aggregates,
    )

    with pytest.raises(ValueError, match="exactly 3"):
        rewrite_aggregates("SELECT topKWeightedIf(2)(v, w) FROM t")
    # unknown further combinators still refuse loudly
    with pytest.raises(ValueError, match="topK"):
        rewrite_aggregates("SELECT topKWeightedIfState(2)(v, w, c) FROM t")
