"""Context-window chunking: boundary arithmetic and coverage, checked
on crafted document lengths around every edge of the W/S formula."""

from __future__ import annotations

from pyspark.sql import functions as F

from rsyslog_nginx_clickhouse_spark.queries import load_all
from rsyslog_nginx_clickhouse_spark.queries.llm import _CHUNK_S, _CHUNK_W

W, S = _CHUNK_W, _CHUNK_S


def _chunks_for_lengths(spark, tmp_path, lengths):
    docs = spark.createDataFrame(
        [(i, "x" * n) for i, n in enumerate(lengths)],
        "doc_id long, text string")
    sf = str(tmp_path / "sf")
    docs.write.parquet(f"{sf}/documents.parquet")
    q = load_all()["doc_chunk_windows"].spark
    return q(spark, sf).collect()


def test_chunk_counts_at_boundaries(spark, tmp_path):
    # n_chunks = 1 + ceil(max(L - W, 0) / S); empty docs emit nothing
    lengths = [0, 1, W - 1, W, W + 1, W + S, W + S + 1]
    want = {0: 0, 1: 1, W - 1: 1, W: 1, W + 1: 2, W + S: 2, W + S + 1: 3}
    rows = _chunks_for_lengths(spark, tmp_path, lengths)
    got: dict[int, int] = {}
    for r in rows:
        got[lengths[r.doc_id]] = got.get(lengths[r.doc_id], 0) + 1
    for n in lengths:
        assert got.get(n, 0) == want[n], n


def test_chunks_cover_text_with_fixed_overlap(spark, tmp_path):
    """Coverage + stride invariants: starts are 0, S, 2S, ...; every
    char of the doc is inside some chunk (last start + W >= L); every
    interior chunk is full-width W and overlaps its successor by
    exactly W - S; only the final chunk may be short."""
    lengths = [1, W, W + 1, 3 * S + W - 17, 5 * S + W]
    rows = _chunks_for_lengths(spark, tmp_path, lengths)
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in by_doc.items():
        L = lengths[doc_id]
        chunks.sort(key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        assert [c.start for c in chunks] == [i * S for i in range(len(chunks))]
        assert all(c.chunk_len == W for c in chunks[:-1])
        last = chunks[-1]
        assert last.start + last.chunk_len == L  # reaches the end
        assert last.chunk_len <= W


def test_chunk_hash_matches_substring(spark, tmp_path):
    """The hash is over exactly the [start, start+chunk_len) slice."""
    text = "".join(chr(97 + (i % 26)) for i in range(W + S + 13))
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    sf = str(tmp_path / "sf")
    docs.write.parquet(f"{sf}/documents.parquet")
    rows = load_all()["doc_chunk_windows"].spark(spark, sf).collect()
    import hashlib
    for r in rows:
        piece = text[r.start:r.start + r.chunk_len]
        assert r.chunk_hash == hashlib.md5(piece.encode()).hexdigest()


def test_chunking_plan_is_narrow(spark, sf_dir):
    """The chunking stage must pipeline on the scan — the ONLY
    exchange in the physical plan is the presentation orderBy's range
    partitioning; scan → explode → project is shuffle-free."""
    q = load_all()["doc_chunk_windows"].spark
    plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert len(exchanges) == 1 and "rangepartitioning" in exchanges[0]
