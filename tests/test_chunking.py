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


# ------------------------------------------------- token-space windows --


def _token_chunks(spark, tmp_path, token_counts):
    """One doc per count, each of n distinct single-char-ish tokens."""
    from rsyslog_nginx_clickhouse_spark.queries.llm import (
        _CHUNK_ST,
        _CHUNK_WT,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(n)))
         for i, n in enumerate(token_counts)],
        "doc_id long, text string")
    sf = str(tmp_path / "sf")
    docs.write.parquet(f"{sf}/documents.parquet")
    rows = load_all()["doc_chunk_tokens"].spark(spark, sf).collect()
    return rows, _CHUNK_WT, _CHUNK_ST


def test_token_chunks_boundaries_coverage_and_hashes(spark, tmp_path):
    """doc_chunk_tokens holds the SAME invariants as the char variant,
    in token space (VERDICT r7 item 5): n_chunks = 1 + ceil(max(L-W,0)
    /S); starts at multiples of S; interior chunks full-width W with
    W-S token overlap; the last chunk reaches the final token; the
    hash is over exactly the rejoined token window — so chunks never
    split a token."""
    import hashlib

    from rsyslog_nginx_clickhouse_spark.queries.llm import (
        _CHUNK_ST as St,
        _CHUNK_WT as Wt,
    )

    # counts around every formula edge
    counts = [1, Wt - 1, Wt, Wt + 1, Wt + St, Wt + St + 1,
              3 * St + Wt - 7]
    rows, Wt, St = _token_chunks(spark, tmp_path, counts)
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in by_doc.items():
        L = counts[doc_id]
        want_n = 1 + max(L - Wt + St - 1, 0) // St if L else 0
        chunks.sort(key=lambda r: r.chunk_idx)
        assert len(chunks) == want_n, (L, len(chunks))
        assert [c.chunk_idx for c in chunks] == list(range(want_n))
        assert [c.start_tok for c in chunks] == \
            [i * St for i in range(want_n)]
        assert all(c.n_toks == Wt for c in chunks[:-1])
        last = chunks[-1]
        assert last.start_tok + last.n_toks == L  # reaches final token
        assert last.n_toks <= Wt
        toks = [f"t{j}" for j in range(L)]
        for c in chunks:
            piece = " ".join(toks[c.start_tok:c.start_tok + c.n_toks])
            assert c.chunk_hash == \
                hashlib.md5(piece.encode()).hexdigest()


def test_token_chunking_plan_is_narrow(spark, sf_dir):
    """Token windows must pipeline like the char variant: split +
    sequence + explode + slice are per-row — the only exchange is the
    presentation orderBy."""
    q = load_all()["doc_chunk_tokens"].spark
    plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert len(exchanges) == 1 and "rangepartitioning" in exchanges[0]
