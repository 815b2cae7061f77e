"""BPE training: canonical-merge semantics, reference-trainer
equality, partition invariance, and apply-side consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from rsyslog_nginx_clickhouse_spark.operators.bpe import (
    bpe_tokenize_counts,
    bpe_train,
)


def _reference_bpe(word_freqs: dict[str, int], n_merges: int):
    """Independent canonical BPE trainer (index-walking merge, no
    string encoding) — the spec the engine must match."""
    state = {w: tuple(w) for w in word_freqs}
    merges = []
    for it in range(1, n_merges + 1):
        counts: dict[tuple, int] = {}
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = \
                    counts.get((syms[i], syms[i + 1]), 0) + word_freqs[w]
        if not counts:
            break
        # argmax by (count DESC, pair lexicographic ASC)
        (a, b), cnt = sorted(counts.items(),
                             key=lambda kv: (-kv[1], kv[0][0],
                                             kv[0][1]))[0]
        merges.append((it, a, b, a + b, cnt))
        new_state = {}
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_state[w] = tuple(out)
        state = new_state
    return merges, state


def _corpus_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_bpe_matches_reference_trainer(spark):
    """The classic subword corpus: every merge (pair, order, count)
    must equal the independent canonical trainer's."""
    texts = ["low low low low low",
             "lower lower newest newest newest",
             "newest newest newest widest widest",
             "aaaaa aaa aaaaa"]  # odd runs — the encoding's hard case
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    want, want_state = _reference_bpe(freqs, 8)
    got = [(r.it, r.pair_a, r.pair_b, r.merged, r.cnt) for r in
           bpe_train(_corpus_df(spark, texts), 8).orderBy("it").collect()]
    assert got == want


def test_bpe_apply_counts_match_reference_state(spark):
    texts = ["low lower lowest", "new newer newest", "aaaaa aa a"]
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    _, state = _reference_bpe(freqs, 6)
    got = {r.doc_id: (r.n_words, r.n_chars, r.n_subwords) for r in
           bpe_tokenize_counts(_corpus_df(spark, texts), 6).collect()}
    for doc_id, t in enumerate(texts):
        words = t.split()
        want = (len(words), sum(len(w) for w in words),
                sum(len(state[w]) for w in words))
        assert got[doc_id] == want


def test_bpe_partition_invariance(spark, sf_dir):
    """Training on a repartitioned corpus must yield the bit-identical
    merge table — the property the deterministic tie-break and the
    order-independent pair counts exist to guarantee."""
    from rsyslog_nginx_clickhouse_spark.catalog import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    a = [tuple(r) for r in bpe_train(docs, 5).orderBy("it").collect()]
    b = [tuple(r) for r in
         bpe_train(docs.repartition(17), 5).orderBy("it").collect()]
    assert a == b and len(a) == 5


def test_bpe_compression_monotonic(spark, sf_dir):
    """More merges can only shrink the subword count, and subwords sit
    between words and chars."""
    from rsyslog_nginx_clickhouse_spark.catalog import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    c0 = bpe_tokenize_counts(docs, 0).agg(
        F.sum("n_subwords"), F.sum("n_chars"), F.sum("n_words")
    ).collect()[0]
    assert c0[0] == c0[1]  # zero merges: subwords == chars
    c8 = bpe_tokenize_counts(docs, 8).agg(
        F.sum("n_subwords"), F.sum("n_chars"), F.sum("n_words")
    ).collect()[0]
    assert c8[2] <= c8[0] < c8[1]
