"""Adversarial-corpus oracle parity: run the REAL registry queries and
their DuckDB oracles over documents the driver's testdata doesn't
contain (empty text, whitespace-only, single tokens, punctuation soup,
exact dups of weird docs) and require the same value-hash agreement the
driver's gate checks. Guards engine/oracle divergences that are latent
on clean data (e.g. DuckDB list_sum([]) = NULL vs Spark 0)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsyslog_nginx_clickhouse_spark.queries import load_all
from tools.selfcheck import value_hash

EDGE_DOCS = [
    (1, "", "en", "src0"),
    (2, "   ", "en", "src0"),
    (3, "word", "en", "src1"),
    (4, "two words", "en", "src1"),
    (5, "!!! ??? ... ;;;", "en", "src2"),
    (6, "the the the the the", "en", "src2"),
    (7, "   ", "de", "src0"),       # exact dup of 2 after normalization
    (8, "Tab\tand\nnewline   runs", "en", "src1"),
    (9, "word", "fr", "src2"),      # exact dup of 3
    (10, "a b c d e f g h i j k l m n o p q r s t u v w x y z", "en",
     "src0"),
    # PII-bearing docs: the driver corpus has none, so only this
    # fixture exercises nonzero-match oracle parity for the redaction
    (11, "mail a.b+c@ex.org or x@y.io from 10.0.0.1 call +4915112345678",
     "en", "src1"),
    (12, "ip 192.168.001.255 vs version 1.2.3.4000 and 1.2.3.4", "en",
     "src2"),
    # non-ASCII: character-indexed substr + md5-over-UTF-8 parity for
    # the chunking/packing/gather tier (chars != bytes here)
    (13, "caf\u00e9 na\u00efve \u00fcber \u4e2d\u6587\u6587"
         "\u672c \U0001f600 emoji mix " * 12, "fr", "src0"),
    # long ASCII doc: multiple overlapping chunk windows + a
    # multi-doc packing bin alongside the tiny docs
    (14, ("lorem ipsum dolor sit amet consectetur adipiscing elit "
          * 12).strip(), "en", "src1"),
]

TEXT_QUERIES = ["text_stats", "quality_scores", "token_counts",
                "doc_fingerprints", "dedup_exact", "lang_detect",
                "dedup_ngram_jaccard", "top_bigrams",
                "pii_redaction", "repetition_stats", "token_shard_plan",
                "duplicated_ngram_fraction", "gopher_quality_filter",
                "source_overlap", "domain_mixture", "stratified_sample",
                # round-7 text tier: chunk/pack/gather slice and hash
                # the raw text (char-indexed substr over non-ASCII),
                # DSIR builds unigram models over it
                "doc_chunk_windows", "sequence_packing_plan",
                "packed_sequences", "dsir_importance", "span_dedup",
                "dedup_keep_best", "ngram_lm_perplexity",
                # round-8 text tier: token-space windows slice the
                # SAME normalized token arrays (empty doc → one
                # empty-token chunk in both engines); the seeded LM's
                # fixed-id-range seed covers every edge doc, so OOV
                # backoff and the en-only count tables both exercise
                "doc_chunk_tokens", "ngram_lm_perplexity_seeded",
                # round-9 tier: BM25 over a corpus with NO matching
                # query terms (empty result both engines), epoch
                # replication from the source id, curriculum ranks
                # with tied n_chars (doc_id tiebreak)
                "bm25_top_docs", "upsample_epochs",
                "curriculum_schedule",
                # round-10 tier: lambda-first array functions over the
                # edge texts — empty/whitespace docs split to
                # empty-string tokens (kept by BOTH engines' split),
                # non-ASCII lengths are char-counted on both sides
                "array_lambda_sql"]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("edge"))
    df = spark.createDataFrame(
        EDGE_DOCS, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text"))
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


@pytest.mark.parametrize("name", TEXT_QUERIES)
def test_oracle_agrees_on_edge_corpus(spark, edge_dir, name):
    q = load_all()[name]
    sdf = q.spark(spark, edge_dir)
    srows = [tuple(r) for r in sdf.collect()]
    spark.catalog.clearCache()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"parquet_scan('{os.path.join(edge_dir, 'documents.parquet')}/*.parquet')")
    res = con.execute(q.oracle)
    ocols = [dsc[0] for dsc in res.description]
    orows = res.fetchall()

    assert len(srows) == len(orows), f"rowcount {len(srows)} vs {len(orows)}"
    assert sorted(sdf.columns) == sorted(ocols)
    assert value_hash(srows, sdf.columns) == value_hash(orows, ocols)


#: ASCII-only edge corpus for the multimodal/image tier — the
#: renderers refuse empty/non-ASCII text by contract (the SQL oracle
#: indexes code points, the renderer indexes UTF-8 bytes), so this
#: corpus stresses the edges INSIDE that contract: a 1-char doc (every
#: pixel/block identical — aHash 0, a maximal hash-collision bucket
#: for the LSH join), exact dup pairs (hamming-0 pairs), a doc longer
#: than any render (wrap-around indexing), near-dups differing in one
#: trailing char, and punctuation-only text.
MM_EDGE_DOCS = [
    (1, "a", "en", "src0"),                    # constant image, hash 0
    (2, "a", "en", "src0"),                    # exact dup of 1
    (3, "b", "de", "src1"),                    # another constant image
    (4, "ab" * 200, "en", "src1"),             # longer than any render
    (5, "ab" * 200, "fr", "src1"),             # exact dup of 4
    (6, "The quick brown fox jumps over the lazy dog", "en", "src2"),
    (7, "The quick brown fox jumps over the lazy dot", "en", "src2"),
    (8, "!!! ??? ;;; :::", "en", "src0"),
    (9, " leading and trailing spaces ", "en", "src2"),
]

MM_QUERIES = ["multimodal_decode_bmp", "multimodal_decode_png",
              "multimodal_decode_jpeg", "multimodal_resize",
              "image_hash_dedup", "multimodal_decode_audio",
              "multimodal_decode_video", "multimodal_features",
              "multimodal_frames"]


@pytest.fixture(scope="module")
def mm_edge_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mm_edge"))
    df = spark.createDataFrame(
        MM_EDGE_DOCS, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text"))
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet"))
    return d


@pytest.mark.parametrize("name", MM_QUERIES)
def test_multimodal_oracle_agrees_on_ascii_edge_corpus(
        spark, mm_edge_dir, name):
    q = load_all()[name]
    sdf = q.spark(spark, mm_edge_dir)
    srows = [tuple(r) for r in sdf.collect()]
    spark.catalog.clearCache()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM parquet_scan("
        f"'{os.path.join(mm_edge_dir, 'documents.parquet')}/*.parquet')")
    res = con.execute(q.oracle)
    ocols = [dsc[0] for dsc in res.description]
    orows = res.fetchall()

    assert len(srows) == len(orows), f"rowcount {len(srows)} vs {len(orows)}"
    assert sorted(sdf.columns) == sorted(ocols)
    assert value_hash(srows, sdf.columns) == value_hash(orows, ocols)


def test_image_hash_dedup_finds_the_planted_dups(spark, mm_edge_dir):
    """The corpus plants two exact-dup pairs and a 1-char near-dup pair
    — the LSH join must surface the dups at hamming 0 (and docs 1/2/3:
    constant images share hash 0, so the all-constant triple is
    pairwise hamming-0 too)."""
    pairs = {(r.id_a, r.id_b): r.hamming for r in
             load_all()["image_hash_dedup"].spark(
                 spark, mm_edge_dir).collect()}
    assert pairs.get((1, 2)) == 0      # exact dup
    assert pairs.get((4, 5)) == 0      # exact dup, wrapped render
    assert pairs.get((1, 3)) == 0      # distinct constants, same hash 0


def test_hybrid_retrieval_edge_parity(spark, tmp_path):
    """hybrid_retrieval needs BOTH tables, so it gets its own
    two-table corpus: docs where the query terms are concentrated,
    absent, or repeated, embeddings pointing different ways (incl. an
    antipodal one), and fewer candidates than the top-50 recall cut —
    the Spark query and DuckDB oracle must agree row-for-row."""
    import duckdb

    d = str(tmp_path)
    docs = [
        (1, "spark window hash join scan", "en", "src0"),
        (2, "spark spark spark spark", "en", "src1"),
        (3, "nothing relevant here at all", "en", "src2"),
        (4, "window", "en", "src0"),
        (5, "hash window spark", "en", "src1"),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text")) \
        .coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    vecs = [
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [0.9, 0.1, 0.0, 0.0], 1),
        (3, [0.0, 1.0, 0.0, 0.0], 0),
        (4, [-1.0, 0.0, 0.0, 0.0], 1),   # antipodal to the query
        (5, [0.5, 0.5, 0.5, 0.5], 0),
    ]
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(os.path.join(d, "embeddings.parquet"))

    q = load_all()["hybrid_retrieval"]
    sdf = q.spark(spark, d)
    srows = [tuple(r) for r in sdf.collect()]
    # doc 3 has no query terms: it must not appear at all
    assert all(r[0] != 3 for r in srows) and srows

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan("
                    f"'{os.path.join(d, t + '.parquet')}/*.parquet')")
    res = con.execute(q.oracle)
    ocols = [dsc[0] for dsc in res.description]
    orows = res.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert value_hash(srows, sdf.columns) == value_hash(orows, ocols)
