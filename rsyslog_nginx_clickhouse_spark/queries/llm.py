"""LLM-data-pipeline queries: dedup, similarity, text analysis, multimodal.

These are the north-star extensions (SURVEY §7.5) over the driver's
``documents``/``embeddings`` tables. Determinism contract: all hashing
is md5-over-explicit-strings, all float outputs rounded, so the DuckDB
oracles reproduce every value (the SQL blocks below mirror the Spark
expression trees operation-for-operation, including accumulation order).

Every query here carries a full DuckDB oracle — including the hashed/
randomized tiers: the hyperplane and MinHash coefficients are
deterministic (md5-seeded) and INLINED into the SQL as literals, the
SimHash tally is replayed bit-for-bit in SQL, and the IVF centroids
are derived from the data itself (lowest-id vectors) so the oracle
recomputes them.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rsyslog_nginx_clickhouse_spark.plans.barrier import barrier

from rsyslog_nginx_clickhouse_spark.catalog import load
from rsyslog_nginx_clickhouse_spark.functions.text import (
    fingerprint,
    lang_id,
    mean_token_len,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
)
from rsyslog_nginx_clickhouse_spark.functions.rounding import (
    tie_round,
    tie_round_sql,
)
from rsyslog_nginx_clickhouse_spark.functions.vectors import cosine, norm
from rsyslog_nginx_clickhouse_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
    attach_binary,
    extract_features,
)
from rsyslog_nginx_clickhouse_spark.operators.similarity import (
    cosine_dedup_pairs,
    knn_bruteforce,
    knn_lsh,
)
from rsyslog_nginx_clickhouse_spark.operators.simhash import simhash_pairs
from rsyslog_nginx_clickhouse_spark.queries import query

# ---------------------------------------------------------------- text --


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents scan spread to session parallelism. A small corpus
    arrives as ONE file → ONE scan partition (parquet can't split
    below a row group), serializing every per-row text expression onto
    a single core — 6× slower at sf0.1. ``spread`` is a no-op when the
    scan is already wide (plan-metadata probe), so this is free at
    scale."""
    from rsyslog_nginx_clickhouse_spark.operators.dedup import spread

    return spread(load(spark, sf_dir, "documents"), "doc_id")


#: DuckDB mirror of functions/text.py `tokens()`.
_TOKS = ("CASE WHEN trim(text) = '' THEN []::varchar[] "
         "ELSE regexp_split_to_array(lower(trim(text)), '\\s+') END")

#: DuckDB mirror of `normalized_text()` + `word_shingles(n=3)` distinct.
_SHINGLES_CTE = """
    WITH normed AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                          ' ') AS toks
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(toks) >= 3
               THEN [array_to_string(toks[i:i+2], ' ')
                     for i in generate_series(1, len(toks) - 2)]
               ELSE [array_to_string(toks, ' ')] END) AS shingles
      FROM normed
    )
"""

_STOPWORDS_SQL = ("['the','a','an','and','or','of','to','in','is','it',"
                  "'that','for','on','with','as','was','at','by','be']")

_PUNCT_SQL = """'[.,!?;:''"()\\[\\]{}-]'"""


@query(
    "text_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           len(toks) AS n_tokens,
           {tie_round_sql(f'''(length(text) - length(regexp_replace(text, {_PUNCT_SQL}, '', 'g')))::double
                 / greatest(length(text), 1)''', 6)} AS punct_ratio,
           {tie_round_sql(f'''len(list_filter(toks, x -> list_contains({_STOPWORDS_SQL}, x)))::double
                 / greatest(len(toks), 1)''', 6)} AS stopword_ratio,
           {tie_round_sql('''coalesce(list_sum(list_transform(toks, x -> length(x))),
                          0)::double
                 / greatest(len(toks), 1)''', 6)} AS mean_token_len
    FROM t
    """,
    doc="token counting + quality signals, pure Catalyst expressions; "
        "ratios use tie_round (count/length int ratios CAN sit exactly "
        "on round-tie points — see functions/rounding.py)",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        token_count("text").cast("long").alias("n_tokens"),
        tie_round(punct_ratio("text"), 6).alias("punct_ratio"),
        tie_round(stopword_ratio("text"), 6).alias("stopword_ratio"),
        tie_round(mean_token_len("text"), 6).alias("mean_token_len"),
    )


@query(
    "quality_scores",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
    m AS (
      SELECT doc_id,
             len(toks) AS n_tok,
             (length(text) - length(regexp_replace(text, {_PUNCT_SQL}, '', 'g')))::double
               / greatest(length(text), 1) AS pr,
             len(list_filter(toks, x -> list_contains({_STOPWORDS_SQL}, x)))::double
               / greatest(len(toks), 1) AS sw,
             list_sum(list_transform(toks, x -> length(x)))::double
               / greatest(len(toks), 1) AS mlen
      FROM t)
    SELECT doc_id, {tie_round_sql('''
        least(n_tok / 20.0, 1.0) * 0.4
        + (1.0 - least(pr * 5, 1.0)) * 0.2
        + (CASE WHEN sw >= 0.05 AND sw <= 0.6 THEN 1.0 ELSE 0.3 END) * 0.2
        + (CASE WHEN mlen >= 2.5 AND mlen <= 12.0 THEN 1.0 ELSE 0.3 END) * 0.2
      ''', 6)} AS quality
    FROM m
    """,
    doc="composite document quality score for corpus filtering; "
        "tie_round — the score is a linear combination of exact short "
        "decimals and int ratios, which can sit on round-tie points",
)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select("doc_id",
                       tie_round(quality_score("text"), 6).alias("quality"))


@query(
    "lang_detect",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
    s AS (
      SELECT doc_id, lang,
        len(list_filter(toks, x -> list_contains(['the','and','of','to','is'], x))) AS en,
        len(list_filter(toks, x -> list_contains(['der','die','und','ist','nicht'], x))) AS de,
        len(list_filter(toks, x -> list_contains(['le','la','les','est','une'], x))) AS fr,
        len(list_filter(toks, x -> list_contains(['el','los','que','es','una'], x))) AS es
      FROM t)
    SELECT doc_id, lang AS lang_declared,
           CASE WHEN greatest(en, de, fr, es) = 0 THEN 'und'
                WHEN en >= greatest(de, fr, es) THEN 'en'
                WHEN de >= greatest(fr, es) THEN 'de'
                WHEN fr >= es THEN 'fr'
                ELSE 'es' END AS lang_detected
    FROM s
    """,
    doc="marker-stopword language ID heuristic (argmax, first-wins ties)",
)
def lang_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", F.col("lang").alias("lang_declared"),
                       lang_id("text").alias("lang_detected"))


@query(
    "doc_fingerprints",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
             AS fingerprint
    FROM documents
    """,
    doc="document fingerprint: md5 of whitespace-normalized lowercase text",
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no spread: one md5 per row is cheaper than the repartition
    return load(spark, sf_dir, "documents").select(
        "doc_id", fingerprint("text").alias("fingerprint"))


#: context-window chunking: window of 240 chars, stride 200 (40-char
#: overlap so no span is split across a boundary without also
#: appearing whole in a neighbor — the standard RAG/pretraining
#: chunking contract)
_CHUNK_W = 240
_CHUNK_S = 200


@query(
    "doc_chunk_windows",
    # chunk count is pure integer arithmetic (1 + ceil(max(L-W,0)/S),
    # written as the same int ops in both engines), starts are i*S,
    # chunks are character substrings — no floats anywhere, so the
    # value gate covers every chunk byte via its md5
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, length(text) AS L
      FROM documents WHERE length(text) > 0),
    n AS (
      SELECT doc_id, text,
             1 + (greatest(L - {_CHUNK_W}, 0) + {_CHUNK_S - 1})
                 // {_CHUNK_S} AS n_chunks
      FROM d),
    series AS (  -- lateral generate_series on a column is not
                 -- supported by this DuckDB; join a 0..max series
      SELECT unnest(range(0, (SELECT max(n_chunks) FROM n))) AS i),
    c AS (
      SELECT doc_id, text, i AS chunk_idx
      FROM n JOIN series ON i < n_chunks)
    SELECT doc_id, chunk_idx::int AS chunk_idx,
           (chunk_idx * {_CHUNK_S})::int AS start,
           length(substr(text, chunk_idx * {_CHUNK_S} + 1,
                         {_CHUNK_W}))::int AS chunk_len,
           md5(substr(text, chunk_idx * {_CHUNK_S} + 1,
                      {_CHUNK_W})) AS chunk_hash
    FROM c ORDER BY doc_id, chunk_idx
    """,
    doc="context-window chunking — the explode step every pretraining "
        "/ RAG pipeline runs before tokenization: each document becomes "
        "overlapping 240-char windows at stride 200 (sequence + "
        "explode + substr, a NARROW per-row transformation: no "
        "shuffle, output partitioning inherits the scan, so it "
        "pipelines ahead of tokenize/embed at any scale; chars stand "
        "in for tokens — a token-boundary variant swaps the substr "
        "for a tokenizer Pandas UDF, same plan shape)",
)
def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    W, S = _CHUNK_W, _CHUNK_S
    d = (load(spark, sf_dir, "documents")
         .select("doc_id", "text", F.length("text").alias("L"))
         .where(F.col("L") > 0))
    n_chunks = (F.lit(1)
                + F.floor((F.greatest(F.col("L") - W, F.lit(0))
                           + F.lit(S - 1)) / S).cast("int"))
    chunk = F.col("text").substr(F.col("chunk_idx") * S + 1, F.lit(W))
    return (d.withColumn("chunk_idx",
                         F.explode(F.sequence(F.lit(0), n_chunks - 1)))
             .select("doc_id",
                     F.col("chunk_idx").cast("int").alias("chunk_idx"),
                     (F.col("chunk_idx") * S).cast("int").alias("start"),
                     F.length(chunk).cast("int").alias("chunk_len"),
                     F.md5(chunk).alias("chunk_hash"))
             .orderBy("doc_id", "chunk_idx"))


#: token-boundary chunking (VERDICT r7 item 5): window of 48 tokens,
#: stride 40 (8-token overlap) over the SAME normalized tokenization
#: every curation metric uses — chunks never split a token, the
#: contract char-stride windows cannot give.
_CHUNK_WT = 48
_CHUNK_ST = 40


@query(
    "doc_chunk_tokens",
    # identical integer arithmetic to doc_chunk_windows but in token
    # space: count = 1 + ceil(max(L-W,0)/S) over the token count,
    # chunk = 1-based inclusive list slice (both engines clamp at the
    # end), content pinned byte-for-byte via md5 of the
    # space-rejoined window — no floats anywhere
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                         'g'), ' ') AS toks
      FROM documents),
    n AS (
      SELECT doc_id, toks, len(toks) AS L,
             1 + (greatest(len(toks) - {_CHUNK_WT}, 0)
                  + {_CHUNK_ST - 1}) // {_CHUNK_ST} AS n_chunks
      FROM d WHERE len(toks) > 0),
    series AS (
      SELECT unnest(range(0, (SELECT max(n_chunks) FROM n))) AS i),
    c AS (
      SELECT doc_id, toks, i AS chunk_idx
      FROM n JOIN series ON i < n_chunks)
    SELECT doc_id, chunk_idx::int AS chunk_idx,
           (chunk_idx * {_CHUNK_ST})::int AS start_tok,
           len(toks[chunk_idx * {_CHUNK_ST} + 1 :
                    chunk_idx * {_CHUNK_ST} + {_CHUNK_WT}])::int
             AS n_toks,
           md5(array_to_string(
               toks[chunk_idx * {_CHUNK_ST} + 1 :
                    chunk_idx * {_CHUNK_ST} + {_CHUNK_WT}], ' '))
             AS chunk_hash
    FROM c ORDER BY doc_id, chunk_idx
    """,
    doc="token-boundary context-window chunking — doc_chunk_windows' "
        "production twin (VERDICT r7 item 5): 48-token windows at "
        "stride 40 over the SHARED normalized tokenization, so chunks "
        "never split a token and overlap is measured in model tokens, "
        "not characters. Same narrow plan: split + sequence + explode "
        "+ slice are all per-row expressions — no shuffle, "
        "partitioning inherits the scan, pipelines ahead of "
        "tokenize/embed at any scale; every chunk byte is under the "
        "value gate via md5 of the rejoined window",
)
def doc_chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.queries.pipeline import _toks

    W, S = _CHUNK_WT, _CHUNK_ST
    d = (load(spark, sf_dir, "documents")
         .select("doc_id", _toks(F.col("text")).alias("toks"))
         .withColumn("L", F.size("toks"))
         .where(F.col("L") > 0))
    n_chunks = (F.lit(1)
                + F.floor((F.greatest(F.col("L") - W, F.lit(0))
                           + F.lit(S - 1)) / S).cast("int"))
    win = F.slice(F.col("toks"), F.col("chunk_idx") * S + 1, W)
    return (d.withColumn("chunk_idx",
                         F.explode(F.sequence(F.lit(0), n_chunks - 1)))
             .select("doc_id",
                     F.col("chunk_idx").cast("int").alias("chunk_idx"),
                     (F.col("chunk_idx") * S).cast("int")
                     .alias("start_tok"),
                     F.size(win).cast("int").alias("n_toks"),
                     F.md5(F.array_join(win, " ")).alias("chunk_hash"))
             .orderBy("doc_id", "chunk_idx"))


# --------------------------------------------------------------- dedup --


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
             AS fingerprint,
           min(doc_id) AS keep_id, count(*) AS n_copies
    FROM documents GROUP BY fingerprint
    """,
    doc="exact dedup: hash-groupBy on the fingerprint, keep min id",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no spread: the fingerprint groupBy shuffles anyway; a pre-shuffle
    # spread just doubles the exchanges
    return exact_dedup_groups(load(spark, sf_dir, "documents"))


def _ngram_jaccard_oracle() -> str:
    from rsyslog_nginx_clickhouse_spark.operators.dedup import (
        NGRAM_JACCARD_MAX_DF,
    )

    # mirrors ngram_jaccard_pairs exactly, INCLUDING the docfreq cap
    # (count-agg Jaccard: |A∩B| = shared-shingle rows, |A∪B| by
    # inclusion-exclusion — identical values to the array form because
    # per-doc shingles are distinct)
    return _SHINGLES_CTE + f"""
    , ex0 AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    ex AS (SELECT doc_id, s FROM (
             SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS nd
             FROM ex0)
           WHERE nd <= {NGRAM_JACCARD_MAX_DF}),
    sizes AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM ex a JOIN ex b USING (s) WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           {tie_round_sql('''n_inter::double
                 / greatest(sa.sz + sb.sz - n_inter, 1)''', 6)} AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE {tie_round_sql('''n_inter::double
                / greatest(sa.sz + sb.sz - n_inter, 1)''', 6)} >= 0.5
    """


@query(
    "dedup_ngram_jaccard",
    oracle=_ngram_jaccard_oracle(),
    doc="exact n-gram-Jaccard near-dup pairs (ground truth for LSH "
        "recall), over the docfreq-capped shingle universe",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(load(spark, sf_dir, "documents"),
                               threshold=0.5)


def _minhash_oracle_lists() -> tuple[str, str]:
    from rsyslog_nginx_clickhouse_spark.operators.dedup import MINHASH_COEFFS

    a = "[" + ", ".join(str(a) for a, _ in MINHASH_COEFFS) + "]"
    b = "[" + ", ".join(str(b) for _, b in MINHASH_COEFFS) + "]"
    return a, b


_MH_A, _MH_B = _minhash_oracle_lists()

@query(
    "dedup_minhash_lsh",
    oracle=_SHINGLES_CTE + f"""
    , hs AS (
      SELECT doc_id, shingles,
             list_transform(shingles,
                            s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS h
      FROM sh
    ), sig_t AS (
      SELECT doc_id, shingles,
             [list_min(list_transform(h,
                x -> (({_MH_A})[i+1] * x + ({_MH_B})[i+1]) % 4294967311))
              for i in generate_series(0, 31)] AS sig
      FROM hs
    ), bands AS (
      SELECT doc_id, b AS band,
             array_to_string(list_transform(sig[b*4+1 : b*4+4],
                                            x -> x::VARCHAR), '|') AS key
      FROM sig_t, unnest(generate_series(0, 7)) AS t(b)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b USING (band, key)
      WHERE a.doc_id < b.doc_id)
    SELECT id_a, id_b,
           {tie_round_sql('''len(list_intersect(sa.shingles, sb.shingles))::double
                 / greatest(len(list_distinct(sa.shingles || sb.shingles)), 1)''',
                 6)} AS jaccard
    FROM cand
    JOIN sh sa ON sa.doc_id = id_a
    JOIN sh sb ON sb.doc_id = id_b
    WHERE {tie_round_sql('''len(list_intersect(sa.shingles, sb.shingles))::double
                / greatest(len(list_distinct(sa.shingles || sb.shingles)), 1)''',
                6)} >= 0.5
    """,
    doc="MinHash (one md5/shingle + 32 universal-hash permutations) + "
        "LSH (8 bands × 4) + exact-Jaccard verify — the 100 TB near-dup "
        "path; oracle replicates the exact banding so the match is "
        "bit-for-bit",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(load(spark, sf_dir, "documents"), threshold=0.5)


@query(
    "dedup_simhash",
    # full bit-for-bit SQL replay of the 64-bit tally: md5 first 8
    # bytes per token (UBIGINT), per-bit ±1 tally, sign → bit,
    # fingerprint assembled as two's-complement BIGINT (bit 63 =
    # -2^63), exact Hamming via bit_count(xor()) over ALL pairs (the
    # oracle needs no LSH — candidate pruning is a Spark-side
    # optimization the exact form verifies)
    oracle="""
    WITH normed AS (
      SELECT doc_id,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nt
      FROM documents),
    tok AS (
      SELECT doc_id, unnest(string_split(nt, ' ')) AS tok
      FROM normed WHERE nt <> '' AND nt IS NOT NULL),
    hv AS (
      SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h
      FROM tok),
    tally AS (
      SELECT doc_id, j,
             sum(CASE WHEN (h >> j::UBIGINT) & 1::UBIGINT = 1::UBIGINT
                      THEN 1 ELSE -1 END) AS t
      FROM hv, unnest(generate_series(0, 63)) AS g(j)
      GROUP BY doc_id, j),
    fp0 AS (
      SELECT doc_id,
             sum(CASE WHEN t > 0 THEN
                   CASE WHEN j = 63 THEN -9223372036854775808
                        ELSE (1::BIGINT << j) END
                 ELSE 0 END)::BIGINT AS fp
      FROM tally GROUP BY doc_id),
    fp AS (
      SELECT d.doc_id, coalesce(f.fp, 0) AS fp
      FROM documents d LEFT JOIN fp0 f USING (doc_id))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.fp, b.fp))::int AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fp, b.fp)) <= 3
    """,
    doc="SimHash-64 near-dup pairs, Hamming ≤ 3, chunk-LSH candidates; "
        "Arrow-vectorized Pandas UDF; oracle replays the full tally in "
        "SQL and verifies against ALL pairs (LSH completeness included)",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_pairs(load(spark, sf_dir, "documents"))


# ---------------------------------------------------------- similarity --

_DOT = ("list_sum([{a}[i]::double * {b}[i]::double "
        "for i in generate_series(1, len({a}))])")


def _cos_sql(a: str, b: str) -> str:
    return (f"{_DOT.format(a=a, b=b)} / "
            f"(sqrt({_DOT.format(a=a, b=a)}) * sqrt({_DOT.format(a=b, b=b)}))")


def _planes_values(n_planes: int) -> str:
    """DuckDB twin of operators/similarity.plane_signature_udf: the
    seed-42 hyperplanes are deterministic, so they are generated HERE
    and inlined as a ``planes(p, pv)`` VALUES list — the oracle then
    computes the identical bit signature per vector with one
    ``list_inner_product`` per (vector, plane) and ``string_agg``
    ordered by plane index. (Inlining the plane literal inside a
    per-element list comprehension instead re-CONSTRUCTS the
    64-element literal on every index — ~300× slower.)"""
    from rsyslog_nginx_clickhouse_spark.operators.similarity import hyperplanes

    return ", ".join(
        f"({p}, [" + ", ".join(repr(x) for x in row) + "]::DOUBLE[])"
        for p, row in enumerate(hyperplanes(64, n_planes)))


#: per-vector signature CTE body over `planes` (see _planes_values)
_SIG_CTE = """
      SELECT e.vec_id,
             string_agg(CASE WHEN list_inner_product(
                                     e.embedding::DOUBLE[], p.pv) >= 0
                             THEN '1' ELSE '0' END, ''
                        ORDER BY p.p) AS sig
      FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id"""


@query(
    "embedding_norms",
    oracle=f"""
    SELECT vec_id,
           round(sqrt({_DOT.format(a='embedding', b='embedding')}), 6)
             AS l2_norm
    FROM embeddings
    """,
    doc="vector math via zip_with/aggregate — JVM-side, no UDF",
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "embeddings").select(
        "vec_id", F.round(norm("embedding"), 6).alias("l2_norm"))


_Q8_DEQ = ("[floor({e}[i]::double / scale + 0.5) * scale "
           "for i in generate_series(1, len({e}))]")


@query(
    "embedding_quantization",
    # deq is materialized in a CTE so the cosine/err expressions read
    # it; halfway rule is floor(x/scale + 0.5) — explicitly defined so
    # both engines agree (round() conventions differ)
    oracle=f"""
    WITH s AS (
      SELECT vec_id, embedding,
             list_max([abs(embedding[i]::double)
                       for i in generate_series(1, len(embedding))])
               / 127.0 AS scale
      FROM embeddings),
    d AS (
      SELECT vec_id, embedding, scale,
             CASE WHEN scale = 0
                  THEN [0.0 for i in generate_series(1, len(embedding))]
                  ELSE {_Q8_DEQ.format(e='embedding')} END AS deq
      FROM s)
    SELECT vec_id, round(scale, 9) AS scale,
           floor(({_cos_sql('embedding', 'deq')}) * 1000000
                 + 0.5) / 1000000 AS cos_sim,
           round(list_max([abs(embedding[i]::double - deq[i])
                           for i in generate_series(1, len(embedding))]),
                 6) AS max_err
    FROM d ORDER BY vec_id
    """,
    doc="int8 scalar quantization audit: per-vector symmetric scale "
        "(max|x|/127), quantize → dequantize, report the cosine between "
        "original and dequantized plus the max elementwise error — the "
        "4× storage cut every 100 TB embedding table takes, with its "
        "quality loss measured rather than assumed. Pure zip_with/"
        "transform expressions, JVM-side, no UDF, no shuffle",
)
def embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.functions.vectors import (
        dequantize_int8,
        q8_scale,
        quantize_int8,
    )

    emb = load(spark, sf_dir, "embeddings")
    scaled = emb.select(
        "vec_id", "embedding", q8_scale("embedding").alias("scale"))
    deq = dequantize_int8(
        quantize_int8(F.col("embedding"), F.col("scale")), F.col("scale"))
    scaled = scaled.withColumn("deq", deq)
    max_err = F.array_max(F.zip_with(
        F.col("embedding").cast("array<double>"), F.col("deq"),
        lambda x, y: F.abs(x - y)))
    return (scaled.select(
                "vec_id",
                F.round("scale", 9).alias("scale"),
                tie_round(cosine("embedding", F.col("deq")), 6)
                 .alias("cos_sim"),
                F.round(max_err, 6).alias("max_err"))
            .orderBy("vec_id"))


def _query_vector(spark: SparkSession, sf_dir: str, vec_id: int = 1):
    """Fetch the query vector (a parameter, not data — tiny driver fetch)."""
    row = (load(spark, sf_dir, "embeddings")
           .where(F.col("vec_id") == vec_id).select("embedding").first())
    return F.array(*[F.lit(float(x)) for x in row[0]]).cast("array<double>")


@query(
    "knn_bruteforce",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1),
    sims AS (
      SELECT e.vec_id, {_cos_sql('e.embedding', 'qv')} AS c
      FROM embeddings e, q)
    SELECT vec_id, floor((c) * 1000000 + 0.5) / 1000000 AS cos_sim
    FROM sims ORDER BY floor((c) * 1000000 + 0.5) / 1000000 DESC, vec_id LIMIT 10
    """,
    doc="exact top-10 cosine neighbors of vec_id=1: scan + "
        "TakeOrderedAndProject, no shuffle — the ANN ground truth",
)
def knn_bruteforce_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    qv = _query_vector(spark, sf_dir, 1)
    return knn_bruteforce(load(spark, sf_dir, "embeddings"), qv, k=10)


@query(
    "knn_lsh",
    oracle=f"""
    WITH planes(p, pv) AS (VALUES {_planes_values(8)}),
    s AS ({_SIG_CTE}),
    q AS (
      SELECT e.embedding AS qv, s.sig AS qb
      FROM embeddings e JOIN s ON s.vec_id = e.vec_id
      WHERE e.vec_id = 1),
    sims AS (
      SELECT s.vec_id, {_cos_sql('e.embedding', 'qv')} AS c
      FROM s JOIN embeddings e ON e.vec_id = s.vec_id, q
      WHERE s.sig = qb)
    SELECT vec_id, floor((c) * 1000000 + 0.5) / 1000000 AS cos_sim
    FROM sims ORDER BY floor((c) * 1000000 + 0.5) / 1000000 DESC, vec_id LIMIT 10
    """,
    doc="LSH-bucketed ANN top-10 (deterministic seed-42 hyperplanes, "
        "numpy batch signatures); oracle inlines the 8×64 plane "
        "literals and recomputes the query/bucket signatures in SQL",
)
def knn_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    row = (load(spark, sf_dir, "embeddings")
           .where(F.col("vec_id") == 1).select("embedding").first())
    return knn_lsh(load(spark, sf_dir, "embeddings"),
                   [float(x) for x in row[0]], dim=64, k=10)


@query(
    "embedding_neardup_pairs",
    oracle=f"""
    WITH planes(p, pv) AS (VALUES {_planes_values(32)}),
    s AS ({_SIG_CTE}),
    bands AS (
      SELECT vec_id, b AS band, substr(sig, b*4 + 1, 4) AS key
      FROM s, unnest(generate_series(0, 7)) AS t(b)),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bands a JOIN bands b USING (band, key)
      WHERE a.vec_id < b.vec_id),
    pairs AS (
      SELECT id_a, id_b, {_cos_sql('sa.embedding', 'sb.embedding')} AS c
      FROM cand JOIN embeddings sa ON sa.vec_id = id_a
                JOIN embeddings sb ON sb.vec_id = id_b)
    SELECT id_a, id_b, floor((c) * 1000000 + 0.5) / 1000000 AS cos_sim
    FROM pairs WHERE floor((c) * 1000000 + 0.5) / 1000000 >= 0.35
    """,
    doc="embedding-cosine near-dup pairs (threshold 0.35 for this "
        "synthetic corpus) via BANDED hyperplane LSH (8 bands × 4 "
        "planes) — the 100 TB path: no driver collect, no cross "
        "product; oracle replicates the exact banding (32 plane "
        "literals inlined). The exact-GEMM ground truth is pytest "
        "cross-checked (tests/test_similarity_ops.py)",
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_dedup_pairs(load(spark, sf_dir, "embeddings"),
                              threshold=0.35, dim=64, use_lsh=True)


@query(
    "embedding_neardup_exact",
    oracle=f"""
    WITH pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {_cos_sql('a.embedding', 'b.embedding')} AS c
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
    SELECT id_a, id_b, floor((c) * 1000000 + 0.5) / 1000000 AS cos_sim
    FROM pairs WHERE floor((c) * 1000000 + 0.5) / 1000000 >= 0.35
    """,
    doc="EXACT embedding near-dup pairs (distributed triangle-blocked "
        "GEMM, no driver collect) — the all-pairs ground truth the "
        "banded-LSH registry twin is measured against; O(n²) compute "
        "by definition, so huge corpora take the LSH twin",
)
def embedding_neardup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_dedup_pairs(load(spark, sf_dir, "embeddings"),
                              threshold=0.35)


@query(
    "tfidf_top_terms",
    # tf = term count / doc token count (dups included); idf = ln(N/df)
    # with N = all docs, df = docs containing the term. Rank by the
    # ROUNDED score then term so the top-3 cutoff is deterministic on
    # both engines.
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    ex AS (
      SELECT doc_id, unnest(toks) AS term, len(toks) AS n_tok
      FROM t WHERE len(toks) > 0),
    tc AS (
      SELECT doc_id, term, count(*) AS cnt, any_value(n_tok) AS n_tok
      FROM ex GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df FROM tc GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tc.doc_id, tc.term,
             round((tc.cnt::double / tc.n_tok)
                   * ln(n.n_docs::double / dfreq.df), 6) AS tfidf
      FROM tc JOIN dfreq USING (term), n)
    SELECT doc_id, term, tfidf, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term ASC)::int
                AS rank
      FROM scored) WHERE rank <= 3
    """,
    doc="per-document top-3 TF-IDF terms: one explode pass partial-aggs "
        "to (doc, term, count); document frequency is an unordered "
        "window over those compact rows (NOT a second explode branch — "
        "Catalyst shares no subplans across join inputs, so the "
        "dfreq-as-join formulation ran the tokenize+explode+agg twice), "
        "then windowed top-3; shuffle carries (doc, term, count), "
        "never raw text",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    n_docs = docs.count()  # scalar aggregate, driver-safe at any scale
    toks = tokens("text")
    ex = (docs.where(F.size(toks) > 0)
              .select("doc_id", F.explode(toks).alias("term"),
                      F.size(toks).alias("n_tok")))
    tc = (ex.groupBy("doc_id", "term")
            .agg(F.count("*").alias("cnt"),
                 F.any_value(F.col("n_tok")).alias("n_tok")))
    dfw = F.count("*").over(Window.partitionBy("term"))
    scored = tc.select(
        "doc_id", "term",
        F.round((F.col("cnt").cast("double") / F.col("n_tok"))
                * F.log(F.lit(float(n_docs)) / dfw), 6).alias("tfidf"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"),
                                             F.asc("term"))
    return (scored.withColumn("rank",
                              F.row_number().over(w).cast("int"))
                  .where(F.col("rank") <= 3)
                  .select("doc_id", "term", "tfidf", "rank"))


@query(
    "decontamination",
    # benchmark set = every 20th doc (deterministic id split); a
    # training doc's contamination = fraction of its DISTINCT
    # 3-shingles that appear in ANY benchmark doc
    oracle=_SHINGLES_CTE + """
    , bench AS (
      SELECT DISTINCT unnest(shingles) AS s
      FROM sh WHERE doc_id % 20 = 0),
    tr AS (
      SELECT doc_id, unnest(shingles) AS s
      FROM sh WHERE doc_id % 20 <> 0)
    SELECT tr.doc_id,
           count(*) AS n_shingles,
           cast(sum(CASE WHEN bench.s IS NOT NULL THEN 1 ELSE 0 END)
                AS bigint) AS n_contaminated,
           floor((sum(CASE WHEN bench.s IS NOT NULL THEN 1 ELSE 0
                      END)::double / count(*))
                 * 1000000 + 0.5) / 1000000 AS contamination
    FROM tr LEFT JOIN bench USING (s)
    GROUP BY tr.doc_id
    """,
    doc="test-set decontamination: n-gram containment of training docs "
        "against a benchmark corpus — the pre-training hygiene step. "
        "Benchmark shingle set is a BROADCAST dim (dedup'd, tiny "
        "relative to the corpus); the training side streams through a "
        "broadcast hash join + one partial agg, so the 100 TB corpus "
        "never shuffles on the shingle value",
)
def decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.dedup import doc_shingles

    sh = doc_shingles(load(spark, sf_dir, "documents"))
    bench = (sh.where(F.col("doc_id") % 20 == 0)
               .select(F.explode("shingles").alias("s")).distinct()
               .withColumn("hit", F.lit(1)))
    tr = (sh.where(F.col("doc_id") % 20 != 0)
            .select("doc_id", F.explode("shingles").alias("s")))
    return (tr.join(F.broadcast(bench), "s", "left")
              .groupBy("doc_id")
              .agg(F.count("*").alias("n_shingles"),
                   F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                    .cast("long").alias("n_contaminated"),
                   # tie_round: hits/n_shingles is an exact int ratio
                   tie_round(F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                             / F.count("*"), 6).alias("contamination")))


@query(
    "decontamination_bloom",
    # IDENTICAL values to `decontamination` (a bloom filter has no
    # false negatives and every candidate is exact-verified), so the
    # oracle is the same exact-containment SQL — what differs is the
    # PLAN, which plancheck pins (3 int-keyed broadcast probes + one
    # null-key-skipping verify join)
    oracle=_SHINGLES_CTE + """
    , bench AS (
      SELECT DISTINCT unnest(shingles) AS s
      FROM sh WHERE doc_id % 20 = 0),
    tr AS (
      SELECT doc_id, unnest(shingles) AS s
      FROM sh WHERE doc_id % 20 <> 0)
    SELECT tr.doc_id,
           count(*) AS n_shingles,
           cast(sum(CASE WHEN bench.s IS NOT NULL THEN 1 ELSE 0 END)
                AS bigint) AS n_contaminated,
           floor((sum(CASE WHEN bench.s IS NOT NULL THEN 1 ELSE 0
                      END)::double / count(*))
                 * 1000000 + 0.5) / 1000000 AS contamination
    FROM tr LEFT JOIN bench USING (s)
    GROUP BY tr.doc_id
    """,
    doc="BLOOM-prefiltered decontamination — the 100 TB form of the "
        "eval-set hygiene pass (GPT-3/Llama style): when the benchmark "
        "shingle set outgrows a string broadcast (hundreds of eval "
        "suites × 13-grams), its BLOOM POSITION dim still broadcasts — "
        "bounded by m (2^16) regardless of eval size. Train shingles "
        "probe the k=3 positions via 3 int-keyed broadcast hash joins "
        "(pure column expressions, NO explode — each probe is one "
        "xxhash64+pmod), then ONE partial-agg pass folds the corpus "
        "to doc-level rows (count + bloom-thinned candidate list) — "
        "so only CANDIDATES ever reach the exact verify join, whose "
        "strategy is AQE's call (no broadcast hint, VERDICT r10 "
        "item 1): broadcast while the eval strings fit, shuffle past "
        "the budget — and a shuffle there moves candidate-sized "
        "inputs on both sides, never the corpus. False positives "
        "cost one extra hash probe, never a "
        "wrong value (exact verify); false negatives are impossible, "
        "so values equal plain `decontamination` — the shared oracle "
        "pins that. Bloom machinery shared with plans/bloomindex.py",
)
def decontamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.dedup import doc_shingles
    from rsyslog_nginx_clickhouse_spark.plans.bloomindex import (
        bloom_positions,
    )

    from rsyslog_nginx_clickhouse_spark.plans.barrier import barrier

    sh = doc_shingles(load(spark, sf_dir, "documents"))
    # barrier: the bench dims feed FOUR joins, and Catalyst shares no
    # subplans across join inputs — without it the bench shingle
    # aggregation re-runs per probe (plancheck showed scans=5). Both
    # dims are parameter-sized (≤ distinct eval shingles / ≤ m rows)
    bench_sh = barrier(
        sh.where(F.col("doc_id") % 20 == 0)
          .select(F.explode("shingles").alias("bs")).distinct())
    # the m-bounded broadcast dim: every set bloom position, ≤ 2^16
    # rows no matter how many eval shingles exist
    bloom_dim = barrier(
        bench_sh.select(F.explode(bloom_positions(F.col("bs")))
                         .alias("pos"))
                .distinct())
    tr = (sh.where(F.col("doc_id") % 20 != 0)
            .select("doc_id", F.explode("shingles").alias("s")))
    probed = tr
    for i in range(3):
        d = bloom_dim.select(F.col("pos").alias(f"p{i}"),
                             F.lit(1).alias(f"h{i}"))
        probed = probed.join(
            F.broadcast(d),
            F.element_at(bloom_positions(F.col("s")), i + 1)
            == F.col(f"p{i}"), "left").drop(f"p{i}")
    cand = (F.col("h0").isNotNull() & F.col("h1").isNotNull()
            & F.col("h2").isNotNull())
    # ONE corpus pass: the partial-agg shuffle carries (doc_id, count,
    # bloom-thinned candidate list) — docs + candidates, never the
    # full shingle stream. Only candidates then reach the exact
    # verify join, which deliberately carries NO broadcast hint
    # (VERDICT r10 item 1): the eval shingle STRING set is the side
    # that can outgrow a broadcast — the regime this form exists for —
    # so AQE picks the strategy, and if it shuffles, BOTH join inputs
    # are already candidate-sized. barrier: per_doc feeds the verify
    # path and the final join; doc-level rows (id, count, small
    # array), so the checkpoint is corpus-count-sized, not
    # corpus-sized.
    per_doc = barrier(
        probed.groupBy("doc_id").agg(
            F.count("*").alias("n_shingles"),
            F.collect_list(F.when(cand, F.col("s"))).alias("cands")))
    hits = (per_doc.select("doc_id", F.explode("cands").alias("s_cand"))
            .join(bench_sh, F.col("s_cand") == F.col("bs"))
            .groupBy("doc_id")
            .agg(F.count("*").alias("hits")))
    return (per_doc.drop("cands").join(hits, "doc_id", "left")
            .select("doc_id", "n_shingles",
                    F.coalesce(F.col("hits"), F.lit(0))
                     .cast("long").alias("n_contaminated"),
                    tie_round(F.coalesce(F.col("hits"), F.lit(0))
                              / F.col("n_shingles"), 6)
                    .alias("contamination")))


# ---------------------------------------------------------- multimodal --


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id, octet_length(encode(text))::int AS n_bytes,
           md5(text) AS content_hash
    FROM documents
    """,
    doc="multimodal plumbing: binary payload column + mapInPandas feature "
        "extraction (decode stubbed, deterministic); oracle checks the "
        "payload byte-length and content hash computed inside the UDF",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = attach_binary(load(spark, sf_dir, "documents"))
    return extract_features(mm, fake=True).select("doc_id", "n_bytes",
                                                  "content_hash")


@query(
    "multimodal_decode_bmp",
    # pixel p of the rendered 8x8 BMP has r=g=b=ord(text[p % len]),
    # so the decoded features (row means of the grayscale / 255) are
    # derivable from the text alone: exact integer sums / 8 / 255 —
    # terminating cases have <= 3 decimals, non-terminating cases
    # cannot sit on a rounding tie, so plain round(6) is cross-engine
    # exact (functions/rounding.py discipline)
    oracle="""
    SELECT doc_id, (p.p // 8)::int AS feat_idx,
           round(avg(ascii(substr(text, (p.p % length(text)) + 1, 1)))
                 / 255.0, 6) AS feat
    FROM documents, unnest(generate_series(0, 63)) AS p(p)
    GROUP BY doc_id, p.p // 8
    ORDER BY doc_id, feat_idx
    """,
    doc="REAL multimodal decode (VERDICT r4 item 7): render each doc "
        "as a genuine 24-bit BMP (header, bottom-up BGR rows), decode "
        "it back with the dependency-free parser (fake=False), and "
        "emit the 8 grayscale-chunk features; the oracle recomputes "
        "the decoded values from the text bytes — proving the decoder "
        "actually parsed the format, not a stand-in hash",
)
def multimodal_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
        attach_bmp,
    )

    mm = attach_bmp(_docs(spark, sf_dir))
    feats = extract_features(mm, fake=False)
    return (feats.select("doc_id", F.posexplode("features"))
                 .select("doc_id",
                         F.col("pos").cast("int").alias("feat_idx"),
                         F.round("col", 6).alias("feat"))
                 .orderBy("doc_id", "feat_idx"))


@query(
    "multimodal_decode_png",
    # pixel p of the rendered 16x8 PNG has r=g=b=ord(text[p % len]);
    # features = 16-pixel-chunk grayscale means / 255, so each feat is
    # an integer sum / (16·255): the terminating cases have <= 5
    # decimals (the 2-5 part of 4080 is 80), non-terminating cases
    # cannot sit on a rounding tie — plain round(6) is cross-engine
    # exact (functions/rounding.py discipline, same as the BMP query)
    oracle="""
    SELECT doc_id, (p.p // 16)::int AS feat_idx,
           round(avg(ascii(substr(text, (p.p % length(text)) + 1, 1)))
                 / 255.0, 6) AS feat
    FROM documents, unnest(generate_series(0, 127)) AS p(p)
    GROUP BY doc_id, p.p // 16
    ORDER BY doc_id, feat_idx
    """,
    doc="REAL PNG decode, zero dependencies beyond stdlib zlib "
        "(VERDICT r5 item 6): render each doc as a genuine 8-bit RGB "
        "PNG — zlib-compressed IDAT, CRC-checked chunks, and a "
        "DIFFERENT filter type per scanline (None/Sub/Up/Average/"
        "Paeth cycling) — decode it back with the dependency-free "
        "parser (inflate + all five unfilter paths), and emit the 8 "
        "grayscale-chunk features; the oracle recomputes the decoded "
        "values from the text bytes, so a single mis-unfiltered byte "
        "anywhere fails the hash",
)
def multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
        attach_png,
    )

    mm = attach_png(_docs(spark, sf_dir))
    feats = extract_features(mm, fake=False)
    return (feats.select("doc_id", F.posexplode("features"))
                 .select("doc_id",
                         F.col("pos").cast("int").alias("feat_idx"),
                         F.round("col", 6).alias("feat"))
                 .orderBy("doc_id", "feat_idx"))


@query(
    "multimodal_decode_jpeg",
    # the rendered 16x16 grayscale JPEG is a 2x2 grid of CONSTANT 8x8
    # blocks, block b = ord(text[b % len]) — constant blocks are
    # DC-only, so with an all-ones quant table the lossy format round-
    # trips losslessly and every decoded pixel is text-derivable:
    # pixel (y,x) = block (y//8)*2 + (x//8). Features are 32-pixel
    # chunk means / 255 (2 rows per chunk, 16 px of each of two
    # horizontally-adjacent blocks): integer avg / 255 cannot sit on a
    # 6-decimal tie ((a+b)/510 = m/10^7 forces m % 10 = 0), so plain
    # round(6) is cross-engine exact (functions/rounding.py
    # discipline, same class as the BMP/PNG decode queries)
    oracle="""
    SELECT doc_id, (p.p // 32)::int AS feat_idx,
           round(avg(ascii(substr(text,
                 ((((p.p // 16) // 8) * 2 + ((p.p % 16) // 8))
                  % length(text)) + 1, 1))) / 255.0, 6) AS feat
    FROM documents, unnest(generate_series(0, 255)) AS p(p)
    GROUP BY doc_id, p.p // 32
    ORDER BY doc_id, feat_idx
    """,
    doc="REAL baseline JPEG decode, zero dependencies (VERDICT r7 "
        "item 9 — JPEG is the most common real-corpus image format, "
        "previously a NotImplementedError gate): render each doc as a "
        "genuine baseline-sequential grayscale JFIF (standard Annex K "
        "Huffman tables, DC-predicted entropy coding, byte stuffing), "
        "decode it back through the full path — marker parse, "
        "canonical Huffman from the stream's own DHT, dequant, "
        "zigzag, float IDCT, level shift — and emit the 8 "
        "grayscale-chunk features; constant 8x8 blocks make the DCT "
        "round-trip exact, so the oracle recomputes every decoded "
        "value from the text bytes and one mis-decoded coefficient "
        "anywhere fails the hash "
        "(operators/multimodal.decode_jpeg)",
)
def multimodal_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
        attach_jpeg,
    )

    mm = attach_jpeg(_docs(spark, sf_dir))
    feats = extract_features(mm, fake=False)
    return (feats.select("doc_id", F.posexplode("features"))
                 .select("doc_id",
                         F.col("pos").cast("int").alias("feat_idx"),
                         F.round("col", 6).alias("feat"))
                 .orderBy("doc_id", "feat_idx"))


@query(
    "multimodal_decode_jpeg_progressive",
    # same rendered image as multimodal_decode_jpeg (2x2 grid of
    # constant DC-only blocks, all-ones quant → lossless), different
    # WIRE FORMAT: six SOF2 scans (DC first at Al=1, DC refinement,
    # AC first split 1-5/6-63, AC refinement of both bands), so the
    # oracle is byte-for-byte the baseline one — the decoded pixels
    # must be identical whichever scan script carried them
    oracle="""
    SELECT doc_id, (p.p // 32)::int AS feat_idx,
           round(avg(ascii(substr(text,
                 ((((p.p // 16) // 8) * 2 + ((p.p % 16) // 8))
                  % length(text)) + 1, 1))) / 255.0, 6) AS feat
    FROM documents, unnest(generate_series(0, 255)) AS p(p)
    GROUP BY doc_id, p.p // 32
    ORDER BY doc_id, feat_idx
    """,
    doc="REAL progressive (SOF2) JPEG decode, zero dependencies "
        "(VERDICT r10 item 8 — the most common previously-gated codec "
        "in real crawls): render each doc as a genuine multi-scan "
        "progressive JFIF (spectral selection + successive "
        "approximation: DC first with point transform, DC refinement "
        "bits, band-split AC first scans with EOB runs, AC refinement "
        "with correction bits) and decode it back — coefficients "
        "accumulate across scans, one IDCT at EOI. The text-derived "
        "oracle is identical to multimodal_decode_jpeg's, pinning "
        "scan-script invariance; a 40-trial random-coefficient "
        "equivalence pytest pins the nonzero-AC refinement paths the "
        "constant-block render cannot reach "
        "(operators/multimodal._jpeg_progressive_scan; arithmetic "
        "coding SOF9+ stays loudly rejected)",
)
def multimodal_decode_jpeg_progressive(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
        attach_progressive_jpeg,
    )

    mm = attach_progressive_jpeg(_docs(spark, sf_dir))
    feats = extract_features(mm, fake=False)
    return (feats.select("doc_id", F.posexplode("features"))
                 .select("doc_id",
                         F.col("pos").cast("int").alias("feat_idx"),
                         F.round("col", 6).alias("feat"))
                 .orderBy("doc_id", "feat_idx"))


@query(
    "multimodal_decode_jpeg_420",
    # same pixel contract as multimodal_decode_jpeg — the 4:2:0 color
    # render keeps Cb=Cr at the constant 128 (DC 0), so after the
    # nearest chroma upsample BT.601 gives RGB = (Y, Y, Y) exactly and
    # the channel-mean gray equals the Y value: the text-derived
    # oracle is byte-identical to the grayscale one, while the wire
    # format is the dominant real-crawl form — 3 components, Y at
    # 2x2 per 16x16 MCU, chroma quarter-res, three DC predictors
    oracle="""
    SELECT doc_id, (p.p // 32)::int AS feat_idx,
           round(avg(ascii(substr(text,
                 ((((p.p // 16) // 8) * 2 + ((p.p % 16) // 8))
                  % length(text)) + 1, 1))) / 255.0, 6) AS feat
    FROM documents, unnest(generate_series(0, 255)) AS p(p)
    GROUP BY doc_id, p.p // 32
    ORDER BY doc_id, feat_idx
    """,
    doc="REAL chroma-subsampled (4:2:0) color JPEG decode, zero "
        "dependencies (VERDICT r11 item 1 — 4:2:0 is what cameras "
        "and CDNs emit, previously rejected at the SOF parse): "
        "render each doc as a genuine 3-component YCbCr baseline "
        "JFIF with Y sampled 2x2 per MCU and quarter-res chroma, "
        "decode through the full interleaved-MCU path — per-"
        "component sampling factors, hs x vs data units per MCU, "
        "independent DC predictors, nearest-neighbor chroma "
        "upsample, BT.601 — and emit the 8 grayscale-chunk "
        "features. Neutral chroma (128) makes RGB = Y exactly, so "
        "the oracle recomputes every decoded value from the text "
        "bytes; non-neutral chroma geometry is pinned by a numpy-"
        "reference pytest (4:2:0 and 4:2:2). Progressive+subsampled "
        "and non-integer ratios stay loudly rejected "
        "(operators/multimodal.render_jpeg_subsampled_bytes, "
        "decode_jpeg)",
)
def multimodal_decode_jpeg_420(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
        attach_jpeg_420,
    )

    mm = attach_jpeg_420(_docs(spark, sf_dir))
    feats = extract_features(mm, fake=False)
    return (feats.select("doc_id", F.posexplode("features"))
                 .select("doc_id",
                         F.col("pos").cast("int").alias("feat_idx"),
                         F.round("col", 6).alias("feat"))
                 .orderBy("doc_id", "feat_idx"))


@query(
    "multimodal_resize",
    # the 8x8 render has pixel (y,x) = ord(text[(8y+x) % len]);
    # nearest-neighbor 8->4 samples the pixel CENTER: source index
    # min(int((i+0.5)*8/4), 7) = 2i+1, so resized (i,j) = source
    # (2i+1, 2j+1) — all-integer output, no rounding involved
    oracle="""
    SELECT doc_id, (y.y * 4 + x.x)::int AS px_idx,
           ascii(substr(text,
                 (((2*y.y + 1) * 8 + (2*x.x + 1)) % length(text)) + 1,
                 1))::int AS gray
    FROM documents,
         unnest(generate_series(0, 3)) AS y(y),
         unnest(generate_series(0, 3)) AS x(x)
    ORDER BY doc_id, px_idx
    """,
    doc="image thumbnail path: render each doc as a real 24-bit BMP, "
        "decode it back (dependency-free parser), nearest-neighbor "
        "resize 8x8 -> 4x4, emit the 16 output pixels. The oracle "
        "derives every resized pixel from the text alone through the "
        "pixel-center sampling formula — proving decode AND the "
        "resize geometry end-to-end "
        "(operators/multimodal.resize_images, mapInPandas; output "
        "rows are fixed out_h*out_w per image regardless of source "
        "resolution, so the sweep never shuffles pixels)",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
        attach_bmp,
        resize_images,
    )

    mm = attach_bmp(_docs(spark, sf_dir))
    return (resize_images(mm, out_h=4, out_w=4)
            .orderBy("doc_id", "px_idx"))


@query(
    "image_hash_dedup",
    # integer-exact aHash replay: pixel p of the rendered 8x8 BMP is
    # ord(text[p % len]); bit p ⇔ 64·v_p > Σv (no float mean); the
    # 64-bit value packs MSB-first into two's-complement BIGINT by
    # summing 2^(63-p) terms with the p=0 term written as -2^63
    # (every other term fits in BIGINT); pairs = exact popcount over
    # xor — all integers end to end, so the value gate covers every
    # hash bit and every pair decision
    oracle="""
    WITH px AS (
      SELECT doc_id, p.p AS p,
             ascii(substr(text, (p.p % length(text)) + 1, 1)) AS v
      FROM documents, unnest(generate_series(0, 63)) AS p(p)),
    b AS (
      SELECT doc_id, p, v,
             64 * v > sum(v) OVER (PARTITION BY doc_id) AS bit
      FROM px),
    h AS (
      SELECT doc_id,
             sum(CASE WHEN NOT bit THEN 0
                      WHEN p = 0 THEN -9223372036854775808
                      ELSE (CAST(1 AS BIGINT) << (63 - p)) END)::BIGINT
               AS fp
      FROM b GROUP BY doc_id)
    SELECT a.doc_id AS id_a, c.doc_id AS id_b,
           bit_count(xor(a.fp, c.fp))::int AS hamming
    FROM h a JOIN h c ON a.doc_id < c.doc_id
    WHERE bit_count(xor(a.fp, c.fp)) <= 3
    ORDER BY id_a, id_b
    """,
    doc="perceptual image near-dup pairs — the image half of the "
        "dedup family (VERDICT r7 item 9 companion): render each doc "
        "as a real 8x8 BMP, decode it, hash with the INTEGER-EXACT "
        "average hash (bit p ⇔ 64·gray_p > Σgray — no float mean, so "
        "the SQL oracle replays every bit), then the same pigeonhole "
        "chunk-LSH join as text SimHash (budget 3 → 4 chunks; any "
        "pair within budget agrees on ≥1 chunk) + exact popcount "
        "verify. The shuffle carries (id, hash) — 16 bytes a row, "
        "never pixels. The DCT pHash variant (image_phash64) shares "
        "this exact plan and is pinned by tests against a numpy "
        "replay — float DCT + median thresholds are not cross-engine "
        "value-gateable (operators/imagehash.py)",
)
def image_hash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.imagehash import (
        image_hash_pairs,
    )
    from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
        attach_bmp,
    )

    mm = attach_bmp(_docs(spark, sf_dir))
    return (image_hash_pairs(mm, kind="ahash", max_hamming=3)
            .orderBy("id_a", "id_b"))


@query(
    "multimodal_decode_audio",
    # sample p of the rendered WAV is (ord(text[p % len]) - 128)·256;
    # features are 8-sample chunk means / 32768 — ALL-DYADIC
    # arithmetic (integer sums over power-of-two divisors), so both
    # engines produce bit-identical doubles and NO rounding discipline
    # is needed (functions/rounding.py: exact values, no tie exists)
    oracle="""
    SELECT doc_id, (p.p // 8)::int AS chunk_idx,
           avg((ascii(substr(text, (p.p % length(text)) + 1, 1)) - 128)
               * 256.0) / 32768.0 AS level
    FROM documents, unnest(generate_series(0, 63)) AS p(p)
    GROUP BY doc_id, p.p // 8
    ORDER BY doc_id, chunk_idx
    """,
    doc="REAL audio decode, zero dependencies: render each doc as a "
        "genuine 16-bit PCM mono WAV (RIFF chunk layout, even-offset "
        "padding rules), decode it back with the dependency-free "
        "RIFF walker, and emit per-chunk PCM level features; the "
        "oracle recomputes the decoded samples from the text bytes — "
        "closing the audio half of the multimodal NotImplementedError "
        "gate the same way BMP/PNG closed the image half",
)
def multimodal_decode_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
        attach_payload,
        extract_audio_features,
        render_wav_bytes,
    )

    mm = attach_payload(_docs(spark, sf_dir), render_wav_bytes)
    feats = extract_audio_features(mm)
    return (feats.select("doc_id", F.posexplode("features"))
                 .select("doc_id",
                         F.col("pos").cast("int").alias("chunk_idx"),
                         F.col("col").alias("level"))
                 .orderBy("doc_id", "chunk_idx"))


@query(
    "multimodal_decode_audio_stereo8",
    # the 8-bit STEREO render duplicates each sample on both channels
    # (the floor-mean downmix returns it exactly) and stores the
    # unsigned byte (the (v-128)*256 rescale reproduces the 16-bit
    # grid exactly), so the decoded samples — and this oracle — are
    # byte-identical to multimodal_decode_audio's, pinning wire-
    # format invariance (the JPEG-progressive precedent)
    oracle="""
    SELECT doc_id, (p.p // 8)::int AS chunk_idx,
           avg((ascii(substr(text, (p.p % length(text)) + 1, 1)) - 128)
               * 256.0) / 32768.0 AS level
    FROM documents, unnest(generate_series(0, 63)) AS p(p)
    GROUP BY doc_id, p.p // 8
    ORDER BY doc_id, chunk_idx
    """,
    doc="REAL stereo 8-bit PCM WAV decode (round 12 — CD rips are "
        "16-bit stereo, telephony 8-bit; both previously rejected): "
        "the RIFF walker now accepts any channel count (integer "
        "floor-mean downmix, exactly specifiable) and 8-bit unsigned "
        "PCM (recentred to the int16 grid as (v-128)*256). The "
        "render duplicates samples across channels and the decode "
        "folds them back, so the text-derived oracle is shared with "
        "the mono-16 row; asymmetric-channel downmix and the "
        "8-bit recentring are pinned by pytest "
        "(operators/multimodal.decode_wav)",
)
def multimodal_decode_audio_stereo8(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
        attach_payload,
        extract_audio_features,
        render_wav_bytes,
    )

    mm = attach_payload(
        _docs(spark, sf_dir),
        lambda t: render_wav_bytes(t, channels=2, bits=8))
    feats = extract_audio_features(mm)
    return (feats.select("doc_id", F.posexplode("features"))
                 .select("doc_id",
                         F.col("pos").cast("int").alias("chunk_idx"),
                         F.col("col").alias("level"))
                 .orderBy("doc_id", "chunk_idx"))


@query(
    "multimodal_decode_video",
    # frame f, pixel p of the rendered y4m has Y = ord(text[(f·64 + p)
    # % len]); kept frames (stride 2 of 4) report luma mean / 255:
    # terminating cases have <= 6 decimals (2-5 part of 64·255 is
    # 320), non-terminating cases cannot sit on a tie — plain
    # round(6) is cross-engine exact, same argument as the BMP query.
    # Oracle divides the EXACT integer avg once (avg(y)/255), the
    # same op order as the Spark side's mean-then-divide.
    oracle="""
    SELECT doc_id, f.f::int AS frame_idx,
           round(avg(ascii(substr(text,
                     ((f.f * 64 + p.p) % length(text)) + 1, 1)))
                 / 255.0, 6) AS y_mean
    FROM documents,
         unnest(generate_series(0, 3)) AS f(f),
         unnest(generate_series(0, 63)) AS p(p)
    WHERE f.f % 2 = 0
    GROUP BY doc_id, f.f
    ORDER BY doc_id, frame_idx
    """,
    doc="REAL video decode, zero dependencies: render each doc as a "
        "genuine YUV4MPEG2 clip (stream header, FRAME markers, 4:4:4 "
        "planar YUV), decode it back with the dependency-free parser, "
        "sample every 2nd frame, and emit per-frame luma means; the "
        "oracle recomputes the kept frames' pixels from the text "
        "bytes — the codec version of frame_sample's chunk/stride "
        "schedule, closing the video half of the multimodal gate",
)
def multimodal_decode_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
        attach_payload,
        render_y4m_bytes,
        video_frame_stats,
    )

    mm = attach_payload(_docs(spark, sf_dir), render_y4m_bytes)
    stats = video_frame_stats(mm, stride=2)
    return (stats.select("doc_id", "frame_idx",
                         F.round("y_mean", 6).alias("y_mean"))
                 .orderBy("doc_id", "frame_idx"))


@query(
    "multimodal_decode_video_420",
    # same decoded array as multimodal_decode_video — the C420 render
    # keeps chroma at the neutral 128 so the replication upsample
    # reproduces it exactly and the luma plane is untouched by the
    # wire format; the oracle is byte-identical to the C444 one,
    # pinning colorspace invariance (the JPEG-progressive precedent)
    oracle="""
    SELECT doc_id, f.f::int AS frame_idx,
           round(avg(ascii(substr(text,
                     ((f.f * 64 + p.p) % length(text)) + 1, 1)))
                 / 255.0, 6) AS y_mean
    FROM documents,
         unnest(generate_series(0, 3)) AS f(f),
         unnest(generate_series(0, 63)) AS p(p)
    WHERE f.f % 2 = 0
    GROUP BY doc_id, f.f
    ORDER BY doc_id, frame_idx
    """,
    doc="REAL 4:2:0 video decode (round 12 — C420 is y4m's DEFAULT "
        "colorspace and what every real y4m in a crawl uses; it was "
        "rejected until now): render each doc as a genuine C420 "
        "YUV4MPEG2 clip (quarter-res chroma planes), decode through "
        "the subsampled-plane path — per-colorspace plane geometry, "
        "replication upsample — sample every 2nd frame, emit "
        "per-frame luma means. Neutral chroma makes the decoded "
        "array identical to the C444 form, so the text-derived "
        "oracle is shared; non-neutral chroma geometry and the "
        "C420jpeg/mpeg2/paldv siting variants are pinned by pytest "
        "(operators/multimodal.decode_y4m)",
)
def multimodal_decode_video_420(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
        attach_payload,
        render_y4m_bytes,
        video_frame_stats,
    )

    mm = attach_payload(
        _docs(spark, sf_dir),
        lambda t: render_y4m_bytes(t, colorspace="C420"))
    stats = video_frame_stats(mm, stride=2)
    return (stats.select("doc_id", "frame_idx",
                         F.round("y_mean", 6).alias("y_mean"))
                 .orderBy("doc_id", "frame_idx"))


# -------------------------------------------------- tokens / ivf / frames --


@query(
    "token_counts",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(lower(trim(text)), '\\s+'))
           END AS ws_tokens,
           len(regexp_extract_all(text,
               '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS bpe_tokens,
           length(text) AS n_chars
    FROM documents
    """,
    doc="token budgeting: whitespace tokens + BPE-ish subword pieces "
        "(letter/digit/symbol runs — GPT-2 pre-tokenizer classes in the "
        "Java∩RE2 regex subset so the oracle matches bit-for-bit)",
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.functions.text import (
        bpe_ish_token_count,
        char_count,
    )

    return _docs(spark, sf_dir).select(
        "doc_id",
        token_count("text").alias("ws_tokens"),
        bpe_ish_token_count("text").alias("bpe_tokens"),
        char_count("text").cast("long").alias("n_chars"))


def _ivf_train_ctes(n_iter: int = 2, n_lists: int | str = 16,
                    dim: int = 64,
                    src: str = "embeddings") -> tuple[list[str], str]:
    """CTE chain replaying the deterministic Lloyd training
    (operators/similarity.py ivf_centroids_lloyd) in SQL, iteration by
    iteration; returns (ctes, name-of-final-centroid-CTE). Shared by
    the ivf_build and knn_ivf oracles so the replay cannot drift.
    ``src`` is the training relation — the default trains on the full
    table; ivf_append_probe trains on the 90% base subset and folds
    the rest in via append, so its oracle passes a filtered subquery.

    Assignment = argmax cosine (row_number ties → lowest list_id,
    matching np.argmax first-max). Centroid update = the INTEGER-EXACT
    mean of _lloyd_update_exact (ADVICE r5): components scaled by 2^50
    into exact integers, summed (BIGINT→HUGEINT, exact in any order),
    mean tie-rounded to 6 decimals as
    (2·1e6·(S+4·D) + D) // (2·D) − 4·1e6 over D = n·2^50 — the
    identical integer sequence the Spark side computes, so both
    engines iterate from bit-identical centroids regardless of
    partitioning. An empty list keeps its previous centroid
    (count(cm)=0 CASE ↔ the empty-stats fallthrough).

    ``n_lists`` may be an int literal or a SQL scalar-subquery string
    (e.g. the corpus-scaled ``_SEMDEDUP_NLISTS_SQL``) — it lands in
    the seed CTE's LIMIT, which DuckDB evaluates either way."""
    from rsyslog_nginx_clickhouse_spark.operators.similarity import (
        EMB_SCALE,
    )

    ctes = [f"""c0 AS (
      SELECT list_id, cv FROM (
        SELECT embedding::DOUBLE[] AS cv,
               row_number() OVER (ORDER BY vec_id) - 1 AS list_id
        FROM {src} ORDER BY vec_id LIMIT {n_lists}))"""]
    prev = "c0"
    for i in range(1, n_iter + 1):
        ctes.append(f"""asg{i} AS (
      SELECT vec_id, embedding, list_id FROM (
        SELECT e.vec_id, e.embedding, c.list_id,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_cos_sql('e.embedding', 'c.cv')}
                                        DESC, c.list_id ASC) AS rn
        FROM {src} e CROSS JOIN {prev} c) WHERE rn = 1)""")
        ctes.append(f"""s{i} AS (
      SELECT a.list_id, g.g AS dim,
             sum(CAST(a.embedding[g.g]::DOUBLE * {EMB_SCALE} AS BIGINT))
               AS sm,
             count(*)::HUGEINT * {EMB_SCALE} AS den
      FROM asg{i} a, unnest(generate_series(1, {dim})) AS g(g)
      GROUP BY a.list_id, g.g)""")
        ctes.append(f"""m{i} AS (
      SELECT list_id, dim,
             ((2000000 * (sm + 4 * den) + den) // (2 * den)
              - 4000000) / 1000000.0 AS cm
      FROM s{i})""")
        ctes.append(f"""c{i} AS (
      SELECT p.list_id,
             CASE WHEN count(m.cm) = 0 THEN p.cv
                  ELSE list(m.cm ORDER BY m.dim) END AS cv
      FROM {prev} p LEFT JOIN m{i} m USING (list_id)
      GROUP BY p.list_id, p.cv)""")
        prev = f"c{i}"
    return ctes, prev


def _ivf_lloyd_oracle(n_iter: int = 2, n_lists: int = 16,
                      dim: int = 64, train_src: str = "embeddings",
                      q_vec_id: int = 1) -> str:
    """The knn_ivf oracle: full Lloyd training replay
    (_ivf_train_ctes), final assignment, probe selection, and exact
    cosine re-rank inside the probed lists — entirely in SQL.

    ``train_src``/``q_vec_id`` generalize it for ivf_append_probe:
    training runs over a SUBSET relation while the final assignment
    (asgf) always covers ALL of embeddings — exactly what
    build-on-base + append-the-rest produces, because ivf_append
    assigns new vectors against the same persisted final centroids
    the build assigned the base with."""
    ctes, prev = _ivf_train_ctes(n_iter, n_lists, dim, src=train_src)
    ctes.append(f"""asgf AS (
      SELECT vec_id, embedding, list_id FROM (
        SELECT e.vec_id, e.embedding, c.list_id,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_cos_sql('e.embedding', 'c.cv')}
                                        DESC, c.list_id ASC) AS rn
        FROM embeddings e CROSS JOIN {prev} c) WHERE rn = 1)""")
    ctes.append("q AS (SELECT embedding AS qv FROM embeddings "
                f"WHERE vec_id = {q_vec_id})")
    ctes.append(f"""probes AS (
      SELECT c.list_id FROM {prev} c, q
      ORDER BY {_cos_sql('c.cv', 'qv')} DESC, c.list_id ASC LIMIT 4)""")
    ctes.append(f"""sims AS (
      SELECT a.vec_id, {_cos_sql('a.embedding', 'qv')} AS c
      FROM asgf a, q
      WHERE a.list_id IN (SELECT list_id FROM probes))""")
    return ("WITH " + ",\n    ".join(ctes) + """
    SELECT vec_id, floor((c) * 1000000 + 0.5) / 1000000 AS cos_sim
    FROM sims ORDER BY floor((c) * 1000000 + 0.5) / 1000000 DESC,
             vec_id LIMIT 10""")


def _ivf_index_dir(sf_dir: str) -> str:
    """Per-sf_dir home for the persisted IVF index. Overridable so a
    read-only checkout can point somewhere writable; defaults beside
    the repo's other written artifacts (spark-warehouse, gitignored).
    """
    base = os.environ.get(
        "SPARK_GRAFT_INDEX_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "spark-warehouse", "ivf"))
    return os.path.join(base, os.path.basename(os.path.normpath(sf_dir)))


def _ivf_ensure_index(spark: SparkSession, sf_dir: str) -> str:
    """Build the persisted IVF index iff absent/stale (fingerprint =
    embeddings.parquet path+mtime+size + training params); returns the
    index dir. Training is deterministic, so a cached index and a
    fresh build yield byte-identical probe results."""
    from rsyslog_nginx_clickhouse_spark.operators.similarity import (
        ivf_build,
        ivf_index_fresh,
    )

    src = os.path.join(sf_dir, "embeddings.parquet")
    idx = _ivf_index_dir(sf_dir)
    if not ivf_index_fresh(idx, src):
        ivf_build(spark, load(spark, sf_dir, "embeddings"), idx,
                  embeddings_src=src)
    return idx


@query(
    "ivf_build",
    # the centroids are DERIVED FROM THE DATA by the deterministic
    # Lloyd k-means (2 iterations from the 16 lowest-vec_id seeds), so
    # the oracle replays the whole training in SQL — no literals needed
    oracle="WITH " + ",\n    ".join(_ivf_train_ctes()[0]) + f"""
    SELECT p.list_id::BIGINT AS list_id, g.g::BIGINT AS dim,
           p.cv[g.g] AS cm
    FROM {_ivf_train_ctes()[1]} p,
         unnest(generate_series(1, 64)) AS g(g)
    ORDER BY list_id, dim""",
    doc="the IVF index BUILD step, separated from the probe (VERDICT "
        "r5 item 3: real ANN builds once, probes many — retraining "
        "inside every query is the wrong amortization at 100 TB): "
        "trains deterministic distributed Lloyd k-means "
        "(integer-exact tie-rounded means), persists centroids + "
        "assignments PARTITIONED BY list_id (probe-time partition "
        "pruning), returns the centroid table read back from disk; "
        "oracle replays the full training in SQL",
)
def ivf_build_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.similarity import (
        ivf_build,
    )

    src = os.path.join(sf_dir, "embeddings.parquet")
    return ivf_build(spark, load(spark, sf_dir, "embeddings"),
                     _ivf_index_dir(sf_dir), embeddings_src=src)


@query(
    "knn_ivf",
    oracle=_ivf_lloyd_oracle(),
    doc="IVF ANN top-10 over the PERSISTED index (built by ivf_build "
        "if absent/stale — deterministic training makes cached and "
        "fresh indexes identical): parameter-sized centroid fetch "
        "picks nprobe=4 of 16 lists, partition-pruned scan of only "
        "those lists, exact cosine re-rank; recall vs brute force "
        "recorded in tests/test_similarity_ops.py; oracle replays "
        "training/assignment/probes entirely in SQL",
)
def knn_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.similarity import (
        ivf_probe,
    )

    row = (load(spark, sf_dir, "embeddings")
           .where(F.col("vec_id") == 1).select("embedding").first())
    idx = _ivf_ensure_index(spark, sf_dir)
    return ivf_probe(spark, idx, [float(x) for x in row[0]], k=10)


@query(
    "ivf_append_probe",
    # training replay runs on the 90% BASE subset; final assignment
    # covers ALL vectors — build assigns the base and append assigns
    # the held-out 10% against the SAME final centroids, so one asgf
    # over embeddings replays both paths
    oracle=_ivf_lloyd_oracle(
        train_src="(SELECT * FROM embeddings WHERE vec_id % 10 != 0)",
        q_vec_id=10),
    doc="IVF incremental-append lifecycle under the value oracle "
        "(VERDICT r6 item 2 — the daily index-maintenance path, where "
        "a silent assignment bug would corrupt retrieval gradually): "
        "build the index from vec_id % 10 != 0, ivf_append the "
        "held-out 10% (no retrain, touched-partition appends only), "
        "then probe with vec_id 10's embedding — an APPENDED vector, "
        "which must surface itself (cos 1.0) plus appended/base "
        "neighbors; oracle replays base-subset training + full "
        "assignment + probe ranking in SQL",
)
def ivf_append_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.similarity import (
        ivf_append,
        ivf_build,
        ivf_index_fresh,
        ivf_probe,
    )

    src = os.path.join(sf_dir, "embeddings.parquet")
    idx = _ivf_index_dir(sf_dir) + "_append"
    emb = load(spark, sf_dir, "embeddings")
    marker = os.path.join(idx, "appended.json")
    # idempotent across invocations: meta.json fingerprints the build
    # (written AFTER the assign write), the marker records that the
    # append ran (written after it) — a crash between any two steps
    # leaves the marker absent, and the rebuild's overwrite clears any
    # partial append, so re-runs never double-append
    if not (ivf_index_fresh(idx, src) and os.path.exists(marker)):
        ivf_build(spark, emb.where(F.col("vec_id") % 10 != 0), idx,
                  embeddings_src=src)
        ivf_append(spark, emb.where(F.col("vec_id") % 10 == 0), idx)
        with open(marker, "w") as f:
            json.dump({"appended": "vec_id % 10 == 0"}, f)
    row = emb.where(F.col("vec_id") == 10).select("embedding").first()
    return ivf_probe(spark, idx, [float(x) for x in row[0]], k=10)


def _pq_l2key_sql(vec_slice: str, cv: str, d_sub: int) -> str:
    """Rank-equivalent L2 key −2·x·c + c·c (the ADC/assignment order;
    ||x||² is rank-constant and dropped on BOTH sides — matches
    operators/pq._assign_l2_udf's numpy formula)."""
    dot_xc = (f"list_sum([{vec_slice}[i] * {cv}[i] "
              f"for i in generate_series(1, {d_sub})])")
    dot_cc = (f"list_sum([{cv}[i] * {cv}[i] "
              f"for i in generate_series(1, {d_sub})])")
    return f"(-2 * {dot_xc} + {dot_cc})"


def _pq_train_ctes(m: int = 4, k: int = 16, n_iter: int = 2,
                   dim: int = 64) -> tuple[list[str], list[str], list[str]]:
    """CTE chain replaying the deterministic per-subspace PQ codebook
    training (operators/pq.pq_train) in SQL — the SAME id-seeded
    Lloyd recipe as _ivf_train_ctes (integer-exact 2^50-scaled means,
    HUGEINT sums, integer HALF_UP to 6 decimals) but with argmin-L2
    assignment over d/m-dim subvector slices, independently per
    subspace. Returns (ctes, final-codebook CTE names per subspace,
    final-assignment CTE names per subspace — ``p{s}enc`` holding
    (vec_id, code) for every vector)."""
    from rsyslog_nginx_clickhouse_spark.operators.similarity import (
        EMB_SCALE,
    )

    d_sub = dim // m
    ctes: list[str] = []
    finals: list[str] = []
    encs: list[str] = []
    for s in range(m):
        lo, hi = s * d_sub + 1, (s + 1) * d_sub
        sl = f"((e.embedding[{lo}:{hi}])::DOUBLE[])"
        ctes.append(f"""p{s}c0 AS (
      SELECT code, cv FROM (
        SELECT (e.embedding[{lo}:{hi}])::DOUBLE[] AS cv,
               row_number() OVER (ORDER BY vec_id) - 1 AS code
        FROM embeddings e ORDER BY vec_id LIMIT {k}))""")
        prev = f"p{s}c0"
        for i in range(1, n_iter + 1):
            ctes.append(f"""p{s}a{i} AS (
      SELECT vec_id, sub, code FROM (
        SELECT e.vec_id, {sl} AS sub, c.code,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_pq_l2key_sql(sl, 'c.cv', d_sub)}
                                        ASC, c.code ASC) AS rn
        FROM embeddings e CROSS JOIN {prev} c) WHERE rn = 1)""")
            ctes.append(f"""p{s}s{i} AS (
      SELECT a.code, g.g AS dim,
             sum(CAST(a.sub[g.g] * {EMB_SCALE} AS BIGINT)) AS sm,
             count(*)::HUGEINT * {EMB_SCALE} AS den
      FROM p{s}a{i} a, unnest(generate_series(1, {d_sub})) AS g(g)
      GROUP BY a.code, g.g)""")
            ctes.append(f"""p{s}m{i} AS (
      SELECT code, dim,
             ((2000000 * (sm + 4 * den) + den) // (2 * den)
              - 4000000) / 1000000.0 AS cm
      FROM p{s}s{i})""")
            ctes.append(f"""p{s}c{i} AS (
      SELECT p.code,
             CASE WHEN count(m.cm) = 0 THEN p.cv
                  ELSE list(m.cm ORDER BY m.dim) END AS cv
      FROM {prev} p LEFT JOIN p{s}m{i} m USING (code)
      GROUP BY p.code, p.cv)""")
            prev = f"p{s}c{i}"
        finals.append(prev)
        ctes.append(f"""p{s}enc AS (
      SELECT vec_id, code FROM (
        SELECT e.vec_id, c.code,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_pq_l2key_sql(sl, 'c.cv', d_sub)}
                                        ASC, c.code ASC) AS rn
        FROM embeddings e CROSS JOIN {prev} c) WHERE rn = 1)""")
        encs.append(f"p{s}enc")
    return ctes, finals, encs


def _pq_encode_oracle(m: int = 4, k: int = 16, n_iter: int = 2,
                      dim: int = 64) -> str:
    ctes, _, encs = _pq_train_ctes(m, k, n_iter, dim)
    union = "\n      UNION ALL ".join(
        f"SELECT vec_id, {s}::int AS subspace, code::int AS code "
        f"FROM {encs[s]}" for s in range(m))
    return ("WITH " + ",\n    ".join(ctes) + f"""
    SELECT vec_id, subspace, code FROM (
      {union})
    ORDER BY vec_id, subspace""")


def _pq_adc_oracle(m: int = 4, k: int = 16, n_iter: int = 2,
                   dim: int = 64, q_vec_id: int = 1,
                   k_out: int = 10) -> str:
    """knn_pq_adc oracle: training replay + per-subspace LUT
    (||q_s − c||², an in-index-order list_sum fold — the identical op
    sequence as operators/pq.adc_lut's Python loop) + the
    FIXED-left-associated m-term distance + tie6 ranking."""
    d_sub = dim // m
    ctes, finals, encs = _pq_train_ctes(m, k, n_iter, dim)
    ctes.append("q AS (SELECT embedding AS qv FROM embeddings "
                f"WHERE vec_id = {q_vec_id})")
    for s in range(m):
        lo = s * d_sub + 1
        diff = f"(q.qv[{lo} + i - 1]::DOUBLE - c.cv[i])"
        ctes.append(f"""lut{s} AS (
      SELECT c.code,
             list_sum([{diff} * {diff}
                       for i in generate_series(1, {d_sub})]) AS d2
      FROM {finals[s]} c, q)""")
    dist = "l0.d2"
    for s in range(1, m):
        dist = f"({dist} + l{s}.d2)"
    joins = " ".join(
        f"JOIN {encs[s]} e{s} USING (vec_id)" for s in range(1, m))
    lut_joins = " ".join(
        f"JOIN lut{s} l{s} ON l{s}.code = e{s}.code" for s in range(m))
    return ("WITH " + ",\n    ".join(ctes) + f"""
    SELECT e0.vec_id,
           floor(({dist}) * 1000000 + 0.5) / 1000000 AS adc_dist
    FROM {encs[0]} e0 {joins} {lut_joins}
    ORDER BY adc_dist ASC, e0.vec_id ASC LIMIT {k_out}""")


def _pq_index_dir(sf_dir: str) -> str:
    """Per-sf_dir home for the persisted PQ index (codebooks + code
    table), beside the IVF index; overridable for read-only checkouts.
    """
    base = os.environ.get(
        "SPARK_GRAFT_PQ_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "spark-warehouse", "pq"))
    return os.path.join(base, os.path.basename(os.path.normpath(sf_dir)))


def _pq_ensure(spark: SparkSession, sf_dir: str) -> str:
    """Build the persisted PQ index iff absent/stale (build-once/
    scan-many, the ivf_build amortization); returns the index dir."""
    from rsyslog_nginx_clickhouse_spark.operators.pq import (
        pq_build,
        pq_index_fresh,
    )

    src = os.path.join(sf_dir, "embeddings.parquet")
    idx = _pq_index_dir(sf_dir)
    if not pq_index_fresh(idx, src):
        pq_build(spark, load(spark, sf_dir, "embeddings"), idx,
                 embeddings_src=src)
    return idx


@query(
    "pq_encode",
    # codebooks are DERIVED FROM THE DATA by m independent id-seeded
    # Lloyd trainings (integer-exact means), so the oracle replays all
    # of them in SQL and re-derives every vector's argmin-L2 code
    oracle=_pq_encode_oracle(),
    doc="product quantization build (Jégou et al. 2011 — the "
        "compression half of IVF-PQ, what FAISS runs at 100 TB): "
        "4 subspaces × 16 dims, 16-entry codebook each, trained with "
        "the SAME deterministic integer-exact Lloyd recipe as "
        "ivf_build but argmin-L2 per subvector slice; vectors encode "
        "to 4 codes (~64× compression) persisted beside the "
        "codebooks (fingerprinted, build-once like the IVF index); "
        "returns the code table read back from disk — oracle replays "
        "all 4 trainings + assignments (operators/pq.py)",
)
def pq_encode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.pq import (
        read_codes_wide,
    )

    idx = _pq_ensure(spark, sf_dir)
    return (read_codes_wide(spark, idx)
            .select("vec_id",
                    F.posexplode("codes").alias("subspace", "code"))
            .orderBy("vec_id", "subspace"))


@query(
    "knn_pq_adc",
    oracle=_pq_adc_oracle(),
    doc="asymmetric-distance (ADC) top-10 over the persisted PQ code "
        "table: the query's 4×16 lookup table of "
        "||q_s − centroid||² distances is computed once "
        "(parameter-sized) and inlined as literal arrays; each "
        "database vector's approximate distance is 4 lookups + 3 "
        "additions over its CODES — the scan never touches raw "
        "floats, which is the whole point at 100 TB (compressed-"
        "domain search; compose with the IVF index's partition "
        "pruning for textbook IVF-PQ). Ranking key is the tie6-"
        "rounded distance + id; the m-term sum is a FIXED "
        "left-associated expression in both engines, and the oracle "
        "re-derives codebooks, codes, and LUT from scratch in SQL",
)
def knn_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from rsyslog_nginx_clickhouse_spark.operators.pq import (
        adc_topk,
        load_codebooks,
        read_codes_wide,
    )

    idx = _pq_ensure(spark, sf_dir)
    row = (load(spark, sf_dir, "embeddings")
           .where(F.col("vec_id") == 1).select("embedding").first())
    qv = np.asarray(row[0], dtype=np.float64)
    return adc_topk(read_codes_wide(spark, idx),
                    load_codebooks(spark, idx), qv, k_out=10)


def _ivf_join_oracle(n_iter: int = 2, n_lists: int = 16,
                     dim: int = 64, every: int = 50, nprobe: int = 4,
                     k: int = 10) -> str:
    """knn_join_ivf oracle: shared training replay (_ivf_train_ctes),
    final assignment, per-query nprobe probe selection (cos DESC,
    list_id ASC — matching stable argsort), equi-join on list_id
    (each vector lives in exactly one list, so pairs are unique), and
    per-query top-k on the ROUNDED cosine (ties → lowest cid)."""
    ctes, prev = _ivf_train_ctes(n_iter, n_lists, dim)
    ctes.append(f"""asgf AS (
      SELECT vec_id, embedding, list_id FROM (
        SELECT e.vec_id, e.embedding, c.list_id,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_cos_sql('e.embedding', 'c.cv')}
                                        DESC, c.list_id ASC) AS rn
        FROM embeddings e CROSS JOIN {prev} c) WHERE rn = 1)""")
    ctes.append(f"""qs AS (
      SELECT vec_id AS qid, embedding AS qv FROM embeddings
      WHERE vec_id % {every} = 1)""")
    ctes.append(f"""probes AS (
      SELECT qid, qv, list_id FROM (
        SELECT q.qid, q.qv, c.list_id,
               row_number() OVER (PARTITION BY q.qid
                                  ORDER BY {_cos_sql('c.cv', 'q.qv')}
                                        DESC, c.list_id ASC) AS rn
        FROM qs q CROSS JOIN {prev} c) WHERE rn <= {nprobe})""")
    ctes.append(f"""sims AS (
      SELECT p.qid, a.vec_id AS cid,
             floor(({_cos_sql('a.embedding', 'p.qv')})
                   * 1000000 + 0.5) / 1000000 AS cos_sim
      FROM probes p JOIN asgf a USING (list_id))""")
    return ("WITH " + ",\n    ".join(ctes) + f"""
    SELECT qid, cid, cos_sim FROM (
      SELECT qid, cid, cos_sim,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos_sim DESC, cid ASC) AS rn
      FROM sims) WHERE rn <= {k}""")


@query(
    "knn_join_ivf",
    oracle=_ivf_join_oracle(),
    doc="batch kNN JOIN over the persisted IVF index (every 50th "
        "vector as a query): Arrow-matmul probe assignment against "
        "the parameter-sized centroid table, cogroup join on list_id "
        "with per-list GEMM scoring — |Q|·nprobe·(n/n_lists) work in "
        "bounded groups, never all-pairs, the retrieval shape that "
        "amortizes at 100 TB; oracle replays training, assignment, "
        "probe selection, and ranking entirely in SQL",
)
def knn_join_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.similarity import (
        knn_join_ivf,
    )

    idx = _ivf_ensure_index(spark, sf_dir)
    qs = (load(spark, sf_dir, "embeddings")
          .where(F.col("vec_id") % 50 == 1))
    return knn_join_ivf(spark, qs, idx)


#: corpus-scaled list count, the SQL twin of
#: operators/similarity.semdedup_n_lists (VERDICT r7 item 2): IEEE
#: sqrt is correctly rounded, so ceil(sqrt(n)) agrees with Python's
#: math.ceil(math.sqrt(n)) for any n < 2^52.
_SEMDEDUP_NLISTS_SQL = ("(SELECT greatest(16, CAST(ceil(sqrt(count(*)))"
                        " AS INT)) FROM embeddings)")


def _semdedup_oracle(n_iter: int = 2,
                     n_lists: int | str = _SEMDEDUP_NLISTS_SQL,
                     dim: int = 64, threshold: float = 0.35) -> str:
    """semantic_dedup oracle: shared training replay (_ivf_train_ctes,
    with the corpus-scaled n_lists evaluated by the seed CTE's LIMIT
    subquery — the same max(16, ceil(sqrt(n))) the Spark side computes
    before building), final assignment, then a within-list self-join
    restricted to strictly-lower-id partners; a vector is dropped iff
    its best (rounded cos DESC, id ASC) lower-id witness clears the
    threshold — the threshold cut and witness ranking both decided on
    the tie6-rounded cosine, exactly as the numpy side does."""
    ctes, prev = _ivf_train_ctes(n_iter, n_lists, dim)
    ctes.append(f"""asgf AS (
      SELECT vec_id, embedding, list_id FROM (
        SELECT e.vec_id, e.embedding, c.list_id,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_cos_sql('e.embedding', 'c.cv')}
                                        DESC, c.list_id ASC) AS rn
        FROM embeddings e CROSS JOIN {prev} c) WHERE rn = 1)""")
    ctes.append(f"""pairs AS (
      SELECT a.vec_id AS vid, a.list_id, b.vec_id AS kid,
             floor(({_cos_sql('a.embedding', 'b.embedding')})
                   * 1000000 + 0.5) / 1000000 AS c
      FROM asgf a JOIN asgf b
        ON a.list_id = b.list_id AND b.vec_id < a.vec_id)""")
    return ("WITH " + ",\n    ".join(ctes) + f"""
    SELECT vid AS vec_id, list_id::INT AS list_id, kid AS kept_id,
           c AS cos_sim
    FROM (
      SELECT vid, list_id, kid, c,
             row_number() OVER (PARTITION BY vid
                                ORDER BY c DESC, kid ASC) AS rn
      FROM pairs) WHERE rn = 1 AND c >= {threshold}
    ORDER BY vec_id""")


def _semdedup_ensure_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (iff absent/stale) the semantic-dedup IVF index at
    ``<ivf dir>_sem`` with the CORPUS-SCALED list count
    max(16, ceil(sqrt(n))) — its own directory because the shared
    nprobe index (_ivf_ensure_index) pins n_lists=16 into the
    knn_ivf/ivf_build oracle replays, while semantic dedup needs
    n_lists to grow with the corpus to keep the per-list GEMM bounded
    (VERDICT r7 item 2). The row count is parquet-metadata-cheap and
    feeds the fingerprint, so a corpus size change rebuilds."""
    from rsyslog_nginx_clickhouse_spark.operators.similarity import (
        ivf_build,
        ivf_index_fresh,
        semdedup_n_lists,
    )

    src = os.path.join(sf_dir, "embeddings.parquet")
    emb = load(spark, sf_dir, "embeddings")
    n_lists = semdedup_n_lists(emb.count())
    idx = _ivf_index_dir(sf_dir) + "_sem"
    if not ivf_index_fresh(idx, src, n_lists=n_lists):
        ivf_build(spark, emb, idx, n_lists=n_lists, embeddings_src=src)
    return idx


@query(
    "semantic_dedup",
    oracle=_semdedup_oracle(),
    doc="SemDeDup-style semantic dedup over a persisted IVF index "
        "built with the corpus-scaled list count max(16, ceil(√n)) "
        "(cluster first so pairwise work is bounded per list — "
        "O(n²/n_lists); √n keeps training O(n·n_lists) and the GEMM "
        "O(n²/n_lists) both at O(n^1.5), never all-pairs): drops "
        "every vector with a lower-id same-list neighbor at rounded "
        "cosine >= 0.35, reporting the max-similarity witness; "
        "surviving set provably holds no within-list pair over the "
        "threshold; oracle replays training (same √n list count via "
        "a LIMIT subquery), assignment, and the within-list witness "
        "ranking entirely in SQL (operators/similarity.semantic_dedup)",
)
def semantic_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.similarity import (
        semantic_dedup,
    )

    idx = _semdedup_ensure_index(spark, sf_dir)
    return semantic_dedup(spark, idx, threshold=0.35).orderBy("vec_id")


@query(
    "knn_label_accuracy",
    # queries = every 10th vector; candidates via the SAME banded LSH
    # as the Spark side (32 plane literals inlined, 8 bands × 4);
    # rank by (round-6 cosine DESC, cid); majority vote ties → min
    # label; queries whose buckets hold no other row drop out of both
    # engines identically.
    oracle=f"""
    WITH planes(p, pv) AS (VALUES {_planes_values(32)}),
    s AS ({_SIG_CTE}),
    bands AS (
      SELECT vec_id, b AS band, substr(sig, b*4 + 1, 4) AS key
      FROM s, unnest(generate_series(0, 7)) AS t(b)),
    cand AS (
      SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
      FROM bands q JOIN bands c USING (band, key)
      WHERE q.vec_id % 10 = 0 AND q.vec_id != c.vec_id),
    sims AS (
      SELECT qid, cid,
             floor(({_cos_sql('eq.embedding', 'ec.embedding')})
                   * 1000000 + 0.5) / 1000000 AS c
      FROM cand JOIN embeddings eq ON eq.vec_id = qid
                JOIN embeddings ec ON ec.vec_id = cid),
    topk AS (
      SELECT qid, cid FROM (
        SELECT qid, cid,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY c DESC, cid) AS rn
        FROM sims) WHERE rn <= 5),
    votes AS (
      SELECT t.qid, e.label, count(*) AS n
      FROM topk t JOIN embeddings e ON e.vec_id = t.cid
      GROUP BY t.qid, e.label),
    pred AS (
      SELECT qid, label AS pred_label FROM (
        SELECT qid, label,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY n DESC, label) AS rn
        FROM votes) WHERE rn = 1)
    SELECT e.label AS label, count(*) AS n_queries,
           CAST(sum(CASE WHEN p.pred_label = e.label
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           floor((sum(CASE WHEN p.pred_label = e.label
                           THEN 1 ELSE 0 END)::double / count(*))
                 * 1000000 + 0.5) / 1000000 AS accuracy
    FROM pred p JOIN embeddings e ON e.vec_id = p.qid
    GROUP BY e.label ORDER BY label
    """,
    doc="retrieval evaluation — 5-NN majority-vote label prediction "
        "accuracy per true label, the standard embedding-quality "
        "check a pipeline runs before trusting ANN dedup/search. "
        "Built on the knn_join operator (banded-LSH multi-query ANN: "
        "shuffle carries vectors×bands, per-bucket GEMM, per-query "
        "top-k window — no cross product, no driver collect); "
        "exercises the so-far-unused `label` column",
)
def knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.similarity import (
        knn_join,
    )

    emb = load(spark, sf_dir, "embeddings")
    nn = knn_join(emb, F.col("vec_id") % 10 == 0, k=5, dim=64)
    labels = emb.select("vec_id", "label")
    votes = (nn.join(labels.withColumnRenamed("vec_id", "cid"), "cid")
               .groupBy("qid", "label").agg(F.count("*").alias("n")))
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("n"), F.asc("label"))
    pred = (votes.withColumn("rn", F.row_number().over(w))
                 .where(F.col("rn") == 1)
                 .select("qid", F.col("label").alias("pred_label")))
    truth = labels.withColumnRenamed("vec_id", "qid")
    hit = F.when(F.col("pred_label") == F.col("label"), 1).otherwise(0)
    return (pred.join(truth, "qid")
                .groupBy("label")
                .agg(F.count("*").alias("n_queries"),
                     F.sum(hit).cast("bigint").alias("n_correct"),
                     # tie_round: correct/total is an exact int ratio
                     tie_round(F.sum(hit).cast("double") / F.count("*"),
                               6).alias("accuracy"))
                .orderBy("label"))


@query(
    "hard_negative_mining",
    # the oracle replays the SAME banded LSH (plane literals, 8x4),
    # keeps only DIFFERENT-label candidates, ranks by (tie6 cosine
    # DESC, cid) and takes 3 per query — identical to the operator's
    # filtered in-bucket truncation + global window (filter-before-
    # truncate, so negatives beyond a bucket's unfiltered top-k are
    # never lost)
    oracle=f"""
    WITH planes(p, pv) AS (VALUES {_planes_values(32)}),
    s AS ({_SIG_CTE}),
    bands AS (
      SELECT vec_id, b AS band, substr(sig, b*4 + 1, 4) AS key
      FROM s, unnest(generate_series(0, 7)) AS t(b)),
    cand AS (
      SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
      FROM bands q JOIN bands c USING (band, key)
      JOIN embeddings eq ON eq.vec_id = q.vec_id
      JOIN embeddings ec ON ec.vec_id = c.vec_id
      WHERE q.vec_id % 10 = 0 AND q.vec_id != c.vec_id
        AND eq.label != ec.label),
    sims AS (
      -- coalesce 0: a zero (padding) vector's cosine is 0.0 by the
      -- knn_join contract (x/0 is NULL here but the operator's
      -- guarded unit rows yield 0 — NaN/NULL must not outrank real
      -- neighbors in the DESC window)
      SELECT qid, cid, ec.label AS neg_label,
             floor((coalesce({_cos_sql('eq.embedding', 'ec.embedding')},
                             0.0)) * 1000000 + 0.5) / 1000000 AS cos_sim
      FROM cand JOIN embeddings eq ON eq.vec_id = qid
                JOIN embeddings ec ON ec.vec_id = cid)
    SELECT qid, cid, neg_label, cos_sim FROM (
      SELECT qid, cid, neg_label, cos_sim,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos_sim DESC, cid) AS rn
      FROM sims) WHERE rn <= 3
    ORDER BY qid, cos_sim DESC, cid
    """,
    doc="hard-negative mining for contrastive training — for each "
        "query vector (every 10th), the 3 most-similar vectors with "
        "a DIFFERENT label: the near-miss examples a contrastive or "
        "reranker objective learns most from (far more informative "
        "than random in-batch negatives). Built on knn_join's "
        "exclude_same path: the label filter applies INSIDE each "
        "LSH-bucket GEMM before top-k truncation — filtering a plain "
        "kNN afterwards would silently drop negatives ranked below "
        "same-class neighbors; shuffle carries vectors×bands rows, "
        "per-bucket GEMM, per-query window, no cross product "
        "(operators/similarity.knn_join)",
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.similarity import (
        knn_join,
    )

    emb = load(spark, sf_dir, "embeddings")
    nn = knn_join(emb, F.col("vec_id") % 10 == 0, k=3, dim=64,
                  exclude_same="label")
    neg = emb.select(F.col("vec_id").alias("cid"),
                     F.col("label").alias("neg_label"))
    return (nn.join(neg, "cid")
              .select("qid", "cid", "neg_label", "cos_sim")
              .orderBy("qid", F.desc("cos_sim"), "cid"))


@query(
    "multimodal_frames",
    oracle="""
    WITH f AS (
      SELECT doc_id, text,
             (length(text) + 15) // 16 AS n_frames
      FROM documents)
    SELECT doc_id, i::int AS frame_idx,
           md5(substr(text, i * 16 + 1, 16)) AS frame_hash
    FROM f, unnest(generate_series(0, n_frames - 1)) AS t(i)
    WHERE i % 4 = 0
    """,
    doc="video-style frame sampling over binary payloads: 16-byte "
        "frames, stride 4, md5 standing in for the codec; mapInPandas "
        "streams Arrow batches (payload is the utf-8 text, all-ASCII, "
        "so the oracle can chunk with substr)",
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.multimodal import frame_sample

    return frame_sample(attach_binary(load(spark, sf_dir, "documents")))


@query(
    "top_bigrams",
    oracle="""
    WITH normed AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                          ' ') AS toks
      FROM documents),
    bg AS (
      SELECT doc_id,
             unnest(list_distinct(CASE WHEN len(toks) >= 2
               THEN [array_to_string(toks[i:i+1], ' ')
                     for i in generate_series(1, len(toks) - 1)]
               ELSE [array_to_string(toks, ' ')] END)) AS bigram
      FROM normed)
    SELECT bigram, count(*) AS doc_freq
    FROM bg GROUP BY bigram
    ORDER BY doc_freq DESC, bigram LIMIT 20
    """,
    doc="corpus bigram DOCUMENT frequency (the boilerplate-detection "
        "signal): Arrow-vectorized 2-shingles → explode → count → "
        "top-20 via TakeOrdered; shuffle carries (bigram, partial "
        "count), bounded by vocabulary not corpus size. balance=False: "
        "the bigram groupBy re-keys immediately, so the doc-balancing "
        "spread shuffle is pure overhead here (isolated sf0.1: "
        "2.06→0.95 s; native-expression bigrams probed 6.9 s — the "
        "Arrow UDF stays)",
)
def top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.dedup import doc_shingles
    from rsyslog_nginx_clickhouse_spark.operators.topk import topk

    sh = doc_shingles(load(spark, sf_dir, "documents"), n=2,
                      balance=False)
    counts = (sh.select(F.explode("shingles").alias("bigram"))
                .groupBy("bigram").agg(F.count("*").alias("doc_freq")))
    return topk(counts, 20, F.desc("doc_freq"), F.col("bigram"))


_PAIRS_SQL = """
    , ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM ex a JOIN ex b USING (s) WHERE a.doc_id < b.doc_id),
    pairs AS (
      SELECT id_a, id_b
      FROM cand
      JOIN sh sa ON sa.doc_id = id_a
      JOIN sh sb ON sb.doc_id = id_b
      WHERE floor((len(list_intersect(sa.shingles, sb.shingles))::double
                   / greatest(len(list_distinct(sa.shingles || sb.shingles)), 1))
                  * 1000000 + 0.5) / 1000000 >= 0.5)
"""


@query(
    "dedup_components",
    oracle=_SHINGLES_CTE.replace("WITH", "WITH RECURSIVE", 1) + _PAIRS_SQL + """
    , edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs),
    reach(id, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id)
    SELECT id AS doc_id, min(label) AS component
    FROM reach GROUP BY id
    """,
    doc="dedup keep-policy: connected components over near-dup pairs "
        "(min-label propagation, O(diameter) rounds, one shuffle each; "
        "keep doc_id == component). Oracle is the recursive-CTE "
        "transitive closure over the identical pair set",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.dedup import (
        connected_components,
    )

    pairs = ngram_jaccard_pairs(load(spark, sf_dir, "documents"),
                                threshold=0.5)
    return connected_components(pairs)


@query(
    "dedup_keep_best",
    oracle=_SHINGLES_CTE.replace("WITH", "WITH RECURSIVE", 1) + _PAIRS_SQL + """
    , edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs),
    reach(id, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
    comps AS (SELECT id AS doc_id, min(label) AS component
              FROM reach GROUP BY id),
    jc AS (
      SELECT c.component, c.doc_id, d.n_chars
      FROM comps c JOIN documents d USING (doc_id)),
    best AS (
      SELECT component, doc_id AS kept_doc,
             row_number() OVER (PARTITION BY component
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM jc)
    SELECT j.component, count(*) AS n_members,
           min(b.kept_doc) AS kept_doc, max(j.n_chars) AS kept_chars
    FROM jc j
    JOIN (SELECT component, kept_doc FROM best WHERE rn = 1) b
      USING (component)
    GROUP BY j.component ORDER BY j.component
    """,
    doc="dedup keep-policy, quality variant: within each near-dup "
        "component keep the LONGEST member (n_chars, ties → min "
        "doc_id) instead of dedup_components' min-id — the policy "
        "curation pipelines actually want (the canonical copy is "
        "usually the most complete one). One max_by aggregate over the "
        "(component ⋈ docs) join — no window sort; the struct "
        "(n_chars, -doc_id) makes the argmax total and deterministic. "
        "Scale: components are near-dup clusters (bounded size), the "
        "agg is one partial-agg shuffle on component",
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.dedup import (
        connected_components,
    )

    docs = load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    comp = connected_components(pairs)
    jc = comp.join(docs.select("doc_id", "n_chars"), "doc_id")
    return (jc.groupBy("component")
              .agg(F.count("*").alias("n_members"),
                   F.expr("max_by(doc_id, named_struct("
                          "'c', n_chars, 'd', -doc_id))")
                    .alias("kept_doc"),
                   F.max("n_chars").alias("kept_chars"))
              .orderBy("component"))


@query(
    "corpus_selection",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
    m AS (
      SELECT doc_id, text,
             len(toks) AS n_tok,
             (length(text) - length(regexp_replace(text, {_PUNCT_SQL}, '', 'g')))::double
               / greatest(length(text), 1) AS pr,
             len(list_filter(toks, x -> list_contains({_STOPWORDS_SQL}, x)))::double
               / greatest(len(toks), 1) AS sw,
             list_sum(list_transform(toks, x -> length(x)))::double
               / greatest(len(toks), 1) AS mlen,
             len(list_filter(toks, x -> list_contains(['the','and','of','to','is'], x))) AS en_hits
      FROM t),
    scored AS (
      SELECT doc_id, text, en_hits,
             least(n_tok / 20.0, 1.0) * 0.4
             + (1.0 - least(pr * 5, 1.0)) * 0.2
             + (CASE WHEN sw >= 0.05 AND sw <= 0.6 THEN 1.0 ELSE 0.3 END) * 0.2
             + (CASE WHEN mlen >= 2.5 AND mlen <= 12.0 THEN 1.0 ELSE 0.3 END) * 0.2
               AS q
      FROM m),
    keepers AS (
      SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
               AS fingerprint,
             min(doc_id) AS doc_id
      FROM documents GROUP BY fingerprint)
    SELECT s.doc_id, floor(s.q * 1000000 + 0.5) / 1000000 AS quality
    FROM scored s JOIN keepers k ON s.doc_id = k.doc_id
    WHERE floor(s.q * 1000000 + 0.5) / 1000000 >= 0.5 AND s.en_hits > 0
    ORDER BY s.doc_id
    """,
    doc="the LLM training-data selection pipeline END-TO-END: exact-"
        "dedup winners ∩ quality >= 0.5 ∩ detected-English — the "
        "composition every individual operator exists to serve; one "
        "scan computes all text signals, the dedup keep-set semi-joins "
        "in (broadcast at this scale, hash-partitioned at 100 TB)",
)
def corpus_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.functions.text import lang_score

    docs = _docs(spark, sf_dir)
    scored = docs.select(
        "doc_id",
        # tie_round: see quality_scores (same formula, same hazard)
        tie_round(quality_score("text"), 6).alias("quality"),
        lang_score("text", "en").alias("en_hits"),
    )
    keepers = exact_dedup_groups(docs).select(
        F.col("keep_id").alias("doc_id"))
    return (scored.join(keepers, "doc_id", "left_semi")
                  .where((F.col("quality") >= 0.5) & (F.col("en_hits") > 0))
                  .select("doc_id", "quality")
                  .orderBy("doc_id"))


_ACTIVITY_VEC_CTE = """
    WITH d AS (
      SELECT user_id,
             date_diff('day', DATE '2024-01-01', cast(ts AS date)) AS di,
             count(*) AS c
      FROM events
      WHERE cast(ts AS date) >= DATE '2024-01-01'
        AND date_diff('day', DATE '2024-01-01', cast(ts AS date)) < 30
      GROUP BY user_id, di),
    grid AS (
      SELECT u.user_id, g.i AS di
      FROM (SELECT DISTINCT user_id FROM d) u, generate_series(0, 29) AS g(i)),
    vec AS (
      SELECT g.user_id, list(coalesce(d.c, 0) ORDER BY g.di) AS v
      FROM grid g LEFT JOIN d ON d.user_id = g.user_id AND d.di = g.di
      GROUP BY g.user_id)
"""


@query(
    "similar_activity_users",
    oracle=_ACTIVITY_VEC_CTE + f"""
    SELECT a.user_id,
           floor(({_DOT.format(a='a.v', b='q.v')} /
                 (sqrt({_DOT.format(a='a.v', b='a.v')})
                  * sqrt({_DOT.format(a='q.v', b='q.v')})))
                 * 1000000 + 0.5) / 1000000 AS cos_sim
    FROM vec a, (SELECT v FROM vec WHERE user_id = 1) q
    WHERE a.user_id != 1
    ORDER BY cos_sim DESC, a.user_id LIMIT 10
    """,
    doc="time-series similarity search: each user's 30-day activity "
        "curve as a dense count vector (operators/timeseries."
        "activity_vectors), cosine top-10 most-similar to user 1 — "
        "integer counts make the dot products exact, so the oracle "
        "matches bit-for-bit; at scale the curve vectors feed the same "
        "LSH/IVF paths as text embeddings",
)
def similar_activity_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.timeseries import (
        activity_vectors,
    )
    from rsyslog_nginx_clickhouse_spark.operators.topk import topk

    ev = load(spark, sf_dir, "events")
    # localCheckpoint, not cache (GC-released, no CacheManager pin)
    vecs = activity_vectors(ev, "user_id", "ts", "2024-01-01", 30) \
        .transform(barrier)
    # query curve is a parameter: tiny driver fetch, inlined as literals
    # (a crossJoin against the 1-row curve would plan BroadcastNestedLoop)
    qv = vecs.where(F.col("user_id") == 1).select("vec").first()[0]
    qcol = F.array(*[F.lit(int(x)) for x in qv])
    sims = vecs.where(F.col("user_id") != 1).select(
        "user_id",
        tie_round(cosine(F.col("vec"), qcol), 6).alias("cos_sim"))
    return topk(sims, 10, F.desc("cos_sim"), F.col("user_id"))


@query(
    "train_test_split",
    oracle="""
    SELECT CASE WHEN ('0x' || substr(md5('split:' || doc_id), 1, 8))::BIGINT
                     % 100 < 90
                THEN 'train' ELSE 'test' END AS split,
           count(*) AS n_docs,
           cast(sum(length(text)) AS bigint) AS n_chars
    FROM documents GROUP BY split ORDER BY split
    """,
    doc="deterministic 90/10 corpus split: md5-bucket per doc id — "
        "stable across runs, cluster sizes, and engines (randomSplit is "
        "partitioning-dependent); selection is a sargable predicate, no "
        "shuffle beyond the report aggregation",
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.dedup import split_bucket

    docs = load(spark, sf_dir, "documents")
    split = F.when(split_bucket("doc_id") < 90, "train").otherwise("test")
    return (docs.groupBy(split.alias("split"))
                .agg(F.count("*").alias("n_docs"),
                     F.sum(F.length("text")).cast("long").alias("n_chars"))
                .orderBy("split"))


def _label_centroids_oracle() -> str:
    from rsyslog_nginx_clickhouse_spark.operators.similarity import (
        EMB_SCALE,
    )

    # the identical integer-exact tie-rounded mean the Spark side
    # computes (operators/similarity.label_centroids_exact — the
    # _lloyd_update_exact formula): BIGINT-exact scaled components,
    # HUGEINT order-independent sums, truncating integer division
    return f"""
    WITH s AS (
      SELECT label::int AS label, (g.g - 1)::int AS pos,
             sum(CAST(embedding[g.g]::DOUBLE * {EMB_SCALE} AS BIGINT))
               AS sm,
             count(*)::HUGEINT * {EMB_SCALE} AS den,
             count(*)::bigint AS n_vecs
      FROM embeddings, unnest(generate_series(1, 64)) AS g(g)
      GROUP BY label, pos)
    SELECT label, pos, n_vecs,
           ((2000000 * (sm + 4 * den) + den) // (2 * den)
            - 4000000) / 1000000.0 AS c
    FROM s ORDER BY label, pos
    """


@query(
    "label_centroids",
    oracle=_label_centroids_oracle(),
    doc="per-label embedding centroids (mean pooling / avgArray "
        "analog — the class-prototype aggregate retrieval and "
        "few-shot pipelines precompute): element-wise mean per label "
        "via the SAME integer-exact tie-rounded arithmetic as the "
        "Lloyd update (components scaled 2^50 to exact ints, "
        "decimal(38,0) sums — order-independent, so bit-identical on "
        "any partitioning), one posexplode + partial-agg shuffle of "
        "|labels|*dim groups, driver materialization parameter-sized "
        "(operators/similarity.label_centroids_exact)",
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.similarity import (
        label_centroids_exact,
    )

    emb = load(spark, sf_dir, "embeddings").select("label", "embedding")
    return label_centroids_exact(emb).orderBy("label", "pos")


def _bpe_oracle() -> str:
    from rsyslog_nginx_clickhouse_spark.operators.bpe import bpe_oracle_sql

    return bpe_oracle_sql(n_merges=8)


@query(
    "bpe_train_merges",
    oracle=_bpe_oracle(),
    doc="distributed BPE tokenizer training (Sennrich et al. 2016) — "
        "the train-the-tokenizer step of a pretraining pipeline: the "
        "corpus collapses to a word-frequency table in ONE "
        "data-sized aggregate, then 8 merge iterations run on that "
        "vocab-sized table (pair counts = one partial-agg shuffle "
        "per merge; argmax pair = a 1-row driver fetch, the Lloyd "
        "precedent; the merge itself is a single replace over a "
        "two-space-delimited symbol encoding that is EXACTLY the "
        "canonical greedy BPE merge). The oracle replays the entire "
        "training — every pair count, tie-broken argmax, and merge — "
        "from the raw corpus in a CTE chain, deriving the same 8 "
        "merges (operators/bpe.py)",
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.bpe import bpe_train

    return bpe_train(load(spark, sf_dir, "documents"), n_merges=8)


def _bpe_tokenize_oracle() -> str:
    from rsyslog_nginx_clickhouse_spark.operators.bpe import (
        bpe_tokenize_oracle_sql,
    )

    return bpe_tokenize_oracle_sql(n_merges=8)


@query(
    "bpe_tokenize_docs",
    oracle=_bpe_tokenize_oracle(),
    doc="apply the trained BPE tokenizer: per-document word / char / "
        "subword counts after the 8 trained merges. The final "
        "training state already IS every vocab word's tokenization, "
        "so apply = one join of the exploded corpus against the "
        "vocab-sized state — the production shape (tokenize by vocab "
        "lookup, never re-running merges per document). The oracle "
        "extends the same replayed training chain with the identical "
        "join — all-integer output, no rounding tier involved "
        "(operators/bpe.py)",
)
def bpe_tokenize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.bpe import (
        bpe_tokenize_counts,
    )

    return bpe_tokenize_counts(load(spark, sf_dir, "documents"),
                               n_merges=8)


#: the BM25 pipeline shared by bm25_top_docs and hybrid_retrieval —
#: ONE definition on each side (a drifting copy would silently
#: desynchronize the lexical scores between the two queries).
_BM25_TERMS = ("spark", "window", "hash")

_BM25_CTES = """
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents),
    lens AS (
      SELECT doc_id,
             len(string_split(text, ' '))::BIGINT AS dl
      FROM documents),
    stats AS (
      SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS sum_len
      FROM lens),
    tf AS (
      SELECT doc_id, tok, count(*)::BIGINT AS tf FROM toks
      WHERE tok IN ('spark', 'window', 'hash')
      GROUP BY doc_id, tok),
    dfreq AS (
      SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY tok),
    bm25 AS (
      SELECT t.doc_id,
             round(sum(
               ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
               * (t.tf * 2.2)
               / (t.tf + 1.2 * (0.25 + 0.75
                                * (l.dl * s.n / s.sum_len)))
             ), 6) AS score
      FROM tf t
      JOIN dfreq d USING (tok)
      JOIN lens l USING (doc_id)
      CROSS JOIN stats s
      GROUP BY t.doc_id)"""


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score) — BM25 (k1=1.2, b=0.75) for _BM25_TERMS, the
    Spark twin of the _BM25_CTES oracle text, op-order mirrored."""
    terms = _BM25_TERMS
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.split("text", " ").alias("toks"))
    lens = toks.select("doc_id", F.size("toks").cast("long").alias("dl"),
                       "toks")
    n, sum_len = lens.agg(
        F.count("*"), F.sum("dl")).collect()[0]  # parameter-sized
    terms_sql = ", ".join(f"'{t}'" for t in terms)
    tf = (lens.select(
              "doc_id",
              F.explode(F.expr(
                  f"filter(toks, t -> t IN ({terms_sql}))"))
               .alias("tok"))
              .groupBy("doc_id", "tok")
              .agg(F.count("*").alias("tf")))
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    scored = (tf.join(F.broadcast(dfreq), "tok")
                .join(lens.select("doc_id", "dl"), "doc_id"))
    idf = F.log(F.lit(1.0) + (F.lit(n) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    term_score = (idf * (F.col("tf") * F.lit(2.2))
                  / (F.col("tf") + F.lit(1.2)
                     * (F.lit(0.25) + F.lit(0.75)
                        * (F.col("dl") * F.lit(n) / F.lit(sum_len)))))
    return (scored.groupBy("doc_id")
                  .agg(F.round(F.sum(term_score), 6).alias("score")))


@query(
    "bm25_top_docs",
    # op-order mirror: n/sum_len are the same integers both sides
    # (Spark inlines the collected stats, the oracle computes them),
    # and every divide/multiply is written in the same order, so the
    # only cross-engine wiggle is ln()'s last ulp — absorbed by
    # round 6 (idf is a log -> irrational, never ON a tie; the
    # top-20 cutoff orders by the ROUNDED score with doc_id
    # tiebreak, so a last-ulp difference cannot flip the boundary)
    oracle=f"""
    WITH {_BM25_CTES}
    SELECT doc_id, score FROM bm25
    ORDER BY score DESC, doc_id LIMIT 20
    """,
    doc="BM25 retrieval (Robertson/Sparck-Jones probabilistic "
        "ranking, k1=1.2 b=0.75 — the lexical-retrieval baseline "
        "every RAG/contrastive pipeline pairs with dense kNN): "
        "corpus stats (N, total length) are ONE parameter-sized "
        "aggregate inlined as literals; per-doc term frequencies "
        "keep only the query terms via an array filter BEFORE the "
        "explode (the shuffle carries matched tokens only, never the "
        "corpus token stream); df is a 3-row broadcast. At 100 TB "
        "the shape is scan + one matched-token shuffle + one "
        "doc-sized join — no global token index needed for a fixed "
        "query; the per-query cost is independent of vocabulary",
)
def bm25_top_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (_bm25_scored(spark, sf_dir)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(20))


@query(
    "hybrid_retrieval",
    # the dense stage reranks by the tie6-rounded cosine (the shared
    # rounding contract of the whole ANN family), bm25 rounded at 6
    # breaks cosine ties, doc_id breaks the rest — every cutoff is
    # taken on rounded keys, so engine ulps cannot flip it
    oracle=f"""
    WITH {_BM25_CTES},
    cand AS (
      SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rn
      FROM bm25),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1),
    rer AS (
      SELECT c.doc_id, c.score, {_cos_sql('e.embedding', 'qv')} AS cs
      FROM cand c JOIN embeddings e ON e.vec_id = c.doc_id, q
      WHERE c.rn <= 50)
    SELECT doc_id, score AS bm25,
           floor((cs) * 1000000 + 0.5) / 1000000 AS cos_sim
    FROM rer
    ORDER BY floor((cs) * 1000000 + 0.5) / 1000000 DESC, score DESC,
             doc_id
    LIMIT 10
    """,
    doc="hybrid retrieval — the standard RAG serving pattern: BM25 "
        "lexical recall (top-50 candidates, TakeOrderedAndProject — "
        "no global sort) then dense rerank by cosine to the query "
        "embedding (a parameter-sized driver fetch inlined as a "
        "literal, exactly the knn_bruteforce contract). The dense "
        "stage touches ONLY the candidate set: a 50-row broadcast "
        "join against the embedding table, never a corpus-wide "
        "scan — at 100 TB the per-query cost is the lexical pass "
        "plus 50 cosines, which is why lexical-recall/dense-rerank "
        "is the shape production retrieval stacks use",
)
def hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.similarity import tie6

    cand = (_bm25_scored(spark, sf_dir)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(50))
    qv = _query_vector(spark, sf_dir, 1)
    emb = load(spark, sf_dir, "embeddings")
    rer = (F.broadcast(cand)
           .join(emb, cand.doc_id == emb.vec_id)
           .select(F.col("doc_id"), F.col("score").alias("bm25"),
                   tie6(cosine(F.col("embedding"), qv))
                   .alias("cos_sim")))
    return (rer.orderBy(F.desc("cos_sim"), F.desc("bm25"),
                        F.asc("doc_id"))
               .limit(10))


@query(
    "upsample_epochs",
    # generate_series yields BIGINT; the Spark sequence is cast to
    # match
    oracle="""
    SELECT doc_id, source,
           unnest(generate_series(
             1, 1 + CAST(source[4:] AS INT) % 3)) AS epoch
    FROM documents
    """,
    doc="epoch upsampling (the mT5/Llama data-mixture mechanism: "
        "high-weight sources repeat for k epochs, low-weight for 1): "
        "per-source epoch counts derive deterministically from the "
        "source id, and the replication is a narrow "
        "explode(sequence(1, k)) — each copy carries (doc_id, epoch), "
        "never duplicated text (the gather against the corpus happens "
        "at read time, like packed_sequences); at 100 TB the "
        "materialized plan is O(docs x mean_epochs) 16-byte rows, and "
        "the explode is partition-local — zero shuffle",
)
def upsample_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    epochs = (F.lit(1)
              + F.substring("source", 4, 10).cast("int") % 3)
    return docs.select(
        "doc_id", "source",
        F.explode(F.sequence(F.lit(1).cast("long"),
                             epochs.cast("long"))).alias("epoch"))


@query(
    "curriculum_schedule",
    # integer-only output: ranks and shards, no float hazard
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id)
               AS pos_in_source,
             CAST(source[4:] AS INT) AS src_num
      FROM documents)
    SELECT doc_id, source, pos_in_source,
           row_number() OVER (ORDER BY pos_in_source * 100000
                              + src_num) AS global_pos,
           (row_number() OVER (ORDER BY pos_in_source * 100000
                               + src_num) - 1) % 8 AS shard
    FROM ranked ORDER BY global_pos
    """,
    doc="curriculum schedule (easy-to-hard ordering interleaved "
        "round-robin across sources, so every shard sees the same "
        "difficulty ramp — Bengio et al. curriculum learning applied "
        "to corpus sharding): difficulty rank is a PER-SOURCE window "
        "(partitioned — parallel), and the GLOBAL order position "
        "comes from operators/prefix.distributed_cumsum, the "
        "two-phase range-partitioned prefix scan — never a "
        "single-partition global window (the classic Spark scale "
        "trap); shard = (pos-1) % n_shards gives every shard an "
        "interleaved, difficulty-balanced slice",
)
def curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from rsyslog_nginx_clickhouse_spark.operators.prefix import (
        distributed_cumsum,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = docs.select(
        "doc_id", "source",
        F.row_number().over(w).cast("long").alias("pos_in_source"),
        F.substring("source", 4, 10).cast("int").alias("src_num"))
    # the composite key is collision-free only while pos < 100000 and
    # src_num < 100000; a collision would silently de-determinize the
    # prefix scan (distributed_cumsum requires a total order), so the
    # bound is ASSERTED per row — codegen-cheap, loud at 100 TB
    # instead of wrong
    guard = F.assert_true(
        (F.col("pos_in_source") < 100000) & (F.col("src_num") < 100000),
        F.lit("curriculum_schedule: ord_key stride overflow — raise "
              "the multiplier for this corpus"))
    keyed = ranked.withColumn(
        "ord_key",
        F.when(guard.isNull(),
               F.col("pos_in_source") * 100000 + F.col("src_num"))) \
        .withColumn("one", F.lit(1).cast("long"))
    out = distributed_cumsum(keyed, "ord_key", "one",
                             out_col="global_pos")
    return (out.select("doc_id", "source", "pos_in_source",
                       "global_pos",
                       ((F.col("global_pos") - 1) % 8).alias("shard"))
               .orderBy("global_pos"))


@query(
    "shuffle_shard_plan",
    # md5 hex is identical in both engines; the lpad'ed doc_id suffix
    # makes the order key globally UNIQUE (distributed_cumsum needs a
    # total order) with lexicographic == numeric tiebreak
    oracle="""
    WITH keyed AS (
      SELECT doc_id,
             md5('42-' || CAST(doc_id AS VARCHAR))
               || lpad(CAST(doc_id AS VARCHAR), 12, '0') AS ord
      FROM documents)
    SELECT doc_id,
           row_number() OVER (ORDER BY ord) AS global_pos,
           (row_number() OVER (ORDER BY ord) - 1) % 16 AS shard
    FROM keyed ORDER BY global_pos
    """,
    doc="seeded global shuffle + sharding (the reproducible "
        "training-order shuffle every pretraining run does before "
        "writing shards): order key = md5(seed, doc_id) — "
        "deterministic, reshuffles completely under a new seed — and "
        "the global position comes from "
        "operators/prefix.distributed_cumsum (two-phase "
        "range-partitioned prefix scan), NEVER a single-partition "
        "global sort; shard = (pos-1) % n gives equal-sized shards "
        "with the shuffled order interleaved across them — "
        "complements curriculum_schedule (difficulty order) with the "
        "uniform-random order, same scale-safe machinery",
)
def shuffle_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.prefix import (
        distributed_cumsum,
    )

    keyed = (_docs(spark, sf_dir)
             .select("doc_id",
                     F.concat(
                         F.md5(F.concat(F.lit("42-"),
                                        F.col("doc_id").cast("string"))),
                         F.lpad(F.col("doc_id").cast("string"), 12, "0"))
                     .alias("ord"))
             .withColumn("one", F.lit(1).cast("long")))
    out = distributed_cumsum(keyed, "ord", "one", out_col="global_pos")
    return (out.select("doc_id", "global_pos",
                       ((F.col("global_pos") - 1) % 16).alias("shard"))
               .orderBy("global_pos"))


@query(
    "exact_substring_dedup",
    # the oracle replays the identical algorithm over the GLOBAL
    # suffix order (corpus-small at gate scale): lag() adjacency on
    # ORDER BY (suf, doc_id, pos), list-wise LCP (this DuckDB's
    # list_position returns 0 for not-found — the all-equal pair must
    # map to the full compared length, not -1), cross-doc pairs with
    # lcp >= 5 credit both sides. Global adjacency == the engine's
    # per-bucket adjacency for every pair that can reach the
    # threshold: suffixes sharing a >= 5-token prefix are contiguous
    # in the global order and land in the same leading-gram bucket
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents),
    occ AS (
      SELECT doc_id, i - 1 AS pos, toks[i:i+19] AS suf
      FROM t, unnest(generate_series(1, len(toks) - 4)) AS u(i)
      WHERE len(toks) >= 5),
    adj AS (
      SELECT doc_id, pos, suf, lag(doc_id) OVER w AS pdoc,
             lag(pos) OVER w AS ppos, lag(suf) OVER w AS psuf
      FROM occ WINDOW w AS (ORDER BY suf, doc_id, pos)),
    lc AS (
      SELECT doc_id, pos, pdoc, ppos,
             CASE WHEN coalesce(list_position(list_transform(
                     generate_series(1, least(len(suf), len(psuf))),
                     j -> suf[j] = psuf[j]), false), 0) = 0
                  THEN least(len(suf), len(psuf))
                  ELSE list_position(list_transform(
                     generate_series(1, least(len(suf), len(psuf))),
                     j -> suf[j] = psuf[j]), false) - 1 END AS lcp
      FROM adj WHERE pdoc IS NOT NULL),
    cr AS (
      SELECT doc_id, pos, lcp FROM lc
      WHERE pdoc != doc_id AND lcp >= 5
      UNION ALL
      SELECT pdoc AS doc_id, ppos AS pos, lcp FROM lc
      WHERE pdoc != doc_id AND lcp >= 5)
    SELECT d.doc_id,
           coalesce(max(lcp), 0)::int AS longest_dup,
           coalesce(count(DISTINCT pos), 0)::bigint AS n_dup_starts
    FROM documents d LEFT JOIN cr ON d.doc_id = cr.doc_id
    GROUP BY d.doc_id ORDER BY d.doc_id
    """,
    doc="EXACT cross-document substring matching — the distributed "
        "suffix-array analog of ExactSubstr dedup [Lee et al. 2021] "
        "(round 14, VERDICT r13 item 5; repeated_span_removal is the "
        "k-shingle REMOVER, this is the exact match-length MEASURER "
        "run-merged shingles overestimate): per document, the exact "
        "longest >= 5-token substring (capped at 20) also present in "
        "another document, plus the duplicated-start count. Suffixes "
        "bucket by their leading 5-gram hash (pairs reaching the "
        "threshold provably share it), sort WITHIN buckets, and an "
        "adjacent-pair token-LCP scan credits both sides — the "
        "max-LCP-at-adjacent-cross-doc-pair suffix-array theorem "
        "makes the scan exact with ONE shuffle and no all-pairs "
        "join; per-bucket state is bounded by the hottest gram "
        "(operators/dedup.exact_substring_matches). At 100 TB the "
        "shuffle carries O(tokens x cap) — the documented "
        "ExactSubstr cost — and skew salting falls out of the gram "
        "hash key",
)
def exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.dedup import (
        exact_substring_matches,
    )

    return (exact_substring_matches(_docs(spark, sf_dir),
                                    min_len=5, cap=20)
            .orderBy("doc_id"))


@query(
    "edit_distance_neardup",
    # the oracle is the BRUTE-FORCE ground truth — length-filtered
    # all-pairs levenshtein (DuckDB's builtin) — not a replay of the
    # banding, so a PassJoin candidate miss fails the value gate
    # instead of silently shrinking the result. Distances are exact
    # integers; no rounding anywhere
    oracle="""
    WITH d AS (SELECT doc_id, text, length(text) AS m
               FROM documents WHERE text IS NOT NULL),
    pr AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             levenshtein(a.text, b.text) AS ed
      FROM d a JOIN d b
        ON a.doc_id < b.doc_id AND abs(a.m - b.m) <= 8)
    SELECT doc_a, doc_b, ed::bigint AS dist
    FROM pr WHERE ed <= 8 ORDER BY doc_a, doc_b
    """,
    doc="character-level edit-distance near-dup pairs (round 14): "
        "all unordered document pairs within 8 edits, via the "
        "PassJoin partition scheme [Li, Deng, Feng 2011] — k+1 "
        "slices per doc, pigeonhole guarantees one slice of a "
        "<= k-edit partner survives verbatim (same slice index, "
        "position shift <= k), so candidates come from an equi-join "
        "of slices against shift-enumerated substrings and only "
        "candidates pay the quadratic levenshtein (Spark's builtin "
        "threshold form). The oracle is the brute-force all-pairs "
        "scan, making the banding's losslessness part of the value "
        "gate. Scale: O(k^3) enumeration rows per doc, linear in "
        "the corpus; the join carries (slice index, content, id, "
        "length); no UDFs, no collect "
        "(operators/dedup.edit_distance_neardup)",
)
def edit_distance_neardup_q(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.dedup import (
        edit_distance_neardup,
    )

    return (edit_distance_neardup(_docs(spark, sf_dir), k=8)
            .orderBy("doc_a", "doc_b"))
