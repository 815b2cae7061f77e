"""Training-data curation pipeline queries: quality filtering, sampling,
domain mixing, and duplicated-n-gram measurement over ``documents``.

These are the corpus-curation steps a large-scale LLM data pipeline
runs between raw ingest and tokenization (the BASELINE.json north
star), complementing the dedup/similarity operators in ``llm.py``:

- gopher_quality_filter — Gopher-style (Rae et al. 2021, §A1.1)
  per-document heuristics: word count bounds, mean word length bounds,
  stopword-fraction floor. Pure Catalyst expressions, zero Python.
- duplicated_ngram_fraction — RefinedWeb-style (Penedo et al. 2023,
  §3.3) fraction of a document's n-gram occurrences that also appear
  in other documents; high values flag boilerplate/template text.
- stratified_sample — deterministic per-source md5-bucket sampling
  (the distributed substitute for rand()-based sampling, which is
  partitioning-dependent and irreproducible across cluster sizes).
- domain_mixture — per-source token accounting: the report that drives
  mixture-weight decisions (docs, tokens, corpus share).

Scale notes: every query is a scan + at most two shuffles; the only
row expansion is the n-gram explode (O(tokens) rows, the same order as
tokenization itself). No driver-side collection anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rsyslog_nginx_clickhouse_spark.plans.barrier import barrier

from rsyslog_nginx_clickhouse_spark.catalog import load
from rsyslog_nginx_clickhouse_spark.functions.rounding import tie_round
from rsyslog_nginx_clickhouse_spark.functions.text import normalized_text
from rsyslog_nginx_clickhouse_spark.operators.dedup import split_bucket
from rsyslog_nginx_clickhouse_spark.queries import query

#: Function-word list for the stopword-presence heuristic (Gopher uses
#: a similar small hand list). Membership, not linguistics — the point
#: is that machine-generated / keyword-stuffed text lacks them.
STOPWORDS = ("the", "a", "an", "of", "to", "and")

_SQL_STOPWORDS = ", ".join(f"'{w}'" for w in STOPWORDS)


def _toks(col: F.Column) -> F.Column:
    """Single-space word array over ``normalized_text`` — the SAME
    normalization the dedup/similarity shingles use (functions/text.py),
    so curation metrics and dedup keys never drift apart."""
    return F.split(normalized_text(col), " ")


@query(
    "gopher_quality_filter",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                         'g'), ' ') AS toks,
             length(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
               AS n_chars
      FROM documents)
    SELECT doc_id,
           len(toks) AS n_words,
           floor(((n_chars - len(toks) + 1.0) / len(toks))
                 * 10000 + 0.5) / 10000 AS mean_word_len,
           floor((len(list_filter(toks, w -> w IN ({_SQL_STOPWORDS})))
                  ::double / len(toks)) * 10000 + 0.5) / 10000
             AS stopword_frac,
           CASE WHEN len(toks) BETWEEN 50 AND 100000
                 AND (n_chars - len(toks) + 1.0) / len(toks)
                     BETWEEN 3.0 AND 10.0
                 AND len(list_filter(toks, w -> w IN ({_SQL_STOPWORDS})))
                     ::double / len(toks) > 0.01
                THEN 1 ELSE 0 END AS keep
    FROM t ORDER BY doc_id
    """,
    doc="Gopher-style quality heuristics (word count in [50, 100k], "
        "mean word length in [3, 10], stopword fraction > 1%) as one "
        "narrow projection — no shuffle at all until the driver's "
        "ORDER BY; at scale the keep flag feeds a filter, not a sort. "
        "mean_word_len is derived arithmetically from the NORMALIZED "
        "(whitespace-collapsed) char count, which is exact for "
        "single-space text by construction — no per-token length pass",
)
def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gopher_flags(load(spark, sf_dir, "documents")).orderBy("doc_id")


def gopher_flags(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document quality metrics + keep flag (see module docstring
    for thresholds). Pure projection — composable before any shuffle."""
    toks = _toks(F.col(text_col))
    nw = F.size(toks)
    mwl = (F.length(normalized_text(F.col(text_col))) - nw + 1.0) / nw
    sw = F.size(F.filter(
        toks, lambda w: w.isin(*STOPWORDS))).cast("double") / nw
    # coalesce: NULL text must yield keep=0 (as the oracle's CASE ELSE
    # does), not a NULL three-valued-logic result.
    keep = F.coalesce(
        (nw.between(50, 100000) & mwl.between(3.0, 10.0)
         & (sw > 0.01)).cast("int"), F.lit(0))
    return docs.select(
        id_col,
        nw.alias("n_words"),
        # tie_round, not round: these are exact int ratios which can
        # sit ON a rounding tie point (see functions/rounding.py)
        tie_round(mwl, 4).alias("mean_word_len"),
        tie_round(sw, 4).alias("stopword_frac"),
        keep.alias("keep"))


#: n for the duplicated-n-gram measure. 5 is the RefinedWeb dup-5gram
#: setting; short enough to fire on shared boilerplate, long enough
#: that chance collisions are rare.
DUP_NGRAM_N = 5


def ngram_occurrences(col: F.Column, n: int = DUP_NGRAM_N) -> F.Column:
    """ALL n-gram occurrences (duplicates kept — the distinct() is the
    minhash callers' job, not the helper's). Arrow-vectorized via the
    same UDF family the dedup shingles use (operators/dedup.shingle_udf
    — value-identical to the ``word_shingles`` expression, ~10× faster:
    the expression form runs as interpreted lambdas at ~0.8 ms/doc and
    dominated this query's runtime), so the n-gram convention —
    normalization, short-doc full-text fallback — has one definition
    across dedup and curation."""
    from rsyslog_nginx_clickhouse_spark.operators.dedup import shingle_udf

    return shingle_udf(n, distinct=False)(col)


@query(
    "duplicated_ngram_fraction",
    oracle=f"""
    WITH normed AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                         'g'), ' ') AS toks
      FROM documents),
    grams AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= {DUP_NGRAM_N}
               THEN [array_to_string(toks[i:i+{DUP_NGRAM_N - 1}], ' ')
                     for i in generate_series(1,
                                              len(toks) - {DUP_NGRAM_N - 1})]
               ELSE [array_to_string(toks, ' ')] END AS gs
      FROM normed),
    occ AS (SELECT doc_id, unnest(gs) AS g FROM grams),
    docfreq AS (SELECT g, count(DISTINCT doc_id) AS nd
                FROM occ GROUP BY g)
    SELECT occ.doc_id,
           floor((sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)::double
                  / count(*)) * 1000000 + 0.5) / 1000000 AS dup_frac
    FROM occ JOIN docfreq USING (g)
    GROUP BY occ.doc_id ORDER BY occ.doc_id
    """,
    doc="RefinedWeb-style duplicated-5-gram fraction per document: the "
        "share of a doc's 5-gram OCCURRENCES whose gram also appears "
        "in at least one other document. Plan: explode occurrences "
        "ONCE, partial-agg to per-(doc, gram) counts at the map side "
        "(the explode output never shuffles raw), count docfreq as an "
        "unordered window over the compact (doc, gram) rows, one agg "
        "by doc_id — the same shuffle structure as distributed "
        "tokenization, no quadratic step anywhere",
)
def duplicated_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dup_ngram_stats(load(spark, sf_dir, "documents")).orderBy(
        "doc_id")


@query(
    "span_dedup",
    # oracle replays the identical pipeline: md5-keyed occurrence
    # ranks (canonical = lowest (doc_id, start)), per-doc duplicated
    # start lists, token kept iff no duplicated span covers it
    # (0-based span start s covers 1-based token p iff
    # s BETWEEN p-8 AND p-1)
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    sh AS (
      SELECT doc_id, g.i AS start,
             md5(array_to_string(toks[g.i+1:g.i+8], ' ')) AS h
      FROM t, unnest(generate_series(0, len(toks)-8)) AS g(i)
      WHERE len(toks) >= 8),
    rk AS (SELECT doc_id, start,
                  row_number() OVER (PARTITION BY h
                                     ORDER BY doc_id, start) AS rn
           FROM sh),
    dups AS (SELECT doc_id, list(start ORDER BY start) AS ds
             FROM rk WHERE rn > 1 GROUP BY doc_id),
    kept AS (
      SELECT t.doc_id, toks,
             [toks[p] FOR p IN generate_series(1, len(toks))
              IF len(list_filter(coalesce(ds, []),
                                 s -> s BETWEEN p - 8 AND p - 1)) = 0]
               AS kt
      FROM t LEFT JOIN dups USING (doc_id))
    SELECT doc_id, coalesce(array_to_string(kt, ' '), '') AS clean_text,
           len(toks)::BIGINT AS n_tokens,
           (len(toks) - len(kt))::BIGINT AS n_removed
    FROM kept ORDER BY doc_id
    """,
    doc="C4-style repeated-span removal (Raffel et al. 2020: any "
        "duplicated multi-sentence span kept once, here k=8 tokens): "
        "every duplicated 8-token span is cut from all but its first "
        "(lowest doc_id, start) occurrence and the surviving tokens "
        "rejoin into clean_text. One md5-keyed occurrence-rank "
        "shuffle + one per-doc regroup, all array expressions, no "
        "UDF (operators/dedup.repeated_span_removal); ~9% of span "
        "occurrences in the corpus are duplicated, so the operator "
        "provably fires",
)
def span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.dedup import (
        repeated_span_removal,
    )

    from rsyslog_nginx_clickhouse_spark.plans.barrier import barrier

    out = repeated_span_removal(load(spark, sf_dir, "documents"), k=8)
    # materialization boundary before the global sort: the range
    # exchange's sampling pass re-executes its child, and the child
    # here is the per-doc kept-token rebuild. A plain repartition gets
    # OPTIMIZED AWAY directly under a global sort (verified in the
    # round-14 plan dump), so the barrier (eager localCheckpoint) is
    # the boundary that sticks — sampling then reads the checkpointed
    # rows instead of re-running the HOF chain
    return barrier(out).orderBy("doc_id")


def dup_ngram_stats(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    n: int = DUP_NGRAM_N) -> DataFrame:
    """Per-document duplicated-n-gram fraction (see module docstring).

    Single-pass formulation: the expensive explode feeds exactly one
    consumer — a (doc, gram) occurrence-count aggregate (map-side
    combine shrinks it before the shuffle). Document frequency is then
    ``count(*) over (partition by gram)`` on those already-distinct
    (doc, gram) rows: a second branch off the explode (which Spark
    would recompute — Catalyst shares no subplans across join inputs)
    is never needed. A per-gram hot spot (viral boilerplate) bounds the
    window partition by the gram's DOCUMENT frequency, not its
    occurrence count — the same bound the join-back formulation had on
    its shuffle key.
    """
    from rsyslog_nginx_clickhouse_spark.operators.dedup import spread

    occ = spread(docs, id_col).select(
        id_col, F.explode(ngram_occurrences(F.col(text_col), n)).alias("g"))
    per_doc_gram = occ.groupBy(id_col, "g").agg(F.count("*").alias("c"))
    nd = F.count("*").over(Window.partitionBy("g"))
    dup_c = F.when(nd > 1, F.col("c")).otherwise(F.lit(0))
    return (per_doc_gram
            .select(id_col, F.col("c"), dup_c.alias("dup_c"))
            .groupBy(id_col)
            .agg(tie_round(F.sum("dup_c").cast("double") / F.sum("c"), 6)
                 .alias("dup_frac")))


@query(
    "source_overlap",
    oracle="""
    WITH normed AS (
      SELECT source,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                         'g'), ' ') AS toks
      FROM documents),
    sh AS (
      SELECT source, list_distinct(CASE WHEN len(toks) >= 3
               THEN [array_to_string(toks[i:i+2], ' ')
                     for i in generate_series(1, len(toks) - 2)]
               ELSE [array_to_string(toks, ' ')] END) AS shingles
      FROM normed),
    ex AS (SELECT DISTINCT source, unnest(shingles) AS s FROM sh),
    sizes AS (SELECT source, count(*) AS n FROM ex GROUP BY source),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
      FROM ex a JOIN ex b USING (s)
      WHERE a.source < b.source
      GROUP BY 1, 2)
    SELECT src_a, src_b, n_shared,
           floor((n_shared::double / (sa.n + sb.n - n_shared))
                 * 1000000 + 0.5) / 1000000 AS jaccard
    FROM inter JOIN sizes sa ON sa.source = src_a
               JOIN sizes sb ON sb.source = src_b
    ORDER BY src_a, src_b
    """,
    doc="Cross-source contamination matrix: shingle-set Jaccard between "
        "every source pair — the report that catches one corpus slice "
        "republishing another (mirrors, scrapes of scrapes) before "
        "mixture weights are set. Collapses to DISTINCT (source, "
        "shingle), then aggregates each shingle's sorted source SET and "
        "expands pairs from the array (≤ |sources|²/2 per shingle, a "
        "few hundred at web scale — never document-bounded). Beats the "
        "s-keyed self-join ~2×: one groupBy exchange instead of two "
        "join-side exchanges carrying the same exploded rows; sizes "
        "join is a broadcast of |sources| rows",
)
def source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.dedup import doc_shingles

    docs = load(spark, sf_dir, "documents")
    # cached: feeds both the per-shingle source sets and the sizes agg
    # balance=False: the very next step re-keys to (source, s) via
    # distinct, so a doc_id-balancing shuffle upstream is pure overhead.
    # localCheckpoint, not cache: feeds both the per-shingle source
    # sets and the sizes agg; blocks GC-release instead of pinning
    # CacheManager for the session.
    ex = (doc_shingles(docs, n=3, extra_cols=("source",),
                       balance=False)
          .select("source", F.explode("shingles").alias("s"))
          .distinct()
          .transform(barrier))
    grp = (ex.groupBy("s")
             .agg(F.array_sort(F.collect_set("source")).alias("srcs")))
    # (x, i) → pair x with every later (= lexicographically greater)
    # element: exactly the a.source < b.source join predicate
    pairs = F.expr(
        "flatten(transform(srcs, (x, i) -> "
        "transform(slice(srcs, i + 2, size(srcs)), "
        "y -> struct(x AS src_a, y AS src_b))))")
    inter = (grp.select(F.explode(pairs).alias("p"))
                .groupBy(F.col("p.src_a").alias("src_a"),
                         F.col("p.src_b").alias("src_b"))
                .agg(F.count("*").alias("n_shared")))
    sizes = ex.groupBy("source").agg(F.count("*").alias("n"))
    sz_a = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    sz_b = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    return (inter.join(F.broadcast(sz_a), "src_a")
                 .join(F.broadcast(sz_b), "src_b")
                 .select("src_a", "src_b", "n_shared",
                         # tie_round: exact int ratio (rounding.py)
                         tie_round(F.col("n_shared").cast("double")
                                   / (F.col("na") + F.col("nb")
                                      - F.col("n_shared")), 6)
                         .alias("jaccard"))
                 .orderBy("src_a", "src_b"))


#: Per-source sampling percentages: the head sources are kept at 50%,
#: the tail at 20% — the shape of a real mixture-rebalancing pass.
_HEAD_SOURCES = ("src0", "src1", "src2", "src3", "src4")
_HEAD_PCT, _TAIL_PCT = 50, 20


@query(
    "stratified_sample",
    oracle=f"""
    SELECT doc_id, source
    FROM documents
    WHERE ('0x' || substr(md5('sample:' || doc_id), 1, 8))::BIGINT % 100
          < CASE WHEN source IN
                   ({", ".join(f"'{s}'" for s in _HEAD_SOURCES)})
                 THEN {_HEAD_PCT} ELSE {_TAIL_PCT} END
    ORDER BY doc_id
    """,
    doc="Stratified corpus sampling with per-source rates (50% head "
        "sources, 20% tail): an md5 bucket on doc_id compared against "
        "the stratum's rate. Deterministic across runs, cluster sizes, "
        "and engines — rand()-based sampling is none of those — and "
        "the selection is a plain predicate: no shuffle, fully "
        "pushdown-friendly, composable with any downstream operator",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pct = F.when(F.col("source").isin(*_HEAD_SOURCES),
                 F.lit(_HEAD_PCT)).otherwise(F.lit(_TAIL_PCT))
    return (docs.where(split_bucket("doc_id", salt="sample") < pct)
                .select("doc_id", "source")
                .orderBy("doc_id"))


@query(
    "domain_mixture",
    oracle="""
    WITH per AS (
      SELECT source, count(*) AS n_docs,
             -- cast: DuckDB sum(int) is HUGEINT vs Spark bigint —
             -- identical values, different dtype, hash mismatch
             CAST(sum(len(string_split(regexp_replace(lower(trim(text)),
                                                      '\\s+', ' ', 'g'),
                                       ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source)
    SELECT source, n_docs, n_tokens,
           floor((n_tokens::double / sum(n_tokens) OVER ())
                 * 1000000 + 0.5) / 1000000 AS token_share,
           floor((n_tokens::double / n_docs) * 100 + 0.5) / 100
             AS avg_doc_tokens
    FROM per ORDER BY source
    """,
    doc="Domain-mixture accounting: per-source doc and token counts "
        "plus each source's share of corpus tokens — the table mixture "
        "weights are tuned against. One partial-agg shuffle on source; "
        "the corpus total is a window over the |sources|-row aggregate "
        "(a single-partition pass over 20 rows, not a fact re-scan)",
)
def domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    per = (docs.groupBy("source")
               .agg(F.count("*").alias("n_docs"),
                    F.sum(F.size(_toks(F.col("text"))))
                     .alias("n_tokens")))
    total = Window.partitionBy()
    return (per.select(
                "source", "n_docs", "n_tokens",
                # tie_round: exact int ratios (tokens/total, tokens/
                # docs) can sit ON rounding tie points (rounding.py)
                tie_round(F.col("n_tokens").cast("double")
                          / F.sum("n_tokens").over(total), 6)
                .alias("token_share"),
                tie_round(F.col("n_tokens").cast("double")
                          / F.col("n_docs"), 2).alias("avg_doc_tokens"))
            .orderBy("source"))


@query(
    "mixture_rebalance_plan",
    oracle="""
    WITH per AS (
      SELECT source,
             CAST(sum(len(string_split(regexp_replace(lower(trim(text)),
                                                      '\\s+', ' ', 'g'),
                                       ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source),
    tot AS (
      SELECT source, n_tokens,
             sum(n_tokens) OVER ()::double
               / count(*) OVER () AS target_tokens
      FROM per)
    SELECT source, n_tokens,
           floor(least(1.0, target_tokens / n_tokens)
                 * 1000000 + 0.5) / 1000000 AS keep_rate,
           CAST(floor(floor(least(1.0, target_tokens / n_tokens)
                            * 1000000 + 0.5) / 1000000
                      * n_tokens) AS BIGINT) AS planned_tokens
    FROM tot ORDER BY source
    """,
    doc="Data-mixing step after domain_mixture: per-source keep-rates "
        "that move the corpus toward a UNIFORM token budget per source "
        "— rate = min(1, target/n_tokens), so over-represented heads "
        "are downsampled and tails kept whole (the downsample itself "
        "is split_bucket(doc_id) < rate, the stratified_sample "
        "machinery). Window over the |sources|-row aggregate, one "
        "partial-agg fact pass; planned_tokens floor'd in exact "
        "arithmetic on the rounded rate so both engines agree",
)
def mixture_rebalance_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    per = (docs.groupBy("source")
               .agg(F.sum(F.size(_toks(F.col("text"))))
                     .alias("n_tokens")))
    w = Window.partitionBy()
    target = (F.sum("n_tokens").over(w).cast("double")
              / F.count("*").over(w))
    # tie_round: target/n_tokens can be an exact short decimal
    # (rounding.py); the floor product below amplifies a tie flip
    rate = tie_round(F.least(F.lit(1.0), target / F.col("n_tokens")), 6)
    return (per.select(
                "source", "n_tokens",
                rate.alias("keep_rate"),
                F.floor(rate * F.col("n_tokens")).cast("bigint")
                 .alias("planned_tokens"))
            .orderBy("source"))


@query(
    "temperature_mixture",
    # alpha = 0.5: weights are sqrt-based (irrational for any
    # non-perfect-square count), so plain round(6) is tie-safe
    # (functions/rounding.py — same class as cosine/tfidf); counts
    # stay exact integers
    oracle="""
    WITH per AS (
      SELECT source,
             CAST(sum(len(string_split(regexp_replace(lower(trim(text)),
                                                      '\\s+', ' ', 'g'),
                                       ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source),
    w AS (
      SELECT source, n_tokens,
             sqrt(n_tokens::double) AS pw,
             sum(sqrt(n_tokens::double)) OVER () AS z,
             sum(n_tokens) OVER ()::double AS nt
      FROM per)
    SELECT source, n_tokens,
           round(pw / z, 6) AS temp_weight,
           round((pw / z) * nt / n_tokens, 6) AS boost
    FROM w ORDER BY source
    """,
    doc="temperature-based mixture weights (the mT5/multilingual "
        "sampling rule, alpha = 0.5: p_s ∝ n_s^alpha) — the smooth "
        "sibling of mixture_rebalance_plan's uniform-budget cap: "
        "head sources are damped toward, not clamped to, the mean, "
        "and tail sources are UP-weighted (boost > 1 — the column "
        "says how far each source's sampling rate moves from its "
        "natural share; realize it with weighted split_bucket "
        "sampling or epoch repetition for boosts > 1). Plan: one "
        "partial-agg token count per source + a window over the "
        "|sources|-row aggregate — the fact table is scanned once, "
        "nothing data-sized moves",
)
def temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    per = (docs.groupBy("source")
               .agg(F.sum(F.size(_toks(F.col("text"))))
                     .cast("bigint").alias("n_tokens")))
    w = Window.partitionBy()
    pw = F.sqrt(F.col("n_tokens").cast("double"))
    z = F.sum(pw).over(w)
    nt = F.sum("n_tokens").over(w).cast("double")
    return (per.select(
                "source", "n_tokens",
                F.round(pw / z, 6).alias("temp_weight"),
                F.round((pw / z) * nt / F.col("n_tokens"), 6)
                 .alias("boost"))
            .orderBy("source"))


def _curation_oracle() -> str:
    # compose the published oracle pieces: shingles + exact-Jaccard
    # pairs (llm.py) + the recursive-CTE components (dedup_components
    # oracle) + gopher thresholds + the lang-ID argmax — one
    # normalization (normed.toks) throughout. lang first-wins ties:
    # detected 'en' ⟺ en > 0 AND en >= max(de, fr, es).
    from rsyslog_nginx_clickhouse_spark.queries.llm import (
        _PAIRS_SQL,
        _SHINGLES_CTE,
    )

    def hits(markers: str) -> str:
        return (f"len(list_filter(toks, x -> list_contains({markers}, x)))")

    en = hits("['the','and','of','to','is']")
    de = hits("['der','die','und','ist','nicht']")
    fr = hits("['le','la','les','est','une']")
    es = hits("['el','los','que','es','una']")
    return (_SHINGLES_CTE.replace("WITH", "WITH RECURSIVE", 1)
            + _PAIRS_SQL + f"""
    , edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs),
    reach(id, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
    comps AS (
      SELECT id AS doc_id, min(label) AS component
      FROM reach GROUP BY id),
    flags AS (
      SELECT doc_id,
             CASE WHEN len(toks) BETWEEN 50 AND 100000
                   AND (length(array_to_string(toks, ' ')) - len(toks)
                        + 1.0) / len(toks) BETWEEN 3.0 AND 10.0
                   AND len(list_filter(toks,
                           w -> w IN ({_SQL_STOPWORDS})))::double
                       / len(toks) > 0.01
                  THEN 1 ELSE 0 END AS q_keep,
             CASE WHEN {en} > 0 AND {en} >= greatest({de}, {fr}, {es})
                  THEN 1 ELSE 0 END AS lang_keep
      FROM normed)
    SELECT f.doc_id, f.q_keep, f.lang_keep,
           CASE WHEN c.component IS NULL OR c.component = f.doc_id
                THEN 1 ELSE 0 END AS dup_keep,
           CASE WHEN f.q_keep = 1 AND f.lang_keep = 1
                 AND (c.component IS NULL OR c.component = f.doc_id)
                THEN 1 ELSE 0 END AS keep
    FROM flags f LEFT JOIN comps c USING (doc_id)
    ORDER BY f.doc_id
    """)


@query(
    "curation_pipeline",
    oracle=_curation_oracle(),
    doc="the END-TO-END curation decision table: Gopher quality \u2227 "
        "English lang-ID \u2227 near-dup keep-policy (connected-component "
        "representative) as per-document flags plus the final keep bit "
        "\u2014 the composition a training-data pipeline actually ships, "
        "with every stage's flag auditable. Quality/lang are one "
        "projection over the scan; the dedup tier reuses the shingle "
        "pass; the keep-policy join is a left join against the (tiny, "
        "pairs-only) components table",
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.functions.text import lang_id
    from rsyslog_nginx_clickhouse_spark.operators.dedup import (
        connected_components,
        ngram_jaccard_pairs,
        spread,
    )

    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    comps = connected_components(
        ngram_jaccard_pairs(docs, threshold=0.5))
    losers = comps.where(F.col("component") != F.col("doc_id")) \
                  .select("doc_id", F.lit(0).alias("dup_flag"))
    toks = _toks(F.col("text"))
    nw = F.size(toks)
    mwl = (F.length(normalized_text(F.col("text"))) - nw + 1.0) / nw
    sw = F.size(F.filter(
        toks, lambda w: w.isin(*STOPWORDS))).cast("double") / nw
    q_keep = F.coalesce(
        (nw.between(50, 100000) & mwl.between(3.0, 10.0)
         & (sw > 0.01)).cast("int"), F.lit(0))
    flags = docs.select(
        "doc_id", q_keep.alias("q_keep"),
        (lang_id("text") == "en").cast("int").alias("lang_keep"))
    out = (flags.join(losers, "doc_id", "left")
                .select("doc_id", "q_keep", "lang_keep",
                        F.coalesce("dup_flag", F.lit(1))
                         .alias("dup_keep")))
    keep = ((F.col("q_keep") == 1) & (F.col("lang_keep") == 1)
            & (F.col("dup_keep") == 1)).cast("int")
    from rsyslog_nginx_clickhouse_spark.plans.barrier import barrier

    # materialization boundary before the global sort: without it the
    # range exchange's sampling pass re-ran the lang-ID + quality
    # expression chain a second time (the flags projection sits
    # directly above the spread shuffle). A plain repartition gets
    # optimized away directly under a global sort, so the barrier
    # (eager localCheckpoint of five ints per document) is used
    return barrier(out.withColumn("keep", keep)).orderBy("doc_id")


#: Tokens per output shard for the shard-planning query. Sized so the
#: sf0.01 corpus yields a handful of shards; a real pipeline passes
#: ~100M-1B (tokens per training file).
SHARD_TARGET_TOKENS = 5_000


@query(
    "token_shard_plan",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             len(string_split(regexp_replace(lower(trim(text)), '\\s+',
                                             ' ', 'g'), ' ')) AS n_tokens
      FROM documents)
    SELECT doc_id, n_tokens,
           CAST(sum(n_tokens) OVER (ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_tokens,
           CAST(floor((sum(n_tokens) OVER (ORDER BY doc_id
                                           ROWS UNBOUNDED PRECEDING)
                       - n_tokens)::double / {SHARD_TARGET_TOKENS}) AS INT)
             AS shard
    FROM t ORDER BY doc_id
    """,
    doc="Tokenizer shard planning: assign documents (in doc_id order) "
        "to ~fixed-token output shards via a running token total — the "
        "step that decides training-file boundaries. The running total "
        "is a DISTRIBUTED two-phase prefix sum (operators/prefix.py): "
        "range-partition on doc_id, per-range partials, driver prefix "
        "over the per-partition totals (parameter-sized: one row per "
        "partition), per-range window + offset. A bare global-order "
        "window — what the oracle SQL writes — collapses Spark to one "
        "partition and is exactly what this operator exists to avoid",
)
def token_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.prefix import (
        distributed_cumsum,
        shard_assignment,
    )

    t = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(_toks(F.col("text"))).cast("long")
                   .alias("n_tokens"))
    c = distributed_cumsum(t, "doc_id", "n_tokens", out_col="cum_tokens")
    return (c.select("doc_id", "n_tokens", "cum_tokens",
                     shard_assignment(F.col("cum_tokens"),
                                      F.col("n_tokens"),
                                      SHARD_TARGET_TOKENS).alias("shard"))
             .orderBy("doc_id"))


@query(
    "pii_redaction",
    # DuckDB regexp_replace needs the 'g' flag (Spark's replaces all by
    # default); patterns are the Java∩RE2 subset from functions/text.py
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             AS n_emails,
           len(regexp_extract_all(text,
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
           len(regexp_extract_all(text, '\+\d{7,15}\b')) AS n_phones,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '[EMAIL]', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
               '\+\d{7,15}\b', '[PHONE]', 'g')) AS redacted_md5
    FROM documents ORDER BY doc_id
    """,
    doc="PII scrub accounting: per-document email/IP/phone match counts "
        "plus the md5 of the redacted text (proves the replacement "
        "byte-identical against the oracle, not just the counts). Pure "
        "projection — composable before any shuffle; patterns confined "
        "to the Java∩RE2 regex subset so both engines match identical "
        "spans. The scrub step every pre-training pipeline runs before "
        "tokenization",
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.functions.text import (
        pii_counts,
        redact_pii,
    )
    from rsyslog_nginx_clickhouse_spark.operators.dedup import spread

    # six regex passes per row: worth spreading the single-file scan
    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    counts = pii_counts(F.col("text"))
    return (docs.select(
                "doc_id",
                counts["email"].alias("n_emails"),
                counts["ipv4"].alias("n_ips"),
                counts["phone"].alias("n_phones"),
                F.md5(redact_pii(F.col("text"))).alias("redacted_md5"))
            .orderBy("doc_id"))


@query(
    "repetition_stats",
    # top token per doc: max count, ties broken by lexicographically
    # smallest token — deterministic on both engines
    oracle="""
    WITH t AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                         'g'), ' ') AS toks
      FROM documents),
    tc AS (
      SELECT doc_id, unnest(toks) AS tok FROM t),
    cnt AS (
      SELECT doc_id, tok, count(*) AS c
      FROM tc GROUP BY doc_id, tok),
    ranked AS (
      SELECT doc_id, tok, c,
             sum(c) OVER (PARTITION BY doc_id) AS n_tok,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY c DESC, tok ASC) AS rn
      FROM cnt)
    SELECT doc_id, tok AS top_token, c AS top_count,
           CAST(n_tok AS BIGINT) AS n_tokens,
           floor((c::double / n_tok) * 1000000 + 0.5) / 1000000
             AS top_share
    FROM ranked WHERE rn = 1 ORDER BY doc_id
    """,
    doc="Gopher-style repetition signal: each document's most frequent "
        "token and its share of the token stream (high share flags "
        "keyword stuffing / TABLE boilerplate the dup-n-gram measure "
        "misses inside a single doc). One explode partial-aggregated to "
        "(doc, token, count); top-1 and the token total both come from "
        "windows over those compact rows — the explode output never "
        "shuffles raw and never runs twice",
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.dedup import spread

    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    cnt = (docs.select("doc_id", F.explode(_toks(F.col("text"))).alias("tok"))
               .groupBy("doc_id", "tok").agg(F.count("*").alias("c")))
    wd = Window.partitionBy("doc_id")
    ranked = cnt.select(
        "doc_id", "tok", "c",
        F.sum("c").over(wd).alias("n_tok"),
        F.row_number().over(wd.orderBy(F.desc("c"), F.asc("tok")))
         .alias("rn"))
    return (ranked.where(F.col("rn") == 1)
                  .select("doc_id",
                          F.col("tok").alias("top_token"),
                          F.col("c").alias("top_count"),
                          F.col("n_tok").cast("long").alias("n_tokens"),
                          # tie_round: exact int ratio (rounding.py)
                          tie_round(F.col("c").cast("double")
                                    / F.col("n_tok"), 6)
                          .alias("top_share"))
                  .orderBy("doc_id"))


#: sequence packing: 8 independent shards, 800-char bins (~2-3 docs
#: per bin at the corpus's 298-char mean — real multi-doc packing
#: with real overflow churn at every SF)
_PACK_SHARDS = 8
_PACK_CAPACITY = 800


@query(
    "sequence_packing_plan",
    # the oracle replays the IDENTICAL next-fit recurrence as a
    # recursive CTE over each shard's id-ordered doc sequence (the
    # dedup_components precedent for iterative operators): state =
    # (bin_id, fill), transition = overflow check — all integers, so
    # the value gate covers every assignment exactly
    oracle=f"""
    WITH RECURSIVE s AS (
      SELECT (doc_id % {_PACK_SHARDS})::int AS shard, doc_id,
             n_chars::bigint AS size,
             row_number() OVER (PARTITION BY doc_id % {_PACK_SHARDS}
                                ORDER BY doc_id) AS rn
      FROM documents),
    r AS (
      SELECT shard, rn, doc_id, size,
             0::bigint AS bin_id, 0::bigint AS bin_offset, size AS fill
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.shard, s.rn, s.doc_id, s.size,
             CASE WHEN r.fill + s.size > {_PACK_CAPACITY}
                  THEN r.bin_id + 1 ELSE r.bin_id END,
             CASE WHEN r.fill + s.size > {_PACK_CAPACITY}
                  THEN 0 ELSE r.fill END,
             CASE WHEN r.fill + s.size > {_PACK_CAPACITY}
                  THEN s.size ELSE r.fill + s.size END
      FROM r JOIN s ON s.shard = r.shard AND s.rn = r.rn + 1)
    SELECT shard, doc_id, size, bin_id, bin_offset
    FROM r ORDER BY shard, doc_id
    """,
    doc="greedy sequence packing (operators/packing.py) — the "
        "example-packing step between chunking and tokenization: "
        "docs pack into 800-char bins, next-fit in doc_id order "
        "within 8 independent shards (one shuffle on the shard key, "
        "then a linear O(1)-state pandas pass per shard; shards ~= "
        "cores at 100 TB and the pass carries only (id, size), never "
        "text). Next-fit over first-fit-decreasing is the determinism "
        "trade: assignment depends only on the data, so the oracle "
        "replays it exactly as a recursive CTE",
)
def sequence_packing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.packing import greedy_pack

    d = (load(spark, sf_dir, "documents")
         .select((F.col("doc_id") % _PACK_SHARDS).cast("int")
                 .alias("shard"),
                 "doc_id", F.col("n_chars").alias("size")))
    return (greedy_pack(d, _PACK_CAPACITY)
            .orderBy("shard", "doc_id"))


@query(
    "packed_sequences",
    # same recursive-CTE replay as sequence_packing_plan, then the
    # gather: per (shard, bin) concatenate texts in doc order with a
    # '\x1e' record separator (the packing contract: bin payload =
    # sum of sizes + separators). The md5 of the assembled sequence
    # puts every byte of every member, in order, under the value gate
    oracle=f"""
    WITH RECURSIVE s AS (
      SELECT (doc_id % {_PACK_SHARDS})::int AS shard, doc_id,
             n_chars::bigint AS size,
             row_number() OVER (PARTITION BY doc_id % {_PACK_SHARDS}
                                ORDER BY doc_id) AS rn
      FROM documents),
    r AS (
      SELECT shard, rn, doc_id, size,
             0::bigint AS bin_id, size AS fill
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.shard, s.rn, s.doc_id, s.size,
             CASE WHEN r.fill + s.size > {_PACK_CAPACITY}
                  THEN r.bin_id + 1 ELSE r.bin_id END,
             CASE WHEN r.fill + s.size > {_PACK_CAPACITY}
                  THEN s.size ELSE r.fill + s.size END
      FROM r JOIN s ON s.shard = r.shard AND s.rn = r.rn + 1)
    SELECT r.shard, r.bin_id,
           count(*)::int AS n_docs,
           sum(r.size)::bigint AS payload,
           md5(string_agg(d.text, chr(30) ORDER BY r.doc_id))
             AS seq_hash
    FROM r JOIN documents d ON d.doc_id = r.doc_id
    GROUP BY r.shard, r.bin_id
    ORDER BY r.shard, r.bin_id
    """,
    doc="materialized packed training sequences — the gather that "
        "turns the packing plan into physical examples: the plan "
        "(shard, doc -> bin, offset) joins back to the text and each "
        "bin concatenates its members in doc order (array_sort over "
        "(doc_id, text) structs -> array_join: one shuffle on "
        "(shard, bin), deterministic within-bin order, no window). "
        "At 100 TB this is the only stage that moves text — once, "
        "co-partitioned by the bin key; payload stays <= capacity per "
        "row by the packer's invariant",
)
def packed_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rsyslog_nginx_clickhouse_spark.operators.packing import greedy_pack

    docs = load(spark, sf_dir, "documents")
    plan = greedy_pack(
        docs.select((F.col("doc_id") % _PACK_SHARDS).cast("int")
                    .alias("shard"),
                    "doc_id", F.col("n_chars").alias("size")),
        _PACK_CAPACITY)
    joined = plan.join(docs.select("doc_id", "text"), "doc_id")
    members = F.array_sort(F.collect_list(F.struct("doc_id", "text")))
    return (joined.groupBy("shard", "bin_id")
            .agg(F.count("*").cast("int").alias("n_docs"),
                 F.sum("size").alias("payload"),
                 F.md5(F.array_join(
                     F.transform(members, lambda m: m["text"]),
                     "\x1e")).alias("seq_hash"))
            .orderBy("shard", "bin_id"))


@query(
    "dsir_importance",
    # the oracle replays the identical estimator: add-1-smoothed
    # unigram LM for target (lang='en') and raw corpus over the SAME
    # normalized tokenization every other curation metric uses, then
    # per-doc sum over token OCCURRENCES of ln(p_tgt) - ln(p_raw).
    # ln/sums are irrational-valued, so plain round(6) is tie-safe
    # (functions/rounding.py discipline — same class as tfidf)
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             unnest(string_split(regexp_replace(lower(trim(text)),
                                                '\\s+', ' ', 'g'),
                                 ' ')) AS tok
      FROM documents),
    raw AS (SELECT tok, count(*) AS cr FROM t GROUP BY tok),
    tgt AS (SELECT tok, count(*) AS ct FROM t WHERE lang = 'en'
            GROUP BY tok),
    tot AS (SELECT (SELECT sum(cr) FROM raw) AS nr,
                   (SELECT sum(ct) FROM tgt) AS nt,
                   (SELECT count(*) FROM raw) AS v),
    w AS (
      SELECT r.tok,
             ln((coalesce(t2.ct, 0) + 1)::double / (tot.nt + tot.v))
             - ln((r.cr + 1)::double / (tot.nr + tot.v)) AS w
      FROM raw r LEFT JOIN tgt t2 USING (tok) CROSS JOIN tot)
    SELECT t.doc_id, count(*)::bigint AS n_toks,
           round(sum(w.w), 6) AS logratio
    FROM t JOIN w USING (tok)
    GROUP BY t.doc_id ORDER BY t.doc_id
    """,
    doc="DSIR-style importance weighting (Xie et al. 2023, Data "
        "Selection via Importance Resampling): per-doc log-likelihood "
        "ratio between an add-1-smoothed unigram model of the TARGET "
        "distribution (lang='en' here; any curated seed set in "
        "production) and the raw corpus — the score importance "
        "sampling then resamples by. Plan: one token explode (the "
        "same O(tokens) cost as tokenization), two vocab-sized "
        "partial aggs, a vocab join carrying one double per token "
        "occurrence, one per-doc sum — no driver-side state; the "
        "1-row totals broadcast",
)
def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = docs.select("doc_id", "lang",
                    F.explode(_toks(F.col("text"))).alias("tok"))
    raw = t.groupBy("tok").agg(F.count("*").alias("cr"))
    tgt = (t.where(F.col("lang") == "en")
            .groupBy("tok").agg(F.count("*").alias("ct")))
    # model normalizers: THREE scalars (raw occurrences, vocab size,
    # target occurrences) — a parameter-sized driver fetch (the
    # zorder-bounds pattern), inlined as literals so the weight
    # projection stays a plain expression, no 1-row cross join for
    # the plan audit to flag
    nr, v = raw.agg(F.sum("cr"), F.count("*")).collect()[0]
    nt = tgt.agg(F.sum("ct")).collect()[0][0]
    w = (raw.join(tgt, "tok", "left")
            .select("tok",
                    (F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1)
                           .cast("double") / F.lit(float(nt + v)))
                     - F.log((F.col("cr") + 1).cast("double")
                             / F.lit(float(nr + v)))).alias("w")))
    return (t.join(w, "tok")
             .groupBy("doc_id")
             .agg(F.count("*").alias("n_toks"),
                  F.round(F.sum("w"), 6).alias("logratio"))
             .orderBy("doc_id"))


@query(
    "ngram_lm_perplexity",
    # the oracle replays the identical estimator: add-1-smoothed
    # bigram LM trained on the corpus itself over the SAME normalized
    # tokenization; per-doc mean negative log-likelihood over bigram
    # OCCURRENCES. ln/sums are irrational-valued, so plain round(6)
    # is tie-safe (functions/rounding.py discipline — same class as
    # dsir_importance/tfidf). Vocabulary counts DISTINCT tokens over
    # ALL docs (including single-token docs that produce no bigrams).
    oracle="""
    WITH normed AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                         'g'), ' ') AS toks
      FROM documents),
    v AS (SELECT count(DISTINCT tok) AS v
          FROM (SELECT unnest(toks) AS tok FROM normed)),
    bg AS (
      SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      FROM normed, unnest(generate_series(1, len(toks) - 1)) AS t(i)
      WHERE len(toks) >= 2),
    c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
    w AS (
      SELECT c2.w1, c2.w2,
             -ln((c2.c2 + 1)::double / (c1.c1 + v.v)) AS nll
      FROM c2 JOIN c1 USING (w1) CROSS JOIN v)
    SELECT b.doc_id, count(*)::bigint AS n_bigrams,
           round(sum(w.nll) / count(*), 6) AS cross_entropy
    FROM bg b JOIN w USING (w1, w2)
    GROUP BY b.doc_id ORDER BY b.doc_id
    """,
    doc="CCNet-style LM quality scoring (Wenzek et al. 2020, §4.3 — "
        "perplexity filtering, the classic curation gate between "
        "dedup and training): per-document cross-entropy under an "
        "add-1-smoothed bigram LM trained distributively on the "
        "corpus itself (in production: on the curated seed corpus — "
        "swap the count source, same plan). Plan: the bigram explode "
        "(O(tokens), same order as tokenization) is re-derived per "
        "consumer — three pruned text-column scans feeding two "
        "vocab-bounded partial aggs and the probe side (cheaper than "
        "shuffling O(tokens) state; at 100 TB checkpoint the exploded "
        "stream once instead); weights are pre-joined vocab-side so "
        "the O(tokens) side joins ONCE against the per-distinct-"
        "bigram weight table, then one per-doc agg; the vocabulary "
        "size is a 1-value parameter fetch inlined as a literal (the "
        "zorder-bounds pattern)",
)
def ngram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = docs.select("doc_id", _toks(F.col("text")).alias("toks"))
    # vocabulary over ALL token occurrences (docs below 2 tokens
    # contribute vocab but score no bigrams)
    v = int(t.select(F.explode("toks").alias("tok"))
             .agg(F.count_distinct("tok")).collect()[0][0])
    bg = (t.where(F.size("toks") >= 2)
           .select("doc_id",
                   F.explode(F.expr(
                       "transform(sequence(0, size(toks) - 2), "
                       "i -> struct(toks[i] AS w1, toks[i + 1] AS w2))"
                   )).alias("b"))
           .select("doc_id", "b.w1", "b.w2"))
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    w = (c2.join(c1, "w1")
           .select("w1", "w2",
                   (-F.log((F.col("c2") + 1).cast("double")
                           / (F.col("c1") + F.lit(v)))).alias("nll")))
    return (bg.join(w, ["w1", "w2"])
              .groupBy("doc_id")
              .agg(F.count("*").alias("n_bigrams"),
                   F.round(F.sum("nll") / F.count("*"), 6)
                    .alias("cross_entropy"))
              .orderBy("doc_id"))


@query(
    "ngram_lm_perplexity_seeded",
    # the oracle replays the identical estimator: bigram counts and
    # vocabulary from the SEED subset only (lang='en' docs among a
    # FIXED id range — a bounded curated corpus, like production's
    # Wikipedia seed: its size does NOT grow with the corpus being
    # scored), every doc scored with add-1 smoothing and OOV backoff
    # -ln((c2+1)/(c1+V)) where missing counts coalesce to 0.
    # ln/means are irrational-valued → plain round(6) is tie-safe
    # (functions/rounding.py discipline, same class as
    # ngram_lm_perplexity).
    oracle="""
    WITH normed AS (
      SELECT doc_id, lang,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                         'g'), ' ') AS toks
      FROM documents),
    v AS (SELECT count(DISTINCT tok) AS v
          FROM (SELECT unnest(toks) AS tok FROM normed
                WHERE lang = 'en' AND doc_id < 500)),
    bg AS (
      SELECT doc_id, lang, toks[i] AS w1, toks[i + 1] AS w2
      FROM normed, unnest(generate_series(1, len(toks) - 1)) AS t(i)
      WHERE len(toks) >= 2),
    c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg
           WHERE lang = 'en' AND doc_id < 500 GROUP BY w1, w2),
    c1 AS (SELECT w1, count(*) AS c1 FROM bg
           WHERE lang = 'en' AND doc_id < 500 GROUP BY w1)
    SELECT b.doc_id, count(*)::bigint AS n_bigrams,
           round(sum(-ln((coalesce(c2.c2, 0) + 1)::double
                         / (coalesce(c1.c1, 0) + v.v)))
                 / count(*), 6) AS cross_entropy
    FROM bg b
    LEFT JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
    LEFT JOIN c1 ON b.w1 = c1.w1
    CROSS JOIN v
    GROUP BY b.doc_id ORDER BY b.doc_id
    """,
    doc="The PRODUCTION form of CCNet perplexity filtering (VERDICT "
        "r7 item 3): the bigram LM is trained on a BOUNDED curated "
        "SEED corpus (lang='en' docs within a fixed id range stands "
        "in for Wikipedia — crucially the seed does NOT grow with "
        "the corpus being scored), so the count tables are "
        "seed-vocabulary-sized PARAMETERS, broadcast to every "
        "executor, and scoring any corpus size is one scan + two "
        "broadcast hash joins + a per-doc agg with NO big-side "
        "shuffle growth (the corpus-trained twin's weight join grows "
        "with corpus vocabulary — its sf1 probe drifted 5.2x/10x on "
        "disjoint-vocab shards; this form's probe is flat). "
        "Unseen bigrams back off through add-1 smoothing with counts "
        "coalesced to 0: -ln((c2+1)/(c1+V)) over the SEED vocabulary "
        "V — every doc scores, OOV text just scores high (the CCNet "
        "tail bucket)",
)
def ngram_lm_perplexity_seeded(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = docs.select("doc_id", "lang", _toks(F.col("text")).alias("toks"))
    seed_toks = t.where((F.col("lang") == "en") & (F.col("doc_id") < 500))
    # seed vocabulary: ONE scalar, a parameter-sized driver fetch
    # inlined as a literal (the zorder-bounds pattern)
    v = int(seed_toks.select(F.explode("toks").alias("tok"))
            .agg(F.count_distinct("tok")).collect()[0][0])
    if v == 0:
        raise ValueError("seed subset (lang='en') holds no tokens — "
                         "a perplexity model needs a non-empty seed "
                         "corpus")
    bg_all = (t.where(F.size("toks") >= 2)
              .select("doc_id", "lang",
                      F.explode(F.expr(
                          "transform(sequence(0, size(toks) - 2), "
                          "i -> struct(toks[i] AS w1, toks[i + 1] AS w2))"
                      )).alias("b"))
              .select("doc_id", "lang", "b.w1", "b.w2"))
    seed_bg = bg_all.where((F.col("lang") == "en")
                           & (F.col("doc_id") < 500))
    c2 = seed_bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = seed_bg.groupBy("w1").agg(F.count("*").alias("c1"))
    nll = -F.log((F.coalesce(F.col("c2"), F.lit(0)) + 1).cast("double")
                 / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(v)))
    return (bg_all
            .join(F.broadcast(c2), ["w1", "w2"], "left")
            .join(F.broadcast(c1), ["w1"], "left")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_bigrams"),
                 F.round(F.sum(nll) / F.count("*"), 6)
                  .alias("cross_entropy"))
            .orderBy("doc_id"))
