"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") — the
train-the-tokenizer step of a pretraining pipeline, run as DataFrame
aggregates so the one data-sized pass is a word count.

Architecture (the same shape real BPE trainers use): the corpus
collapses to a WORD-FREQUENCY table in one distributed aggregate
(O(tokens) explode + partial-agg — the only pass that touches all
data); training then iterates on that vocab-sized table only: count
adjacent symbol pairs weighted by word frequency (one partial-agg
shuffle of O(vocab · word-len) rows per merge), pick the argmax pair
(deterministic tie-break: count DESC, pair lexicographic ASC — a
1-row, parameter-sized driver fetch per merge), and apply the merge to
every word's symbol sequence as a single string replace. At 100 TB the
word count is the cost; 8 or 50 000 merges later the state is still
O(vocab).

Merge-step exactness (what makes the whole training value-oracle-able
in SQL): a word's symbol sequence is encoded as a TWO-space-delimited
string (``"  c  a  f  e  "``), and merging pair (a, b) is ONE
``replace(s, ' a  b ', ' ab ')``. Each match consumes one space from
the left delimiter and one from the right, so adjacent occurrences
keep a full single-space margin and one left-to-right non-overlapping
replace pass equals the canonical greedy BPE merge EXACTLY (verified
property-style against a reference merger over runs and composite
symbols — including odd runs like ``aaaaa → [aa, aa, a]`` where
single-space encodings diverge). Both engines' ``replace`` scan the
source left-to-right non-overlapping, so Spark and DuckDB apply
bit-identical merges, and the oracle replays training end-to-end.

Symbols are restricted to ``[a-z]+`` word tokens (the engine's
normalized-text alphabet), so replace patterns never contain regex or
quoting hazards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from rsyslog_nginx_clickhouse_spark.localdf import local_rows

#: chars → "  c  a  f  e  " (two-space delimiters, see module doc)
_INIT_STATE = ("'  ' || array_join(transform(sequence(1, length(w)), "
               "i -> substr(w, i, 1)), '  ') || '  '")

#: adjacent symbol pairs of the current state, empty for 1-symbol words
#: (guarded: Spark's sequence(1, 0) would count DOWN, not produce [])
_PAIRS = """
  CASE WHEN size(split(trim(s), '  ')) < 2
       THEN cast(array() as array<struct<a: string, b: string>>)
       ELSE transform(sequence(1, size(split(trim(s), '  ')) - 1),
                      i -> named_struct(
                          'a', element_at(split(trim(s), '  '), i),
                          'b', element_at(split(trim(s), '  '), i + 1)))
  END
"""


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The one data-sized pass: (word, freq) over ``[a-z]+`` tokens.

    explode_outer + post-filter, not explode: a plain explode's
    inferred ``size > 0`` filter evaluates the regex tokenization a
    SECOND time per document (round 15 — the exact_substring_matches
    finding; here both runs share one stage, still 2× the regex CPU).
    """
    return (docs.select(F.explode_outer(F.expr(
                f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)"))
                .alias("w"))
                .where(F.col("w").isNotNull())
                .groupBy("w").agg(F.count("*").alias("freq")))


def _train(docs: DataFrame, n_merges: int,
           text_col: str) -> tuple[list[tuple], DataFrame]:
    """Run the merge loop; returns (merge rows, final word-state DF).

    The per-iteration driver fetch is the single argmax pair — the
    Lloyd-update precedent for iterative operators. The word-state
    DataFrame is cached; each iteration's state is the cached base
    plus an in-plan chain of ``replace`` projections (at production
    vocab sizes, persist each iteration instead — same plan, noted
    here because this function re-evaluates the chain per merge).
    """
    words = (word_frequencies(docs, text_col)
             .select("w", "freq", F.expr(_INIT_STATE).alias("s"))
             .cache())
    merges: list[tuple] = []
    st = words
    for it in range(1, n_merges + 1):
        # explode_outer: a plain explode's inferred size>0 filter
        # evaluated _PAIRS — and the whole replace-chain under it —
        # twice per iteration (see word_frequencies, round 15)
        top = (st.select("freq",
                         F.explode_outer(F.expr(_PAIRS)).alias("p"))
                 .where(F.col("p").isNotNull())
                 .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                 .agg(F.sum("freq").alias("cnt"))
                 .orderBy(F.desc("cnt"), "a", "b")
                 .limit(1).collect())
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((it, a, b, a + b, cnt))
        st = st.withColumn(
            "s", F.expr(f"replace(s, ' {a}  {b} ', ' {a}{b} ')"))
    words.unpersist()
    return merges, st


def bpe_train(docs: DataFrame, n_merges: int = 8,
              text_col: str = "text") -> DataFrame:
    """Train ``n_merges`` BPE merges; returns one row per merge:
    (it, pair_a, pair_b, merged, cnt) — the ordered merge table that
    IS the trained tokenizer (apply-side replays it in order)."""
    merges, _ = _train(docs, n_merges, text_col)
    return local_rows(
        docs.sparkSession, merges,
        "it int, pair_a string, pair_b string, merged string, "
        "cnt bigint")


def bpe_tokenize_counts(docs: DataFrame, n_merges: int = 8,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Apply the trained tokenizer: per-document word / char / subword
    counts. The final training state already IS the tokenization of
    every vocab word, so apply = one broadcast-sized join of the
    exploded corpus against the vocab state — the cheap side of BPE,
    exactly how production tokenizers amortize (tokenize by vocab
    lookup, never re-running merges per document)."""
    _, st = _train(docs, n_merges, text_col)
    vocab = st.select(
        "w", F.size(F.split(F.trim("s"), "  ")).alias("n_sub"))
    # explode_outer + post-filter: see word_frequencies (the inferred
    # size>0 filter would run the regex tokenization twice per doc)
    tok = docs.select(id_col, F.explode_outer(F.expr(
        f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)"))
        .alias("w"))
    tok = tok.where(F.col("w").isNotNull())
    return (tok.join(vocab, "w")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_words"),
                 F.sum(F.length("w")).alias("n_chars"),
                 F.sum("n_sub").alias("n_subwords"))
            .orderBy(id_col))


def bpe_training_ctes(n_merges: int = 8,
                      src: str = "documents") -> tuple[list[str], str]:
    """DuckDB CTE chain replaying the ENTIRE training iteration by
    iteration — pair counts, argmax with the identical tie-break,
    and the same two-space-encoded replace merge; every CTE is
    MATERIALIZED because the chain is deep and multiply-referenced
    (scalar subqueries on p_i) — inlining would expand it
    exponentially. Returns (ctes, final-state CTE name) so the
    train and tokenize oracles share one replay that cannot drift
    (the _ivf_train_ctes discipline)."""
    ctes = [f"""tok AS MATERIALIZED (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      FROM {src})""",
            """w0 AS MATERIALIZED (
      SELECT w, count(*)::BIGINT AS freq,
             '  ' || array_to_string(list_transform(
                 range(1, length(w) + 1), i -> substr(w, i, 1)),
                 '  ') || '  ' AS s
      FROM tok GROUP BY w)"""]
    for i in range(1, n_merges + 1):
        prev = f"w{i - 1}"
        ctes.append(f"""ser{i} AS MATERIALIZED (
      SELECT unnest(range(1, (SELECT max(len(string_split(trim(s),
                                             '  '))) FROM {prev}))) AS gi)""")
        ctes.append(f"""pc{i} AS MATERIALIZED (
      SELECT l[gi] AS a, l[gi + 1] AS b, sum(freq)::BIGINT AS cnt
      FROM (SELECT freq, string_split(trim(s), '  ') AS l FROM {prev}) t
      JOIN ser{i} ON gi <= len(l) - 1
      GROUP BY a, b)""")
        ctes.append(f"""p{i} AS MATERIALIZED (
      SELECT a, b, cnt FROM pc{i} ORDER BY cnt DESC, a, b LIMIT 1)""")
        ctes.append(f"""w{i} AS MATERIALIZED (
      SELECT w, freq,
             CASE WHEN EXISTS (SELECT 1 FROM p{i})
                  THEN replace(s,
                       ' ' || (SELECT a FROM p{i}) || '  '
                           || (SELECT b FROM p{i}) || ' ',
                       ' ' || (SELECT a FROM p{i})
                           || (SELECT b FROM p{i}) || ' ')
                  ELSE s END AS s
      FROM {prev})""")
    return ctes, f"w{n_merges}"


def bpe_oracle_sql(n_merges: int = 8, src: str = "documents") -> str:
    """Training oracle: the merge table (it, pair_a, pair_b, merged,
    cnt) derived entirely from the data by the replayed chain."""
    ctes, _ = bpe_training_ctes(n_merges, src)
    unions = "\n    UNION ALL ".join(
        f"SELECT {i}::int AS it, a AS pair_a, b AS pair_b, "
        f"a || b AS merged, cnt FROM p{i}"
        for i in range(1, n_merges + 1))
    return ("WITH " + ",\n    ".join(ctes)
            + f"\n    {unions}\n    ORDER BY it")


def bpe_tokenize_oracle_sql(n_merges: int = 8,
                            src: str = "documents") -> str:
    """Apply-side oracle: per-document word/char/subword counts after
    the trained merges — the final training state w{n} IS the
    tokenization of every vocab word, so applying the tokenizer is a
    join against it."""
    ctes, final = bpe_training_ctes(n_merges, src)
    ctes.append(f"""dt AS MATERIALIZED (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+'))
               AS w
      FROM {src})""")
    return ("WITH " + ",\n    ".join(ctes) + f"""
    SELECT dt.doc_id, count(*)::BIGINT AS n_words,
           sum(length(dt.w))::BIGINT AS n_chars,
           sum(len(string_split(trim({final}.s), '  ')))::BIGINT
             AS n_subwords
    FROM dt JOIN {final} USING (w)
    GROUP BY dt.doc_id ORDER BY dt.doc_id""")
