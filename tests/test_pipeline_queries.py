"""Hand-checked semantics for the curation-pipeline and extended TPC-H
queries (queries/pipeline.py, queries/tpch_plus.py).

The registry smoke test already runs every entry at sf0.001 and the
selfcheck/driver gate compares against DuckDB; these tests pin the
SEMANTICS on constructed inputs where the expected answer is computed
by hand.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rsyslog_nginx_clickhouse_spark.queries import load_all
from rsyslog_nginx_clickhouse_spark.queries.pipeline import (
    dup_ngram_stats,
    gopher_flags,
    ngram_occurrences,
)

QS = load_all()


# ---------- pipeline operators on constructed inputs ----------

def test_ngram_occurrences_exact(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"),   # 2 five-grams
         (2, "a b"),           # shorter than n -> one full-text gram
         (3, "  A  b C ")],    # normalization: lower + collapse + trim
        ["doc_id", "text"])
    rows = {r["doc_id"]: r["grams"] for r in df.select(
        "doc_id", ngram_occurrences(F.col("text")).alias("grams")
    ).collect()}
    assert rows[1] == ["a b c d e", "b c d e f"]
    assert rows[2] == ["a b"]
    assert rows[3] == ["a b c"]


def test_dup_ngram_stats_known_overlap(spark):
    # doc 1 and 2 share their first five-gram; doc 3 shares nothing.
    df = spark.createDataFrame(
        [(1, "a b c d e x"),   # grams: "a b c d e", "b c d e x"
         (2, "a b c d e y"),   # grams: "a b c d e", "b c d e y"
         (3, "p q r s t u")],  # grams: unique
        ["doc_id", "text"])
    got = {r["doc_id"]: r["dup_frac"]
           for r in dup_ngram_stats(df).collect()}
    assert got == {1: 0.5, 2: 0.5, 3: 0.0}


def test_gopher_flags_thresholds(spark):
    long_good = " ".join(["the"] + ["quality"] * 60)  # 61 words, has stopword
    short = "too short"
    no_stopwords = " ".join(["zzz"] * 60)
    df = spark.createDataFrame(
        [(1, long_good), (2, short), (3, no_stopwords)],
        ["doc_id", "text"])
    got = {r["doc_id"]: r for r in gopher_flags(df).collect()}
    assert got[1]["keep"] == 1
    assert got[2]["keep"] == 0          # word count below 50
    assert got[3]["keep"] == 0          # stopword_frac == 0
    assert got[2]["n_words"] == 2
    assert abs(got[2]["mean_word_len"] - 4.0) < 1e-9  # (9-2+1)/2


def test_gopher_flags_messy_whitespace_and_null(spark):
    # mean word length must come from the COLLAPSED text: raw length of
    # "aaa  \t bbb\n\nccc" would inflate the metric.
    df = spark.createDataFrame(
        [(1, "aaa  \t bbb\n\nccc"), (2, None)],
        "doc_id: long, text: string")
    got = {r["doc_id"]: r for r in gopher_flags(df).collect()}
    assert got[1]["n_words"] == 3
    assert abs(got[1]["mean_word_len"] - 3.0) < 1e-9
    assert got[2]["keep"] == 0  # NULL text → dropped, not NULL flag


def test_stratified_sample_deterministic(spark, sf_dir):
    q = QS["stratified_sample"].spark
    a = [tuple(r) for r in q(spark, sf_dir).collect()]
    b = [tuple(r) for r in q(spark, sf_dir).collect()]
    assert a == b
    assert len(a) > 0


def test_domain_mixture_shares_sum_to_one(spark, sf_dir):
    rows = QS["domain_mixture"].spark(spark, sf_dir).collect()
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert r["n_docs"] > 0 and r["n_tokens"] >= r["n_docs"]


# ---------- extended TPC-H semantics ----------

def test_q15_top_supplier_is_max(spark, sf_dir):
    rows = QS["q15_top_supplier"].spark(spark, sf_dir).collect()
    assert len(rows) >= 1
    revs = {r["total_revenue"] for r in rows}
    assert len(revs) == 1  # all returned suppliers tie at the max


def test_q13_distribution_accounts_for_all_customers(spark, sf_dir):
    from rsyslog_nginx_clickhouse_spark.catalog import load

    rows = QS["q13_order_count_distribution"].spark(spark, sf_dir).collect()
    n_cust = load(spark, sf_dir, "customer").count()
    assert sum(r["custdist"] for r in rows) == n_cust


def test_q4_exists_bounds(spark, sf_dir):
    from rsyslog_nginx_clickhouse_spark.catalog import load

    rows = QS["q4_order_priority"].spark(spark, sf_dir).collect()
    window_orders = (load(spark, sf_dir, "orders")
                     .where((F.col("o_orderdate") >= "1997-01-01")
                            & (F.col("o_orderdate") < "1997-04-01"))
                     .count())
    assert sum(r["order_count"] for r in rows) <= window_orders
    prios = {r["o_orderpriority"] for r in rows}
    assert prios <= {"1-URGENT", "2-HIGH", "3-MEDIUM",
                     "4-NOT SPECIFIED", "5-LOW"}


def test_q11_threshold_relative(spark, sf_dir):
    rows = QS["q11_important_parts"].spark(spark, sf_dir).collect()
    if rows:  # ordered by value desc — and every value above the mean cut
        vals = [r["part_value"] for r in rows]
        assert vals == sorted(vals, reverse=True)


def test_q17_scalar_nonnegative(spark, sf_dir):
    rows = QS["q17_small_qty_revenue"].spark(spark, sf_dir).collect()
    assert len(rows) == 1
    v = rows[0]["avg_yearly"]
    assert v is None or v >= 0.0


def test_q2_one_supplier_per_part(spark, sf_dir):
    rows = QS["q2_min_cost_supplier"].spark(spark, sf_dir).collect()
    assert len(rows) >= 1
    parts = [r["p_partkey"] for r in rows]
    assert len(parts) == len(set(parts))  # rn=1 → one winner per part
    bals = [r["s_acctbal"] for r in rows]
    assert bals == sorted(bals, reverse=True)
    assert all(r["unit_cost"] > 0 for r in rows)


def test_q12_counts_partition_the_window(spark, sf_dir):
    from rsyslog_nginx_clickhouse_spark.catalog import load

    rows = QS["q12_priority_shipping"].spark(spark, sf_dir).collect()
    n_lines = (load(spark, sf_dir, "lineitem")
               .where((F.col("l_shipdate") >= "1997-01-01")
                      & (F.col("l_shipdate") < "1998-01-01"))
               .count())
    assert sum(r["high_line_count"] + r["low_line_count"]
               for r in rows) == n_lines


def test_q21_sole_late_shipper(spark, sf_dir):
    rows = QS["q21_waiting_suppliers"].spark(spark, sf_dir).collect()
    assert len(rows) >= 1
    waits = [r["numwait"] for r in rows]
    assert waits == sorted(waits, reverse=True)
    assert all(w >= 1 for w in waits)


def test_q22_idle_customers_excludes_recent(spark, sf_dir):
    from rsyslog_nginx_clickhouse_spark.catalog import load

    rows = QS["q22_idle_customers"].spark(spark, sf_dir).collect()
    total = sum(r["numcust"] for r in rows)
    n_cust = load(spark, sf_dir, "customer").count()
    assert 0 <= total <= n_cust


def test_pii_redaction_on_synthetic_pii(spark):
    """The corpus has no PII, so the registry query proves zero-match
    parity; this fixture proves the patterns actually fire and the
    replacement order keeps an email's host from being half-eaten."""
    from rsyslog_nginx_clickhouse_spark.functions.text import (
        pii_counts,
        redact_pii,
    )

    df = spark.createDataFrame(
        [(0, "mail bob.smith+x@corp.example.org now"),
         (1, "from 192.168.0.1 to 10.0.0.255 twice 10.0.0.255"),
         (2, "call +4915112345678 or +123456789"),
         (3, "plain text, no pii at all"),
         (4, "v1.2.3.4000 is a version, not an ip")],
        "doc_id long, text string")
    counts = pii_counts(F.col("text"))
    out = {r["doc_id"]: r for r in df.select(
        "doc_id", counts["email"].alias("e"), counts["ipv4"].alias("i"),
        counts["phone"].alias("p"),
        redact_pii(F.col("text")).alias("red")).collect()}
    assert (out[0]["e"], out[0]["red"]) == (1, "mail [EMAIL] now")
    assert out[1]["i"] == 3 and out[1]["red"] == "from [IP] to [IP] twice [IP]"
    assert out[2]["p"] == 2 and out[2]["red"] == "call [PHONE] or [PHONE]"
    assert (out[3]["e"], out[3]["i"], out[3]["p"]) == (0, 0, 0)
    # \b guards: 4000 is not a valid final octet boundary match start,
    # but 1.2.3.400 contains 1.2.3.40 — the pattern must NOT fire when
    # digits continue past the match (trailing \b blocks it)
    assert out[4]["i"] == 0 and out[4]["red"] == out[4]["red"]


def test_repetition_stats_hand_computed(spark, tmp_path):
    import os

    d = str(tmp_path / "sf")
    os.makedirs(d)
    spark.createDataFrame(
        [(0, "spam spam spam eggs", "en", "src0", 19),
         (1, "a b c d", "en", "src1", 7)],
        "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(d, "documents.parquet"))
    rows = {r["doc_id"]: r
            for r in QS["repetition_stats"].spark(spark, d).collect()}
    assert rows[0]["top_token"] == "spam"
    assert rows[0]["top_count"] == 3 and rows[0]["n_tokens"] == 4
    assert abs(rows[0]["top_share"] - 0.75) < 1e-9
    assert rows[1]["top_token"] == "a" and rows[1]["top_count"] == 1


def test_distributed_cumsum_matches_global_window(spark):
    """Two-phase prefix == the single-partition global window, and the
    result is invariant to how many ranges the input is cut into."""
    from pyspark.sql import Window
    from rsyslog_nginx_clickhouse_spark.operators.prefix import (
        distributed_cumsum,
        shard_assignment,
    )

    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), ((F.col("id") * 37) % 100 + 1).alias("v"))
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)
    expected = {r["k"]: r["c"] for r in
                df.select("k", F.sum("v").over(w).alias("c")).collect()}
    for n_ranges in (1, 7, 32):
        got = {r["k"]: r["cum"] for r in
               distributed_cumsum(df, "k", "v", num_ranges=n_ranges)
               .collect()}
        assert got == expected, f"n_ranges={n_ranges}"
    # shard boundaries: rows never split, shards ~target-sized
    out = (distributed_cumsum(df, "k", "v")
           .select("k", "v", "cum",
                   shard_assignment(F.col("cum"), F.col("v"), 5000)
                   .alias("s")).collect())
    by_shard = {}
    for r in sorted(out, key=lambda r: r["k"]):
        by_shard.setdefault(r["s"], []).append(r)
    sids = sorted(by_shard)
    assert sids == list(range(len(sids)))  # contiguous shard ids
    for s in sids[:-1]:
        tot = sum(r["v"] for r in by_shard[s])
        assert tot >= 5000 - 100  # filled to target (minus last-row spill)


def test_dsir_importance_orders_target_like_docs_first(spark, tmp_path):
    """On a corpus where target (en) and non-target docs use disjoint
    vocabularies, every target-vocab doc must outscore every
    non-target-vocab doc — the separation DSIR resampling relies on.
    A mixed doc lands strictly between."""
    from rsyslog_nginx_clickhouse_spark.queries import load_all

    rows = [
        (0, "alpha beta gamma alpha", "en", "s0", 22),
        (1, "alpha gamma beta beta", "en", "s0", 21),
        (2, "delta epsilon zeta", "fr", "s1", 18),
        (3, "epsilon zeta delta delta", "fr", "s1", 24),
        (4, "alpha delta", "de", "s2", 11),  # mixed, labeled non-en
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars int")
    sf = str(tmp_path / "sf")
    docs.write.parquet(f"{sf}/documents.parquet")
    got = {r.doc_id: r.logratio for r in
           load_all()["dsir_importance"].spark(spark, sf).collect()}
    per_tok = {d: got[d] / n for d, n in
               ((0, 4), (1, 4), (2, 3), (3, 4), (4, 2))}
    assert min(per_tok[0], per_tok[1]) > per_tok[4]
    assert per_tok[4] > max(per_tok[2], per_tok[3])


def test_ngram_lm_perplexity_flags_unpredictable_docs(spark, tmp_path):
    """The CCNet separation property: a document whose bigrams repeat
    the corpus's dominant pattern scores LOWER cross-entropy than a
    document of corpus-unique bigrams — the signal perplexity
    filtering thresholds on. Also: every score is positive (add-1
    smoothing keeps p < 1) and single-token docs emit no row."""
    from rsyslog_nginx_clickhouse_spark.queries import load_all

    rows = [
        (0, "spam ham spam ham spam ham spam ham", "en", "s0", 35),
        (1, "spam ham spam ham spam ham", "en", "s0", 26),
        (2, "quark boson lepton meson hadron", "en", "s1", 31),
        (3, "solo", "en", "s2", 4),  # one token: no bigrams, no row
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars int")
    sf = str(tmp_path / "sf")
    docs.write.parquet(f"{sf}/documents.parquet")
    got = {r.doc_id: r.cross_entropy for r in
           load_all()["ngram_lm_perplexity"].spark(spark, sf).collect()}
    assert set(got) == {0, 1, 2}
    assert all(v > 0 for v in got.values())
    assert max(got[0], got[1]) < got[2]
