"""Dedup tiers: exact, ngram-Jaccard, MinHash-LSH, SimHash, embedding."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rsyslog_nginx_clickhouse_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from rsyslog_nginx_clickhouse_spark.operators.simhash import (
    simhash_fingerprints,
    simhash_pairs,
)
from rsyslog_nginx_clickhouse_spark.operators.similarity import (
    cosine_dedup_pairs,
    knn_bruteforce,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),      # exact dup of 1
    (3, "the quick brown fox jumps over the lazy cat"),      # near dup of 1
    (4, "completely different content about spark engines"),
    (5, "The  Quick Brown   Fox jumps over the lazy dog"),   # ws/case dup of 1
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup_normalizes_case_and_whitespace(spark, docs):
    groups = {r["keep_id"]: r["n_copies"]
              for r in exact_dedup_groups(docs).collect()}
    assert groups == {1: 3, 3: 1, 4: 1}  # 1,2,5 collapse


def test_ngram_jaccard_finds_near_dups(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(1, 2)] == 1.0 and pairs[(1, 5)] == 1.0 and pairs[(2, 5)] == 1.0
    # 9 tokens → 7 tri-shingles; 1v3 differ only in the last → J=6/8
    assert pairs[(1, 3)] == pytest.approx(0.75, abs=1e-6)
    assert not any(4 in p for p in pairs)


def test_ngram_jaccard_docfreq_cap_drops_hot_shingles(spark):
    # 6 docs all sharing one viral boilerplate prefix (one hot shingle
    # universe) plus unique tails; docs 1 and 2 are true near-dups.
    boiler = "subscribe to our newsletter today"
    # tails: 2 unique tokens → uncapped J(3,4)=3/7≈0.43 (boilerplate
    # alone crosses the 0.3 threshold), capped J(3,4)=0
    rows = [(1, f"{boiler} alpha beta gamma delta"),
            (2, f"{boiler} alpha beta gamma epsilon"),
            (3, f"{boiler} tail3a tail3b"),
            (4, f"{boiler} tail4a tail4b"),
            (5, f"{boiler} tail5a tail5b"),
            (6, f"{boiler} tail6a tail6b")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # cap=5: every shingle inside the 5-token boilerplate appears in 6
    # docs → excluded from the Jaccard universe; tail shingles survive.
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, threshold=0.3,
                                          max_doc_freq=5).collect()}
    # without the cap (1,2) share the 3 boilerplate shingles too; with
    # it, similarity comes from the tails alone. Tails "alpha beta
    # gamma delta|epsilon": per-doc capped universe = 6 shingles of
    # which 2 boilerplate-overlapping... compute directly instead:
    uncapped = {(r["id_a"], r["id_b"]): r["jaccard"]
                for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert (1, 2) in pairs           # true near-dups still found
    assert pairs[(1, 2)] < uncapped[(1, 2)]  # boilerplate no longer counts
    # boilerplate-only pairs (e.g. 3,4) exceed 0.3 uncapped but carry
    # zero capped similarity
    assert (3, 4) in uncapped and (3, 4) not in pairs


def test_minhash_candidates_superset_verified_by_jaccard(spark, docs):
    got = {(r["id_a"], r["id_b"]) for r in
           minhash_lsh_pairs(docs, threshold=0.5).collect()}
    # identical docs always collide in every band; J=5/9 docs may or may
    # not survive banding, but anything returned must be truly >= 0.5
    assert {(1, 2), (1, 5), (2, 5)} <= got
    truth = {(r["id_a"], r["id_b"]) for r in
             ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert got <= truth


def test_simhash_identical_and_near(spark, docs):
    fps = {r["doc_id"]: r["simhash"]
           for r in simhash_fingerprints(docs).collect()}
    assert fps[1] == fps[2]  # identical text → identical fingerprint
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_pairs(docs, max_hamming=3).collect()}
    assert pairs[(1, 2)] == 0
    assert all(h <= 3 for h in pairs.values())


def test_cosine_dedup_exact_vs_lsh_consistent(spark):
    vecs = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.04, 0.0, 0.0]),   # cos ≈ 0.9992 with 1
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [1.0, 0.0, 0.0, 0.0]),      # exact dup of 1
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    exact = {(r["id_a"], r["id_b"]) for r in
             cosine_dedup_pairs(emb, threshold=0.95, dim=4).collect()}
    assert exact == {(1, 2), (1, 4), (2, 4)}
    lsh = {(r["id_a"], r["id_b"]) for r in
           cosine_dedup_pairs(emb, threshold=0.95, dim=4, use_lsh=True).collect()}
    # LSH returns a subset (bucket collisions required), never false hits
    assert lsh <= exact


def test_knn_bruteforce_orders_by_cosine(spark):
    vecs = [(i, [1.0, float(i) / 10, 0.0]) for i in range(10)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    q = F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0))
    got = knn_bruteforce(emb, query_vec=q, k=3).collect()
    assert [r["vec_id"] for r in got] == [0, 1, 2]
    sims = [r["cos_sim"] for r in got]
    assert sims == sorted(sims, reverse=True)


def test_connected_components_chain(spark):
    from rsyslog_nginx_clickhouse_spark.operators.dedup import (
        connected_components,
    )

    # chain 1-2-3-4 (needs label propagation across 3 hops) + island 8-9
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (8, 9)], "id_a long, id_b long")
    got = {r["doc_id"]: r["component"]
           for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 8: 8, 9: 8}


def test_incremental_exact_dedup(spark):
    from rsyslog_nginx_clickhouse_spark.operators.dedup import (
        incremental_exact_dedup,
    )

    seen = spark.createDataFrame([], "fingerprint string")
    batch1 = spark.createDataFrame(
        [(1, "doc one"), (2, "doc one"), (3, "doc three")],
        "doc_id long, text string")
    kept1, fp1 = incremental_exact_dedup(batch1, seen)
    assert {r["doc_id"] for r in kept1.collect()} == {1, 3}
    seen = seen.union(fp1)

    # batch 2: one dup-of-history, one batch-internal dup, one new
    batch2 = spark.createDataFrame(
        [(10, "doc one"), (11, "doc new"), (12, "DOC   new")],
        "doc_id long, text string")
    kept2, fp2 = incremental_exact_dedup(batch2, seen)
    assert {r["doc_id"] for r in kept2.collect()} == {11}
    assert fp2.count() == 1


def test_split_bucket_deterministic_and_balanced(spark):
    from rsyslog_nginx_clickhouse_spark.operators.dedup import split_bucket
    from pyspark.sql import functions as F

    df = spark.range(10000).select(F.col("id"))
    a = df.select(split_bucket("id").alias("b")).groupBy("b").count()
    counts = {r["b"]: r["count"] for r in a.collect()}
    assert set(counts) == set(range(100))          # every bucket hit
    assert all(50 <= c <= 160 for c in counts.values())  # roughly uniform
    # repartitioning must not change assignments (the randomSplit trap)
    b = df.repartition(7).select("id", split_bucket("id").alias("b"))
    b2 = df.repartition(3).select("id", split_bucket("id").alias("b"))
    assert ({(r["id"], r["b"]) for r in b.collect()}
            == {(r["id"], r["b"]) for r in b2.collect()})


def test_repeated_span_removal_c4_semantics(spark):
    """Canonical (lowest doc_id, start) occurrence keeps its tokens;
    every other occurrence of a duplicated k-span is cut; overlaps
    union; short docs pass through."""
    from rsyslog_nginx_clickhouse_spark.operators.dedup import (
        repeated_span_removal,
    )

    # k=3. Docs 1 and 2 share the span "a b c"; doc 2 also repeats it
    # internally. Doc 3 is shorter than k. Doc 4 is all-unique.
    df = spark.createDataFrame(
        [
            (1, "a b c x y z"),
            (2, "a b c q a b c"),
            (3, "a b"),
            (4, "p q r s"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           repeated_span_removal(df, k=3).collect()}

    # doc 1 holds the canonical "a b c" (lowest doc_id, start=0)
    assert out[1]["clean_text"] == "a b c x y z"
    assert out[1]["n_removed"] == 0
    # doc 2: spans at 0 and 4 are later occurrences -> tokens 0-2 and
    # 4-6 are covered; only "q" (pos 3) survives
    assert out[2]["clean_text"] == "q"
    assert out[2]["n_removed"] == 6 and out[2]["n_tokens"] == 7
    # short doc untouched
    assert out[3]["clean_text"] == "a b" and out[3]["n_removed"] == 0
    # unique doc untouched
    assert out[4]["clean_text"] == "p q r s" and out[4]["n_removed"] == 0


def test_repeated_span_removal_partition_invariant(spark):
    from rsyslog_nginx_clickhouse_spark.operators.dedup import (
        repeated_span_removal,
    )

    rows = [(i, " ".join(f"w{(i * 7 + j) % 11}" for j in range(20)))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r1 = {tuple(r) for r in
          repeated_span_removal(df.repartition(13), k=5).collect()}
    r2 = {tuple(r) for r in
          repeated_span_removal(df.coalesce(1), k=5).collect()}
    assert r1 == r2


# ------------------------------------------------- perceptual image hash --


def test_image_ahash_integer_exact_vs_text_replay():
    """aHash bits replay from the text bytes with pure integer
    arithmetic (64·v > Σv) — the property that makes the SQL oracle
    possible; a constant image hashes to 0."""
    import numpy as np

    from rsyslog_nginx_clickhouse_spark.operators.imagehash import (
        _pack_bits_msb,
        image_ahash64,
    )
    from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
        decode_image,
        render_bmp_bytes,
    )

    for text in ("imagehash", "The quick brown fox", "zz top 123"):
        got = image_ahash64(decode_image(render_bmp_bytes(text)))
        tb = text.encode()
        px = [tb[i % len(tb)] for i in range(64)]
        s = sum(px)
        want = _pack_bits_msb(np.array([64 * v > s for v in px]))
        assert got == want
    assert image_ahash64(
        decode_image(render_bmp_bytes("qqqq"))) == 0


def test_image_phash_matches_independent_dct_replay():
    """pHash bits replay from an independently-computed DCT-II (scipy-
    style direct cosine sums, NOT the module's basis matrix) — 31 bits
    set (median of 63 coefficients), brightness-shift tolerant."""
    import numpy as np

    from rsyslog_nginx_clickhouse_spark.operators.imagehash import (
        _pack_bits_msb,
        image_phash64,
    )
    from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
        decode_image,
        render_bmp_bytes,
    )

    text = "phash independent replay"
    img = decode_image(render_bmp_bytes(text))
    got = image_phash64(img)
    g = np.asarray(img, dtype=np.float64).mean(axis=2)
    # direct O(N^4) DCT-II with orthonormal scaling
    coef = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = np.sqrt(0.125) if u == 0 else 0.5
            cv = np.sqrt(0.125) if v == 0 else 0.5
            s = sum(g[x, y]
                    * np.cos((2 * x + 1) * u * np.pi / 16)
                    * np.cos((2 * y + 1) * v * np.pi / 16)
                    for x in range(8) for y in range(8))
            coef[u, v] = cu * cv * s
    flat = coef.ravel()[1:]
    bits = np.concatenate([flat > np.median(flat), [False]])
    want = _pack_bits_msb(bits)
    assert got == want
    assert bin(got & (2 ** 64 - 1)).count("1") == 31
    # a uniform brightness shift leaves every non-DC coefficient
    # unchanged -> identical pHash, while aHash input pixels all moved
    shifted = np.clip(img.astype(np.int64) + 20, 0, 255).astype("uint8")
    assert image_phash64(shifted) == got


def test_image_hash_pairs_match_allpairs_popcount(spark, sf_dir):
    """The chunk-LSH candidate join + popcount verify returns EXACTLY
    the all-pairs Hamming-≤-budget set (pigeonhole completeness), for
    both hash kinds."""
    from pyspark.sql import functions as F

    from rsyslog_nginx_clickhouse_spark.catalog import load
    from rsyslog_nginx_clickhouse_spark.operators.imagehash import (
        image_hash_pairs,
        image_hashes,
    )
    from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
        attach_bmp,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text") \
        .limit(300)
    mm = attach_bmp(docs)
    for kind in ("ahash", "phash"):
        got = {(r.id_a, r.id_b, r.hamming) for r in
               image_hash_pairs(mm, kind=kind, max_hamming=3).collect()}
        fp = {r.doc_id: r.img_hash
              for r in image_hashes(mm, kind=kind).collect()}
        want = set()
        ids = sorted(fp)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                d = bin((fp[a] ^ fp[b]) & (2 ** 64 - 1)).count("1")
                if d <= 3:
                    want.add((a, b, d))
        assert got == want, kind
