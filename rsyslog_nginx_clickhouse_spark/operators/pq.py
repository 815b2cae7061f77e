"""Product quantization (Jégou et al. 2011, "Product Quantization for
Nearest Neighbor Search") over ``array<float>`` embedding columns —
the compression half of IVF-PQ, the method every 100 TB-scale ANN
deployment (FAISS et al.) actually runs.

The idea: split each d-dim vector into ``m`` subvectors of d/m dims,
train an independent k-centroid codebook per subspace, and store each
vector as m small codes (here 4 codes over 16-entry codebooks ≈ 4 B
per vector instead of 64 × 4 B floats — a 64× compression). Search
runs in the COMPRESSED domain: for a query q, precompute the m·k
lookup table LUT[s][c] = ||q_s − C[s][c]||² once (parameter-sized),
and each database vector's approximate distance is m table lookups
plus m−1 additions — the asymmetric distance computation (ADC) scan,
which never touches the raw floats.

Determinism contract (same family as the IVF build,
operators/similarity.py): codebooks are trained with id-seeded
deterministic Lloyd — seeds = the k lowest-vec_id subvectors,
assignment = argmin L2 with ties to the lowest code (np.argmin
first-min ↔ the oracle's row_number ORDER BY dist ASC, code ASC;
both sides order by the rank-equivalent −2·x·c + c·c, dropping the
rank-constant ||x||²), centroid update = the INTEGER-EXACT
tie-rounded mean of ``_lloyd_update_exact`` (components scaled 2^50
to exact ints, summed decimal(38,0), integer HALF_UP to 6 decimals) —
so Spark and the DuckDB oracle iterate from bit-identical codebooks
on any partitioning, and the whole training replays in SQL
(queries/llm._pq_train_ctes). ADC distances cross the oracle
boundary tie6-rounded like every cosine ranking (the numpy-vs-SQL
accumulation boundary the similarity module header documents); the
m-term distance itself is a FIXED left-associated addition in both
engines, and the LUT entries are computed with an in-index-order
sequential fold on both sides.

Scale shape: training touches only subvector slices (m independent
small k-means — each the IVF build's cost over d/m dims; at 100 TB
train on a sample, as FAISS does); encoding is one numpy argmin per
Arrow batch, a narrow O(rows) pass; the ADC scan is a code-table scan
with a literal-array lookup projection and a TakeOrdered top-k — no
shuffle larger than the result, no raw-vector I/O. Composed with the
persisted IVF index (probe lists first, ADC within them) this is
textbook IVF-PQ; the ADC query here scans the full code table so the
oracle stays exhaustive.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rsyslog_nginx_clickhouse_spark.functions.rounding import tie_round
from rsyslog_nginx_clickhouse_spark.localdf import local_rows
from rsyslog_nginx_clickhouse_spark.operators.similarity import (
    EMB_SCALE_BITS,
    _lloyd_update_exact,
)

#: default geometry for the 64-dim testdata embeddings: 4 subspaces of
#: 16 dims, 16 codes each (codes fit 4 bits; one vector = 4 codes)
M_SUB = 4
K_CODES = 16
PQ_ITER = 2


def _assign_l2_udf(C: "np.ndarray"):
    """argmin-L2 code for one subspace's codebook C (k × d_sub).
    np.argmin takes the FIRST minimum — the same tie order as the
    oracle's row_number ORDER BY dist ASC, code ASC."""

    @F.pandas_udf(T.IntegerType())
    def assign(subs: pd.Series) -> pd.Series:
        if len(subs) == 0:
            return pd.Series([], dtype="int32")
        X = np.stack([np.asarray(v, dtype=np.float64) for v in subs])
        # −2·x·c + ||c||² orders identically to ||x−c||²
        D = -2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
        return pd.Series(np.argmin(D, axis=1).astype("int32"))

    return assign


def pq_train(embeddings: DataFrame, m: int = M_SUB, k: int = K_CODES,
             n_iter: int = PQ_ITER, id_col: str = "vec_id",
             vec_col: str = "embedding", dim: int = 64) -> "np.ndarray":
    """Train the m per-subspace codebooks; returns (m, k, d/m) — a
    parameter-sized driver value (4·16·16 doubles here), like the IVF
    centroid matrix. Each subspace runs the deterministic Lloyd recipe
    independently; the update shuffle is k·d/m groups per subspace."""
    d_sub = dim // m
    books = np.zeros((m, k, d_sub))
    for s in range(m):
        sub = embeddings.select(
            F.col(id_col),
            F.slice(F.col(vec_col), s * d_sub + 1, d_sub).alias("sub"))
        seeds = sub.orderBy(id_col).limit(k).select("sub").collect()
        C = np.stack([np.asarray(r[0], dtype=np.float64) for r in seeds])
        for _ in range(n_iter):
            asg = sub.select(
                "sub", _assign_l2_udf(C)(F.col("sub")).alias("list_id"))
            C = _lloyd_update_exact(asg, C, "sub")
        books[s] = C
    return books


def pq_encode_wide(embeddings: DataFrame, books: "np.ndarray",
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """(id, codes array<int> of length m): each vector's PQ codes in
    one numpy argmin over all m subspaces per Arrow batch — the
    compressed representation an ADC scan reads instead of the raw
    floats."""
    m, k, d_sub = books.shape
    B = books

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def codes(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        X = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        out = np.empty((len(X), m), dtype="int32")
        for s in range(m):
            Xs = X[:, s * d_sub:(s + 1) * d_sub]
            D = -2.0 * (Xs @ B[s].T) + (B[s] * B[s]).sum(axis=1)[None, :]
            out[:, s] = np.argmin(D, axis=1)
        return pd.Series([list(map(int, row)) for row in out])

    return embeddings.select(F.col(id_col),
                             codes(F.col(vec_col)).alias("codes"))


def pq_encode(embeddings: DataFrame, books: "np.ndarray",
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(id, subspace, code) long-format codes — the storage/oracle
    format; `pq_encode_wide` is the scan-side shape."""
    return (pq_encode_wide(embeddings, books, id_col, vec_col)
            .select(id_col, F.posexplode("codes")
                    .alias("subspace", "code")))


def _pq_meta(embeddings_src: str | None, m: int, k: int,
             n_iter: int) -> dict:
    meta = {"m": m, "k": k, "n_iter": n_iter,
            "scale_bits": EMB_SCALE_BITS, "source": embeddings_src}
    if embeddings_src and os.path.exists(embeddings_src):
        st = os.stat(embeddings_src)
        meta["source_mtime"] = st.st_mtime
        meta["source_size"] = st.st_size
    return meta


def pq_index_fresh(index_dir: str, embeddings_src: str | None,
                   m: int = M_SUB, k: int = K_CODES,
                   n_iter: int = PQ_ITER) -> bool:
    """True iff ``index_dir`` holds codebooks+codes built from exactly
    this source file (path+mtime+size) with these parameters."""
    meta_path = os.path.join(index_dir, "meta.json")
    if not os.path.exists(meta_path):
        return False
    try:
        with open(meta_path) as f:
            return json.load(f) == _pq_meta(embeddings_src, m, k, n_iter)
    except (OSError, json.JSONDecodeError):
        return False


def pq_build(spark, embeddings: DataFrame, index_dir: str,
             m: int = M_SUB, k: int = K_CODES, n_iter: int = PQ_ITER,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int = 64, embeddings_src: str | None = None) -> None:
    """Train and PERSIST the PQ index (build-once/scan-many — the same
    amortization as ivf_build). Layout under ``index_dir``:

    - ``books/``   parquet, m·k·d/m rows (subspace, code, dim 1-based,
      cm) — parameter-sized, the codebook every ADC query loads;
    - ``codes/``   parquet (id, codes array<int>) — the compressed
      table ADC scans INSTEAD of the raw vectors (~4 B/vector here);
    - ``meta.json`` source fingerprint + params, so a stale index is
      rebuilt instead of silently scanned.
    """
    books = pq_train(embeddings, m, k, n_iter, id_col, vec_col, dim)
    pq_encode_wide(embeddings, books, id_col, vec_col) \
        .write.mode("overwrite").parquet(os.path.join(index_dir, "codes"))
    d_sub = dim // m
    rows = [(s, c, d + 1, float(books[s, c, d]))
            for s in range(m) for c in range(k) for d in range(d_sub)]
    (local_rows(spark, rows,
                "subspace int, code int, dim int, cm double")
        .coalesce(1).write.mode("overwrite")
        .parquet(os.path.join(index_dir, "books")))
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(_pq_meta(embeddings_src, m, k, n_iter), f)


def load_codebooks(spark, index_dir: str) -> "np.ndarray":
    """Driver-side (m, k, d/m) codebook tensor from the persisted
    index — a parameter-sized collect, the same boundary the IVF
    centroid fetch crosses."""
    rows = spark.read.parquet(os.path.join(index_dir, "books")).collect()
    m = max(r["subspace"] for r in rows) + 1
    k = max(r["code"] for r in rows) + 1
    d_sub = max(r["dim"] for r in rows)
    books = np.zeros((m, k, d_sub))
    for r in rows:
        books[r["subspace"], r["code"], r["dim"] - 1] = r["cm"]
    return books


def read_codes_wide(spark, index_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(index_dir, "codes"))


def adc_lut(books: "np.ndarray", qv: "np.ndarray") -> list[list[float]]:
    """Per-subspace ADC lookup tables for one query: LUT[s][c] =
    ||q_s − C[s][c]||², every sum an explicit in-index-order
    sequential fold (Python float ops are IEEE doubles — the same op
    sequence as the oracle's list_sum over an index-ordered
    comprehension and Spark's F.aggregate fold)."""
    m, k, d_sub = books.shape
    lut = []
    for s in range(m):
        qs = qv[s * d_sub:(s + 1) * d_sub]
        row = []
        for c in range(k):
            acc = 0.0
            for i in range(d_sub):
                diff = float(qs[i]) - float(books[s, c, i])
                acc = acc + diff * diff
            row.append(acc)
        lut.append(row)
    return lut


def adc_topk(codes_wide: DataFrame, books: "np.ndarray",
             qv: "np.ndarray", k_out: int = 10,
             id_col: str = "vec_id") -> DataFrame:
    """Asymmetric-distance top-k over the CODE table. The query's LUT
    (m·k doubles) is inlined as literal arrays, each vector's distance
    is m element_at lookups combined by a FIXED left-associated
    addition (bit-reproducible — no aggregate reorder), the ranking
    key is the tie6-rounded distance with id tie-break. Plan: codes
    scan → literal-lookup projection → TakeOrdered(k) — one narrow
    pass, no join, no shuffle beyond the top-k."""
    lut = adc_lut(books, qv)
    m = len(lut)
    terms = [F.element_at(F.array(*[F.lit(v) for v in lut[s]]),
                          F.col("codes")[s] + 1)
             for s in range(m)]
    dist = terms[0]
    for t in terms[1:]:
        dist = dist + t
    return (codes_wide
            .select(F.col(id_col), tie_round(dist, 6).alias("adc_dist"))
            .orderBy(F.asc("adc_dist"), F.asc(id_col))
            .limit(k_out))
