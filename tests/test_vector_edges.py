"""Adversarial-corpus oracle parity for the VECTOR family — the
embeddings twin of test_oracle_edges.py: run the real registry
queries and their DuckDB oracles over vectors the driver's testdata
doesn't contain, and require the same rowcount/schema/value agreement
the driver's gate checks.

What the corpus stresses, by construction:
- a ZERO vector (cosine = x/0: Spark try_divide NULL vs DuckDB
  NULL — verified consistent; also an IVF/PQ seed, exercising the
  zero-guards in training);
- EXACT duplicates and a scaled copy (cos = 1.0 exactly and equal
  ADC distances → the (score, id) tie-break must agree cross-engine);
- an antipodal vector (cos = −1);
- DYADIC sparse vectors (components on the 2^-10 grid → dot products
  and squared distances are exact dyadic rationals, the class that
  can sit exactly ON a 6-decimal rounding tie — the hazard
  functions/rounding.py's floor sequence exists for);
- every component a multiple of 2^-10 in [−1, 1], so the Lloyd
  trainers' 2^50-integrality assertion holds and |v| < 2.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsyslog_nginx_clickhouse_spark.queries import load_all

DIM = 64

VECTOR_QUERIES = [
    "embedding_norms", "embedding_quantization", "knn_bruteforce",
    "knn_lsh", "knn_label_accuracy", "embedding_neardup_exact",
    "embedding_neardup_pairs", "label_centroids",
    "ivf_build", "knn_ivf", "knn_join_ivf", "ivf_append_probe",
    "pq_encode", "knn_pq_adc",
    # r8: filtered-kNN hard negatives — the label-exclusion path over
    # the adversarial corpus (zero vector, exact dups, antipodal,
    # dyadic tie grid)
    "hard_negative_mining", "semantic_dedup",
]


def _edge_vectors() -> list[tuple[int, list[float], int]]:
    rng = np.random.RandomState(7)
    base = np.round(rng.uniform(-1, 1, DIM) * 1024) / 1024  # 2^-10 grid
    base = base.astype(np.float32)

    def grid(v):
        return (np.round(v * 1024) / 1024).astype(np.float32)

    rows = []
    rows.append((0, np.zeros(DIM, dtype=np.float32), 0))   # zero vector
    rows.append((1, base, 0))                               # the probe
    rows.append((2, base.copy(), 1))                        # exact dup
    rows.append((3, (-base).astype(np.float32), 1))         # antipodal
    sparse = np.zeros(DIM, dtype=np.float32)
    sparse[3] = 0.0625
    sparse[17] = 0.0625                                     # dyadic: |v|²=2^-7
    rows.append((4, sparse, 0))
    rows.append((5, sparse.copy(), 1))                      # dup of dyadic
    half = grid(base * 0.5)                                 # same-ish direction
    rows.append((6, half, 0))
    for i in range(7, 40):                                  # grid-quantized noise
        rows.append((i, grid(rng.uniform(-1, 1, DIM)), i % 2))
    return [(i, [float(x) for x in v], lab) for i, v, lab in rows]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("vec_edge"))
    df = spark.createDataFrame(
        _edge_vectors(),
        "vec_id long, embedding array<float>, label int")
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "embeddings.parquet"))
    return d


@pytest.mark.parametrize("name", VECTOR_QUERIES)
def test_vector_oracle_agrees_on_edge_corpus(spark, edge_dir, name):
    q = load_all()[name]
    sdf = q.spark(spark, edge_dir)
    scols = sorted(sdf.columns)
    srows = sorted(
        (tuple(r[c] for c in scols) for r in sdf.collect()),
        key=lambda t: tuple((v is None, v) for v in t))
    spark.catalog.clearCache()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM parquet_scan("
        f"'{os.path.join(edge_dir, 'embeddings.parquet')}/*.parquet')")
    res = con.execute(q.oracle)
    ocols = [dsc[0] for dsc in res.description]
    rows = res.fetchall()
    colmap = {c: i for i, c in enumerate(ocols)}
    orows = sorted(
        (tuple(r[colmap[c]] for c in sorted(ocols)) for r in rows),
        key=lambda t: tuple((v is None, v) for v in t))

    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows), f"rowcount {len(srows)} vs {len(orows)}"
    assert srows == orows
