"""Synthesize sf1-equivalent tables (10× sf0.1) for the scaling
probe's one-step-beyond-bench check (VERDICT r3 item 8; r5 item 5
extends it to the join suite).

NOT test input — the correctness gate runs only on the driver-provided
/root/testdata parquet. This exists purely so tools/scalecheck.py can
take one more 10× step and surface any super-linearity that fixed
overheads mask at sf0.1.

Construction keeps the per-key STRUCTURE of the source constant (the
property that makes the probe honest) — the output is 10 independent
key-disjoint shards of sf0.1, exactly how TPC-H itself scales:

- documents: each replica suffixes every token with the replica id,
  so shingle sets NEVER overlap across replicas — 10 independent
  copies of sf0.1's dup structure, not a corpus where every doc
  suddenly has 9 near-identical siblings (which would grow pair
  counts in the DATA and read as fake engine super-linearity);
- embeddings: vectors rolled by replica id (norm-preserving, breaks
  cross-replica cosine structure), ids offset;
- orders/lineitem/customer/supplier/part: every join key
  (orderkey/custkey/partkey/suppkey) offset by replica·stride, so
  join fan-in, group sizes, and selectivities are IDENTICAL to sf0.1
  while the fact tables grow 10× — the right scaling for
  q21/q9/q2/q18/bucketed_join_revenue;
- nation/region: copied verbatim (shared dimensions, as in TPC-H).

- events (VERDICT r10 item 6): 10 USER-disjoint shards —
  user_id/event_id offset by replica·stride, ts and event_type kept —
  so per-user sequence/funnel/session structure is IDENTICAL to
  sf0.1 while each calendar day carries 10× the rows: the same
  "more users, same days" shape real event growth has. A verbatim
  copy (same ids) would instead read as fake 1× scaling for
  per-user queries; this keeps the probe honest for the whole
  events family (any_join_sql, group_array_sql,
  sample_rowcount_scan, topk_sql, …).

Usage: python tools/sf1gen.py [out_dir]   (default /tmp/scalecheck_sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rsyslog_nginx_clickhouse_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
REPLICAS = 10
ID_STRIDE = 10_000_000


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scalecheck_sf1"
    spark = get_spark("sf1gen")

    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    reps = spark.range(REPLICAS).select(F.col("id").alias("__rep"))
    big_docs = (docs.crossJoin(reps)
                .withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda t: F.concat(t, F.lit("_"),
                                               F.col("__rep"))),
                        " "))
                .withColumn("doc_id",
                            F.col("doc_id")
                            + F.col("__rep") * F.lit(ID_STRIDE))
                .drop("__rep"))
    big_docs.write.mode("overwrite") \
        .parquet(os.path.join(out, "documents.parquet"))

    emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    # roll the vector by __rep: slice+concat keeps it pure Catalyst
    rolled = F.concat(
        F.slice(F.col("embedding"), F.col("__rep") + 1,
                F.size(F.col("embedding")) - F.col("__rep")),
        F.slice(F.col("embedding"), F.lit(1), F.col("__rep")))
    big_emb = (emb.crossJoin(reps)
               .withColumn("embedding", rolled)
               .withColumn("vec_id",
                           F.col("vec_id")
                           + F.col("__rep") * F.lit(ID_STRIDE))
               .drop("__rep"))
    big_emb.write.mode("overwrite") \
        .parquet(os.path.join(out, "embeddings.parquet"))

    # the join suite: fact/dim tables as 10 key-disjoint shards
    keyed = {
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
    }
    for tbl, keys in keyed.items():
        df = spark.read.parquet(os.path.join(SRC, f"{tbl}.parquet"))
        big = df.crossJoin(reps)
        for k in keys:
            big = big.withColumn(
                k, F.col(k) + F.col("__rep") * F.lit(ID_STRIDE))
        big.drop("__rep").write.mode("overwrite") \
            .parquet(os.path.join(out, f"{tbl}.parquet"))
    ev = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    big_ev = (ev.crossJoin(reps)
              .withColumn("user_id",
                          F.col("user_id")
                          + F.col("__rep") * F.lit(ID_STRIDE))
              .withColumn("event_id",
                          F.col("event_id")
                          + F.col("__rep") * F.lit(ID_STRIDE))
              .drop("__rep"))
    big_ev.write.mode("overwrite") \
        .parquet(os.path.join(out, "events.parquet"))

    for tbl in ("nation", "region"):
        spark.read.parquet(os.path.join(SRC, f"{tbl}.parquet")) \
            .write.mode("overwrite") \
            .parquet(os.path.join(out, f"{tbl}.parquet"))

    counts = {t: spark.read.parquet(os.path.join(out, f"{t}.parquet"))
              .count()
              for t in ("documents", "embeddings", "orders", "lineitem")}
    print(f"wrote {out}: " + " ".join(f"{t}={n}"
                                      for t, n in counts.items()))


if __name__ == "__main__":
    main()
