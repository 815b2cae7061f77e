"""Synthesize an sf1-equivalent documents/embeddings pair (10× sf0.1)
for the scaling probe's one-step-beyond-bench check (VERDICT r3 item 8).

NOT test input — the correctness gate runs only on the driver-provided
/root/testdata parquet. This exists purely so tools/scalecheck.py can
take one more 10× step on the dedup/ANN family and surface any
super-linearity that fixed overheads mask at sf0.1.

Construction keeps the DUPLICATE DENSITY of the source corpus constant
(the property that makes the probe honest): each of the 10 replicas
suffixes every token with the replica id, so shingle sets NEVER
overlap across replicas — the corpus is 10 independent copies of
sf0.1's dup structure, not a corpus where every doc suddenly has 9
near-identical siblings (which would grow pair counts in the DATA and
read as a fake super-linearity in the ENGINE). Embeddings are rolled
by the replica id (np.roll preserves norms, scrambles cross-replica
cosine structure) with doc_ids offset the same way.

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

    nd = spark.read.parquet(os.path.join(out, "documents.parquet")).count()
    ne = spark.read.parquet(os.path.join(out, "embeddings.parquet")).count()
    print(f"wrote {out}: documents={nd} embeddings={ne}")


if __name__ == "__main__":
    main()
