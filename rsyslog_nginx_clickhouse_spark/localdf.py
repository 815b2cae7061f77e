"""Parameter-sized local rows → DataFrame through the Arrow path.

``spark.createDataFrame(list_of_tuples, schema)`` builds a DataFrame
backed by a PYTHON RDD: every downstream action (a parquet write of
trained centroids, the collect feeding a broadcast) round-trips the
rows through pickled Python workers. Measured at round 14: writing a
1024-row centroid table that way costs 5–7 s; the same rows through a
pandas DataFrame (Arrow conversion, JVM-local relation) cost 0.15 s —
a 30× difference that taxed every operator materializing trained
parameters (IVF centroids, PQ codebooks, BPE merge tables, GEMM block
geometry).

The helper keeps the exact call shape: positional tuples + a DDL
schema string. Pandas columns are matched to the schema POSITIONALLY
(verified: ints arrive as the declared int/bigint width, None → NULL).
Only flat scalar schemas belong here — nested types take different
coercion paths through Arrow, and no caller needs them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def local_rows(spark: SparkSession, rows: Sequence[tuple],
               schema: str) -> DataFrame:
    """Arrow-path replacement for createDataFrame(rows, ddl_schema)."""
    import pandas as pd

    if not rows:
        # a 0-row pandas frame has no columns to match — the plain
        # path handles the empty case fine (no Python worker runs)
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(pd.DataFrame(list(rows)), schema=schema)
