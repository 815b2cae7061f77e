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
    """Arrow-path replacement for createDataFrame(rows, ddl_schema).

    The pandas columns match the schema POSITIONALLY, so a ragged or
    misordered tuple would silently misassign values where the tuple
    path fails loudly — the arity is therefore checked here (ADVICE
    r14). Integer columns must not carry None: pandas coerces such a
    column to float64 and the Arrow cast would truncate rather than
    NULL (no current caller does — trained-parameter tables are
    dense; use the plain tuple path for nullable-int rows).
    """
    import pandas as pd

    if not rows:
        # a 0-row pandas frame has no columns to match — the plain
        # path handles the empty case fine (no Python worker runs)
        return spark.createDataFrame([], schema)
    from pyspark.sql.types import StructType

    n_fields = len(StructType.fromDDL(schema))
    widths = {len(r) for r in rows}
    if widths != {n_fields}:
        raise ValueError(
            f"local_rows: schema declares {n_fields} field(s) but "
            f"rows carry {sorted(widths)} value(s) — positional "
            f"matching would misassign columns")
    return spark.createDataFrame(pd.DataFrame(list(rows)), schema=schema)
