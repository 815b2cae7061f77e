"""Z-order clustering: multi-column row-group skipping.

MergeTree's ``ORDER BY (a, b)`` only skips well on prefixes of the sort
key — predicates on ``b`` alone scan everything (same for our
``sortWithinPartitions``). Interleaving the bits of several columns
(Morton order) gives every interleaved column partial locality, so
parquet row-group min/max stats prune on ANY of them — the Delta
``OPTIMIZE ZORDER BY`` upgrade path flagged in SURVEY §1.3, here as a
plain column expression usable with vanilla parquet.

All bitwise — stays inside whole-stage codegen (bit ops are codegen'd,
unlike higher-order lambdas). Columns are min-max scaled to ``bits``-bit
ints from one tiny driver-side agg; quantile scaling would handle skew
better at the cost of an approxQuantile pass (documented trade).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def scale_to_int(col: Column, lo: float, hi: float,
                 bits: int = DEFAULT_BITS) -> Column:
    """Min-max scale a numeric column onto [0, 2^bits)."""
    span = max(hi - lo, 1e-12)
    maxv = (1 << bits) - 1
    scaled = ((col.cast("double") - F.lit(lo)) / F.lit(span)) * maxv
    return F.least(F.greatest(F.round(scaled).cast("long"), F.lit(0)),
                   F.lit(maxv))


def interleave_bits(cols: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton code: bit i of column j lands at position i*len(cols)+j.

    Total positions are capped at 63: position 63 is the sign bit
    (negative keys invert the range-sort) and Java shifts wrap mod 64
    (verified — shiftleft(1, 64) == 1), so bits is auto-reduced when
    many columns are interleaved.
    """
    n = len(cols)
    bits = min(bits, 63 // n)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_key(df: DataFrame, cols: list[str],
               bits: int = DEFAULT_BITS) -> Column:
    """Build the z-order sort key for ``cols`` (numeric/timestamp).

    The min/max bounds come from one driver-side aggregate over the
    input — O(columns) values, never data. At 100 TB run the bounds agg
    on a sample or keep running bounds in table metadata.
    """
    bounds = df.agg(*[f(F.col(c).cast("double")).alias(f"{m}_{c}")
                      for c in cols
                      for m, f in (("min", F.min), ("max", F.max))]) \
               .collect()[0]
    for c in cols:
        if bounds[f"min_{c}"] is None:
            raise ValueError(
                f"zorder_key: column {c!r} has no non-null values — "
                f"cannot derive scaling bounds")
    bits = min(bits, 63 // len(cols))
    scaled = [scale_to_int(F.col(c), bounds[f"min_{c}"], bounds[f"max_{c}"],
                           bits) for c in cols]
    return interleave_bits(scaled, bits)


def write_zordered(df: DataFrame, path: str, zcols: list[str],
                   mode: str = "overwrite", bits: int = DEFAULT_BITS,
                   files: int = 8) -> None:
    """Write parquet clustered by the z-order of ``zcols``: range-
    repartition + sort on the Morton key so each file owns a compact
    z-range → min/max stats on EVERY zcol are selective."""
    key = zorder_key(df, zcols, bits)
    (df.withColumn("__z", key)
       .repartitionByRange(files, "__z")
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode(mode).parquet(path))
