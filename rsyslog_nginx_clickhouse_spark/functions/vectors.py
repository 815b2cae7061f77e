"""Vector column builders over ``array<float>`` embedding columns.

Pure Catalyst higher-order functions — ``zip_with`` + ``aggregate`` keep
the math JVM-side and codegen'd; no UDF, no serialization. Elements are
cast to double before accumulating and accumulation is strictly
left-to-right, which makes results bit-portable to the DuckDB oracle
(list_transform/list_sum accumulate in the same order).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(col: Column | str) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return col.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(_d(a), _d(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    # try_divide: a zero vector yields NULL instead of raising
    # DIVIDE_BY_ZERO under Spark 4's default ANSI mode
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    diffs = F.zip_with(_d(a), _d(b), lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x))


def q8_scale(a: Column | str) -> Column:
    """Per-vector int8 quantization scale: max|x| / 127 (symmetric
    scalar quantization — the 4× storage cut for 100 TB embedding
    tables)."""
    amax = F.array_max(F.transform(_d(a), F.abs))
    return amax / F.lit(127.0)


def quantize_int8(a: Column | str, scale: Column) -> Column:
    """array<int> of quantized values in [-127, 127].

    ``floor(x/scale + 0.5)`` rather than round(): an explicitly
    defined halfway rule that Spark and DuckDB evaluate identically
    (round() half-up vs half-even conventions differ by type/engine).
    A zero vector (scale 0) quantizes to zeros instead of dividing by
    zero."""
    q = F.transform(_d(a), lambda x: F.floor(x / scale + F.lit(0.5)))
    zeros = F.transform(_d(a), lambda x: F.lit(0).cast("long"))
    return F.when(scale == 0, zeros).otherwise(q).cast("array<int>")


def dequantize_int8(q: Column, scale: Column) -> Column:
    return F.transform(q, lambda x: x.cast("double") * scale)
