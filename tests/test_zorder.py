"""Z-order clustering: Morton math + the skipping it exists to enable."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from rsyslog_nginx_clickhouse_spark.plans.zorder import (
    interleave_bits,
    write_zordered,
    zorder_key,
)


def test_interleave_bits_known_values(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    # bit i of col j → position i*2+j:
    # a=101: bits 0,2 → positions 0,4 ; b=011: bits 0,1 → positions 1,3
    want = (1 << 0) | (1 << 4) | (1 << 1) | (1 << 3)  # 0b11011 = 27
    got = df.select(interleave_bits([F.col("a"), F.col("b")], bits=3)
                    .alias("z")).collect()[0]["z"]
    assert got == want


def test_zorder_key_orders_both_dims_locally(spark):
    df = spark.createDataFrame(
        [(float(x), float(y)) for x in range(8) for y in range(8)],
        "x double, y double")
    rows = df.select("x", "y", zorder_key(df, ["x", "y"], bits=3)
                     .alias("z")).collect()
    z = {(r["x"], r["y"]): r["z"] for r in rows}
    # classic Morton property: the curve visits quadrants hierarchically
    assert z[(0.0, 0.0)] == 0
    top_left = {z[(x, y)] for x in (0.0, 1.0, 2.0, 3.0)
                for y in (0.0, 1.0, 2.0, 3.0)}
    bottom_right = {z[(x, y)] for x in (4.0, 5.0, 6.0, 7.0)
                    for y in (4.0, 5.0, 6.0, 7.0)}
    assert max(top_left) < min(bottom_right)


def test_zordered_files_are_selective_on_both_columns(spark, tmp_path):
    import pyarrow.parquet as pq

    n = 4096
    df = spark.range(n).select(
        (F.col("id") % 64).cast("double").alias("x"),
        (F.col("id") / 64).cast("long").cast("double").alias("y"))
    path = str(tmp_path / "z")
    write_zordered(df, path, ["x", "y"], files=8)

    spans_x, spans_y = [], []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            stats = {md.row_group(rg).column(i).path_in_schema:
                     md.row_group(rg).column(i).statistics
                     for i in range(md.row_group(rg).num_columns)}
            spans_x.append(stats["x"].max - stats["x"].min)
            spans_y.append(stats["y"].max - stats["y"].min)
    # each file/row-group covers a fraction of BOTH dimensions' range —
    # a plain (x, y) sort would cover the full y range in every x-run
    assert sum(spans_x) / len(spans_x) <= 63 * 0.75
    assert sum(spans_y) / len(spans_y) <= 63 * 0.75
    # and the data itself round-trips
    assert spark.read.parquet(path).count() == n
