"""Greedy sequence packing — the example-packing step of a pretraining
pipeline: concatenate documents into fixed-capacity training sequences
(bins) with minimal padding waste.

The algorithm is NEXT-FIT in a DETERMINISTIC order (docs sorted by id
within each shard; a new bin opens when the next doc would overflow).
Next-fit rather than first-fit-decreasing is the deliberate choice:
it is one sequential pass with O(1) state — streamable at ingest — and
its assignment depends only on the data, never on partitioning or
arrival order, which is what makes the whole plan value-oracle-able
(the DuckDB oracle replays the identical recurrence as a recursive
CTE, the dedup_components precedent). FFD would pack ~a few % tighter
but needs the global size distribution up front and a mutable
bin-state search per doc.

Scale shape: shards pack INDEPENDENTLY — one shuffle on the shard key,
then a linear pandas pass per shard inside applyInPandas (the
window_funnel precedent: per-row Python, but over Arrow-batched groups
and O(1) state per group, millions of shards amortize the boundary).
Shard count is the parallelism knob; a 100 TB corpus packs with
shards ~= cores, each shard a few GiB of (id, size) pairs — the pass
carries ids and sizes only, never text. The bin layout is emitted as
(doc → bin, bin_offset), which the downstream gather join uses to build
the physical sequences.

Oversize docs (size > capacity): the recurrence gives them a bin of
their own (anything after them overflows immediately) — the caller
chunks them first (doc_chunk_windows) or drops them; the packer never
splits a document.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def greedy_pack(df: DataFrame, capacity: int, shard_col: str = "shard",
                id_col: str = "doc_id",
                size_col: str = "size") -> DataFrame:
    """Pack (shard, id, size) rows into bins of ``capacity``: within
    each shard, docs in ascending id order go into the current bin
    while they fit; otherwise a new bin opens. Returns one row per doc:
    (shard, id, size, bin_id, bin_offset) with bin_offset = fill before the
    doc — enough to materialize packed sequences with one gather.
    """
    out_schema = (f"{shard_col} int, {id_col} bigint, {size_col} bigint, "
                  f"bin_id bigint, bin_offset bigint")

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        bins, offs = [], []
        fill, bin_id = 0, -1
        for size in pdf[size_col]:
            if bin_id < 0 or fill + size > capacity:
                bin_id += 1
                fill = 0
            offs.append(fill)
            bins.append(bin_id)
            fill += size
        pdf = pdf.assign(bin_id=bins, bin_offset=offs)
        return pdf[[shard_col, id_col, size_col, "bin_id", "bin_offset"]]

    return (df.select(F.col(shard_col).cast("int").alias(shard_col),
                      F.col(id_col).cast("bigint").alias(id_col),
                      F.col(size_col).cast("bigint").alias(size_col))
              .groupBy(shard_col).applyInPandas(pack, out_schema))


def packing_stats(packed: DataFrame, capacity: int,
                  shard_col: str = "shard") -> DataFrame:
    """Per-shard packing summary: bins used, docs, total payload, and
    padding waste = bins·capacity − payload (the quantity next-fit
    bounds at < 2× optimal; useful as the pipeline's efficiency
    gauge)."""
    return (packed.groupBy(shard_col)
            .agg(F.countDistinct("bin_id").alias("n_bins"),
                 F.count("*").alias("n_docs"),
                 F.sum("size").alias("payload"))
            .withColumn("waste",
                        F.col("n_bins") * capacity - F.col("payload")))
