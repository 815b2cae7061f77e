"""Perceptual image hashing + Hamming near-dup join — the image half
of the dedup family (ties operators/multimodal.py's real decoders into
the operators/dedup.py machinery; the image analog of SimHash text
dedup).

Two 64-bit hashes over the decoded 8×8 grayscale:

- ``image_ahash64`` — average hash: bit p set iff pixel p is brighter
  than the image mean. Computed INTEGER-EXACTLY (``64·g_p > Σg``, no
  float mean), so a SQL oracle can replay every bit from known pixel
  values — this is the registry-gated variant.
- ``image_phash64`` — pHash proper: 2-D DCT of the grayscale, low-
  frequency 8×8 block minus DC, bit = coefficient > median. More
  robust to brightness/contrast shifts; float-valued (DCT + median),
  so it is pinned by tests against an independent numpy replay rather
  than the cross-engine value gate (a last-ulp difference at the
  median threshold could flip a bit between engines).

Near-dup pairs use the same pigeonhole chunk-LSH as text SimHash
(operators/simhash.py): split 64 bits into ``budget + 1`` chunks — any
pair within the Hamming budget agrees exactly on ≥ 1 chunk — so the
candidate join is an equi-join per chunk and the exact popcount
verifies. At 100 TB the shuffle carries (id, hash) pairs only — 16
bytes a row, never pixels; per-bucket work is bounded by bucket size
like every LSH family here.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
    decode_image,
    resize_image,
)

HASH_SIDE = 8  # hashes are computed on an 8×8 grayscale


def _gray8(img: np.ndarray) -> np.ndarray:
    """Decoded (H, W, 3) image → 8×8 float64 grayscale (channel mean,
    nearest-neighbor resize when the source is not already 8×8)."""
    if img.shape[:2] != (HASH_SIDE, HASH_SIDE):
        img = resize_image(img, HASH_SIDE, HASH_SIDE)
    return np.asarray(img, dtype=np.float64).mean(axis=2)


def _pack_bits_msb(bits: np.ndarray) -> int:
    """64 bools (p=0 → MSB) → two's-complement int64 value."""
    v = 0
    for b in bits.ravel():
        v = (v << 1) | int(bool(b))
    return v - (1 << 64) if v >= (1 << 63) else v


def image_ahash64(img: np.ndarray) -> int:
    """Average hash, integer-exact: bit p ⇔ 64·gray_p > Σ gray.

    For equal-channel images (every decoder here renders r=g=b) the
    grayscale is integer-valued, so both sides of the comparison are
    exact integers — the SQL oracle replays the identical bits with no
    float mean in sight. A constant image hashes to 0 (no pixel is
    strictly brighter than the mean)."""
    g = _gray8(img)
    scaled = g * (HASH_SIDE * HASH_SIDE)
    return _pack_bits_msb(scaled > g.sum())


def image_phash64(img: np.ndarray) -> int:
    """pHash: 2-D DCT-II of the 8×8 grayscale, flatten the coefficient
    block in raster order EXCLUDING DC, bit = coefficient > median of
    those 63 (median of an odd count = an element, so exactly 31 bits
    set unless ties); bit 0 (MSB) is the first post-DC coefficient."""
    from rsyslog_nginx_clickhouse_spark.operators.multimodal import (
        _JPEG_DCT_A,
    )

    g = _gray8(img)
    coef = _JPEG_DCT_A @ g @ _JPEG_DCT_A.T  # forward DCT (A is orthonormal)
    flat = coef.ravel()[1:]
    bits = np.concatenate([flat > np.median(flat), [False]])
    return _pack_bits_msb(bits)


def image_hashes(multimodal: DataFrame, kind: str = "ahash",
                 id_col: str = "doc_id") -> DataFrame:
    """(id, img_hash: long) via one Arrow-batched mapInPandas over the
    binary payloads — decode + hash per batch, pixels never leave the
    task."""
    fn = {"ahash": image_ahash64, "phash": image_phash64}[kind]
    id_type = multimodal.schema[id_col].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "img_hash": [fn(decode_image(bytes(p)))
                             for p in pdf["payload"]],
            })

    return multimodal.mapInPandas(
        run, schema=f"{id_col} {id_type}, img_hash long")


def image_hash_pairs(multimodal: DataFrame, kind: str = "ahash",
                     max_hamming: int = 3,
                     id_col: str = "doc_id") -> DataFrame:
    """Near-dup image pairs (id_a < id_b, hamming ≤ budget) — the
    pigeonhole chunk-LSH join from text SimHash over image hashes."""
    from rsyslog_nginx_clickhouse_spark.operators.dedup import barrier
    from rsyslog_nginx_clickhouse_spark.operators.simhash import _chunk

    n_chunks = max_hamming + 1
    base, extra = divmod(64, n_chunks)
    widths = [base + (1 if i < extra else 0) for i in range(n_chunks)]
    offsets = [sum(widths[:i]) for i in range(n_chunks)]
    fp = image_hashes(multimodal, kind, id_col).transform(barrier)
    chunks = fp.select(
        F.col(id_col), F.col("img_hash"),
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("ci"),
                     _chunk(F.col("img_hash"), offsets[i], widths[i])
                     .alias("cv"))
            for i in range(n_chunks)
        ])).alias("c"),
    ).select(id_col, "img_hash", F.col("c.ci").alias("ci"),
             F.col("c.cv").alias("cv"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (a.join(b, ["ci", "cv"])
             .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"),
                     F.col("a.img_hash").alias("fp_a"),
                     F.col("b.img_hash").alias("fp_b"))
             .distinct())
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (cand.select("id_a", "id_b", hamming.cast("int")
                        .alias("hamming"))
                .where(F.col("hamming") <= max_hamming))
