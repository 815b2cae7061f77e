"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the payload is a ``binary``
column (or a (path, offset, length) pointer into an object store), the
metadata a typed struct; decode / feature-extract / resize / frame-
sample run as Arrow-batched ``mapInPandas`` so each task streams batches
without materializing the whole partition.

The actual codec step is STUBBED (image/audio libs aren't in this
container): ``decode_stub`` raises NotImplementedError unless
``fake=True``, in which case it produces a deterministic fake feature
vector derived from the payload bytes — making the Spark-side plumbing
(schema, batching, partitioning) fully real and testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

#: Output schema of the feature-extraction stage (id column/type are
#: substituted from the input — see extract_features).
FEATURES_SCHEMA = (
    "{id_col} {id_type}, n_bytes int, content_hash string, "
    "features array<float>"
)


def attach_binary(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Model a multimodal table: payload = utf-8 bytes of the text
    (stand-in for image/audio bytes), metadata struct alongside.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit("application/octet-stream").alias("content_type"),
        F.length(payload).alias("n_bytes"),
    )
    return docs.select(F.col(id_col), payload.alias("payload"),
                       meta.alias("meta"))


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic fake 'decoder': md5(payload) → FEATURE_DIM floats.

    Replace with a real codec (PIL/torchaudio/ffmpeg) outside this
    container; signature and batch shape stay identical.
    """
    h = hashlib.md5(payload).digest()
    raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[:FEATURE_DIM * 4],
                        dtype=np.uint32)
    return (raw / np.float64(0xFFFFFFFF)).astype(np.float32)


def decode_stub(payload: bytes, fake: bool = False) -> np.ndarray:
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        "real image/audio decode requires codec libraries not present in "
        "this container; call with fake=True for the deterministic stub")


def extract_features(multimodal: DataFrame, fake: bool = True,
                     id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction: binary payload → feature vector.

    Arrow-batched; each batch is decoded in bulk. Partitioning is
    inherited from the scan — at 100 TB pair with
    ``spark.sql.files.maxPartitionBytes`` so one task holds one
    batch-sized slice of payloads. The id column name AND type come
    from the input schema (attach_binary parameterizes id_col, so a
    hardcoded 'doc_id long' broke renamed or string ids).
    """
    id_type = multimodal.schema[id_col].dataType.simpleString()
    schema = FEATURES_SCHEMA.format(id_col=id_col, id_type=id_type)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(p, fake=fake).tolist() for p in pdf["payload"]]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "content_hash": [hashlib.md5(p).hexdigest() for p in pdf["payload"]],
                "features": feats,
            })

    return multimodal.mapInPandas(run, schema=schema)


FRAME_BYTES = 16


def frame_sample(multimodal: DataFrame, frame_bytes: int = FRAME_BYTES,
                 stride: int = 4, id_col: str = "doc_id") -> DataFrame:
    """Frame-sampling plumbing for video-like payloads.

    Splits the binary payload into fixed ``frame_bytes`` chunks, keeps
    every ``stride``-th frame, emits (id, frame_idx, frame_hash).
    The chunk/sample schedule is the real scale-path logic (a video
    pipeline samples frames the same way, with a codec instead of md5);
    mapInPandas streams Arrow batches so a task never materializes all
    frames of its partition at once. Id column name/type are taken
    from the input schema like extract_features.
    """
    id_type = multimodal.schema[id_col].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for rid, payload in zip(pdf[id_col], pdf["payload"]):
                data = bytes(payload)
                n_frames = (len(data) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, stride):
                    ids.append(rid)
                    idxs.append(i)
                    hashes.append(hashlib.md5(
                        data[i * frame_bytes:(i + 1) * frame_bytes]).hexdigest())
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs,
                                "frame_hash": hashes})

    return multimodal.mapInPandas(
        run,
        schema=f"{id_col} {id_type}, frame_idx int, frame_hash string")


def resize_stub(features: "np.ndarray", out_dim: int = 4,
                fake: bool = False) -> "np.ndarray":
    """'Resize' stand-in: average-pool the feature vector to ``out_dim``.

    Real image resize needs codec libs absent here; the pooling is the
    deterministic fake with the same signature/batch shape.
    """
    if not fake:
        raise NotImplementedError(
            "real image resize requires codec libraries not present in "
            "this container; call with fake=True for the pooling stub")
    f = np.asarray(features, dtype=np.float64)
    return f.reshape(out_dim, -1).mean(axis=1).astype(np.float32)
