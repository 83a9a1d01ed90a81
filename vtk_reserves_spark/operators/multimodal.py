"""Multimodal (image/audio/video) column plumbing.

North-star addition (SURVEY.md §2.8; the reference's closest analog is
its pixel-table ingest, ``_gui.py:1251-1264``).  Media ride as opaque
``binary`` payload columns with a typed metadata struct; decode /
feature-extraction / frame-sampling run as Arrow-batched
``mapInPandas`` stages so payload bytes never pass through the driver
and partition boundaries are preserved.

The actual codec step is STUBBED: image/audio libraries are not in this
container, so :func:`decode_media` raises ``NotImplementedError`` unless
``fake=True``, which substitutes a deterministic byte-arithmetic fake
whose outputs are reproducible (and SQL-expressible for the oracle).
The Spark-side plumbing — schema, batch iteration, UDF signatures,
partitioning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried alongside every payload
MEDIA_META = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


def attach_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", modality: str = "image"
) -> DataFrame:
    """Wrap a column's bytes as an opaque media payload + metadata struct
    (stand-in for real image/audio bytes in the synthetic corpus)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(f"{modality}/x-fake").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, mime: str, fake: bool = False):
    """Decode one payload.  Real codecs are unavailable in this
    environment; callers must opt into the deterministic fake."""
    if not fake:
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg/librosa) are not available in this "
            "container; pass fake=True for the deterministic stand-in"
        )
    n = len(payload)
    return {
        "width": n % 640,
        "height": n % 480,
        "mean_byte": (sum(payload[:64]) / min(n, 64)) if n else 0.0,
    }


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, meta):
    mapInPandas keeps bytes executor-side and processes whole record
    batches per call — the shape real decoders plug into."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_media(p, m, fake=fake)
                for p, m in zip(pdf["payload"], pdf["meta"].map(lambda s: s["mime"]))
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "mean_byte": [f["mean_byte"] for f in feats],
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


def resize_media(
    df: DataFrame, out_w: int, out_h: int, fake: bool = True
) -> DataFrame:
    """Resize plumbing over (doc_id, payload, meta): Arrow-batched
    mapInPandas, bytes stay executor-side, output is the resized
    geometry plus a checkable reduction of the resampled bytes.

    The codec step is STUBBED (no imaging libs in this container): the
    deterministic fake is nearest-neighbor resampling of the raw byte
    stream to out_w·out_h samples — sample i reads input byte
    ``(i·n) // m`` (m = out_w·out_h), the same index math a real
    nearest-neighbor image resize applies per axis.  A real
    decode→resize→encode chain slots into the same batch loop and
    schema.  ``fake=False`` raises like :func:`decode_media`."""
    if not fake:
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg) are not available in this "
            "container; pass fake=True for the deterministic stand-in"
        )
    import numpy as np

    m = out_w * out_h

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means: list[float | None] = []
            for p in pdf["payload"]:
                b = np.frombuffer(p, dtype=np.uint8)
                n = b.size
                if n == 0:
                    means.append(None)
                    continue
                idx = (np.arange(m, dtype=np.int64) * n) // m
                means.append(float(b[idx].mean()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "out_w": out_w,
                    "out_h": out_h,
                    "n_bytes": m,
                    "mean_byte": means,
                }
            )

    return df.mapInPandas(run, RESIZE_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 40) -> DataFrame:
    """Frame sampling plumbing: derive a frame count from the payload
    size and explode one row per sampled frame with its byte offset —
    the partition-preserving explode a real video sampler would use."""
    n_frames = (F.col("meta.n_bytes") / every_n_bytes).cast("int") + 1
    frames = F.sequence(F.lit(0), n_frames - 1)
    return df.select(
        "doc_id",
        F.explode(frames).alias("frame_idx"),
    ).withColumn("byte_offset", F.col("frame_idx") * every_n_bytes)
