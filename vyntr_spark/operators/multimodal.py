"""Multimodal column plumbing for training-data pipelines.

Images/audio/video ride as opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schema, Arrow batch shape, partition
behavior, mapInPandas signatures — is real and tested; the actual codec
work is stubbed deterministically because no image/audio libraries ship
in this environment (clearly marked below; swap `_fake_decode` for a
PIL/torchaudio call in production).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def _fake_decode(payload: bytes, kind: str) -> dict:
    """STUB — deterministic fake decode. Production would decode with
    PIL / soundfile / pyav here; the environment has no codec libraries,
    so dimensions/features derive from a hash of the payload (stable,
    testable plumbing)."""
    h = hashlib.md5(payload).digest()
    width = height = None
    duration = None
    if kind == "image":
        width = 64 + h[0] % 1024
        height = 64 + h[1] % 1024
    elif kind in ("audio", "video"):
        duration = 1000 + int.from_bytes(h[2:5], "big") % 600_000
        if kind == "video":
            width = 320 + h[0] % 1600
            height = 240 + h[1] % 840
    feature = [((h[i % 16] / 255.0) * 2 - 1) for i in range(8)]
    return {
        "n_bytes": len(payload),
        "width": width,
        "height": height,
        "duration_ms": duration,
        "feature": feature,
    }


def decode_media(df: DataFrame) -> DataFrame:
    """mapInPandas decode: Arrow-batched, one Python process per task,
    constant memory per batch (the pattern a real codec UDF would use)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [], "width": [], "height": [],
                "duration_ms": [], "feature": [],
            }
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                d = _fake_decode(bytes(payload), kind)
                out["n_bytes"].append(d["n_bytes"])
                out["width"].append(d["width"])
                out["height"].append(d["height"])
                out["duration_ms"].append(d["duration_ms"])
                out["feature"].append(d["feature"])
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, DECODED_SCHEMA)


def resize_plan(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning as native exprs (the decision logic stays JVM-side;
    only the pixel work would enter Python)."""
    scale = F.when(
        F.greatest("width", "height") > max_side,
        F.lit(max_side) / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    return df.withColumn("resize_scale", F.round(scale, 4)).withColumn(
        "out_w", F.ceil(F.col("width") * F.col("resize_scale")).cast("int")
    ).withColumn(
        "out_h", F.ceil(F.col("height") * F.col("resize_scale")).cast("int")
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: timestamps to decode,
    as an array column (exploded downstream by the decode stage)."""
    return df.filter(F.col("kind") == "video").withColumn(
        "sample_ts_ms",
        F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms)),
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a synthetic media table from the documents table (binary
    payload = utf-8 text bytes) — exercises the binary column path with
    deterministic content."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )
