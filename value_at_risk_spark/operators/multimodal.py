"""Multimodal column plumbing (north-star surface).

Images/audio/video are opaque ``binary`` payloads with typed metadata.
The decode/feature-extract kernels need codec libraries not present in
this container, so the kernels are STUBBED (deterministic fake features
keyed on a content hash, or ``NotImplementedError`` for real decode) —
but the Spark-side plumbing is real: schema contract, Arrow-batched
``mapInPandas`` iteration, partition sizing, and batch shape are what
would ship at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", StringType()),  # binary in prod; hex str in tests
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def decode_image(payload: bytes):  # pragma: no cover - container lacks codecs
    """Real decode would use PIL/opencv — not in this container."""
    raise NotImplementedError("image codecs unavailable in this environment")


def _fake_feature(payload, dim: int = 16) -> list[float]:
    """Deterministic stand-in feature: seeded by content hash.

    Mirrors the reference's seed-by-row reproducibility contract
    (utils/var_udf.py:58-61) so tests are stable across partitioning.
    """
    import zlib

    h = zlib.crc32(str(payload).encode("utf-8")) & 0x7FFFFFFF
    rng = np.random.default_rng(h)
    return rng.standard_normal(dim).astype(float).tolist()


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Arrow-batched feature extraction over media rows via mapInPandas.

    The production shape: per-partition batch iterator, bounded memory
    (batch size via spark.sql.execution.arrow.maxRecordsPerBatch), and
    only (id, type, payload) columns read — column pruning keeps other
    metadata out of the Arrow transfer.
    """
    pruned = media.select("media_id", "media_type", "payload")

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "feature": [
                        _fake_feature(p, dim) for p in pdf["payload"]
                    ],
                }
            )

    return pruned.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame offset.

    Native explode over a computed offset sequence — the decode of each
    frame would happen in a downstream mapInPandas (stubbed here).
    """
    return media.filter(F.col("media_type") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_offset_ms"),
    )
