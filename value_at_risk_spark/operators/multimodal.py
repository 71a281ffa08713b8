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


def parse_media_headers(
    media: DataFrame, payload_col: str = "payload_bytes"
) -> DataFrame:
    """REAL binary metadata extraction (no codec libraries needed):
    sniff and parse WAV (RIFF) and BMP headers from a ``binary``
    column with stdlib ``struct`` — the metadata-harvest stage of a
    multimodal ingest pipeline (dims, sample rate, duration) that runs
    before any pixel/sample decode. Arrow-batched ``mapInPandas``;
    only (media_id, payload) cross the boundary; malformed payloads
    yield format='unknown' rather than failing the batch.

    Output: (media_id, format, width, height, sample_rate_hz,
    channels, duration_ms) — NULLs where a field doesn't apply.
    """
    import struct

    pruned = media.select("media_id", payload_col)

    def _parse_one(b: bytes):
        try:
            if len(b) >= 44 and b[0:4] == b"RIFF" and b[8:12] == b"WAVE":
                # fmt chunk: search for it (canonical files put it at 12)
                i = 12
                fmt = None
                data_size = None
                while i + 8 <= len(b):
                    cid = b[i : i + 4]
                    (csize,) = struct.unpack("<I", b[i + 4 : i + 8])
                    if cid == b"fmt ":
                        fmt = struct.unpack("<HHIIHH", b[i + 8 : i + 24])
                    elif cid == b"data":
                        data_size = csize
                    i += 8 + csize + (csize % 2)
                if fmt is not None:
                    _, channels, rate, _, block_align, _ = fmt
                    dur = None
                    if data_size is not None and rate > 0 and block_align > 0:
                        dur = int(data_size / block_align / rate * 1000)
                    return ("wav", None, None, rate, channels, dur)
            if len(b) >= 26 and b[0:2] == b"BM":
                w, h = struct.unpack("<ii", b[18:26])
                return ("bmp", w, abs(h), None, None, None)
        except (struct.error, IndexError):
            pass
        return ("unknown", None, None, None, None, None)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [_parse_one(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": [p[0] for p in parsed],
                    "width": pd.array([p[1] for p in parsed], dtype="Int64"),
                    "height": pd.array([p[2] for p in parsed], dtype="Int64"),
                    "sample_rate_hz": pd.array(
                        [p[3] for p in parsed], dtype="Int64"
                    ),
                    "channels": pd.array([p[4] for p in parsed], dtype="Int64"),
                    "duration_ms": pd.array(
                        [p[5] for p in parsed], dtype="Int64"
                    ),
                }
            )

    return pruned.mapInPandas(
        _parse,
        schema=(
            "media_id long, format string, width long, height long, "
            "sample_rate_hz long, channels long, duration_ms long"
        ),
    )
