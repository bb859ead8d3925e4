"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata.

The real codec libraries (Pillow, ffmpeg, torchaudio, ...) are not in
this container, so the decode step is STUBBED: ``decode_image`` /
``decode_audio`` raise ``NotImplementedError`` unless the optional
dependency imports.  Everything Spark-side is real and tested —
schemas, Arrow batch shape, partitioning, the mapInPandas signatures —
against a deterministic synthetic container format (``MGB1``: magic +
kind + width/height/duration header + payload) produced by
``synth_assets``, whose header parse stands in for the codec.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "synth_assets",
    "write_assets_parquet",
    "extract_asset_meta",
    "byte_histogram_features",
    "decode_image",
    "sample_frames",
]

_MAGIC = b"MGB1"
_KINDS = ("image", "audio", "video")


def _gen_asset_rows(n: int, seed: int) -> list[tuple[int, str, bytes]]:
    """Deterministic fake binary assets in the MGB1 container format.

    Header: 4-byte magic, 1-byte kind, uint16 width, uint16 height,
    uint32 duration_ms, then ``width*height % 4096`` pseudo-random
    payload bytes.  Stands in for real media files so the decode
    plumbing has bytes to parse.
    """
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind_idx = int(rng.integers(0, len(_KINDS)))
        width = int(rng.integers(16, 512))
        height = int(rng.integers(16, 512))
        duration = int(rng.integers(0, 60_000)) if kind_idx > 0 else 0
        n_payload = (width * height) % 4096
        payload = rng.integers(0, 256, size=n_payload, dtype=np.uint8).tobytes()
        blob = _MAGIC + struct.pack("<BHHI", kind_idx, width, height, duration) + payload
        rows.append((i, _KINDS[kind_idx], blob))
    return rows


def synth_assets(spark: SparkSession, n: int = 256, seed: int = 42) -> DataFrame:
    """MGB1 asset table as a Spark DataFrame (see :func:`_gen_asset_rows`)."""
    rows = [(i, kind, bytearray(blob)) for i, kind, blob in _gen_asset_rows(n, seed)]
    return spark.createDataFrame(rows, "asset_id long, kind string, payload binary")


def write_assets_parquet(path: str, n: int = 256, seed: int = 42) -> str:
    """Persist the deterministic MGB1 asset table as one parquet file.

    Spark-free (pyarrow) so it can run at import time; idempotent
    (same seed -> same bytes) and atomic (write temp + rename) so a
    concurrent oracle-side reader never sees a partial file.
    """
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(path):
        return path
    rows = _gen_asset_rows(n, seed)
    table = pa.table(
        {
            "asset_id": pa.array([r[0] for r in rows], pa.int64()),
            "kind": pa.array([r[1] for r in rows], pa.string()),
            "payload": pa.array([r[2] for r in rows], pa.binary()),
        }
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


_META_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("duration_ms", LongType(), False),
        StructField("payload_bytes", LongType(), False),
    ]
)


def extract_asset_meta(df: DataFrame) -> DataFrame:
    """Parse the MGB1 header per asset — the metadata-extraction stage of
    a media pipeline (vectorized struct.unpack per batch row; payload
    bytes are never copied out of the Arrow buffer)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for blob in pdf["payload"]:
                blob = bytes(blob)
                if blob[:4] != _MAGIC or len(blob) < 13:
                    metas.append((0, 0, 0, len(blob), "unknown"))
                    continue
                kind_idx, width, height, duration = struct.unpack("<BHHI", blob[4:13])
                metas.append(
                    (width, height, duration, len(blob) - 13, _KINDS[kind_idx])
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(dtype=np.int64),
                    "kind": [m[4] for m in metas],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "duration_ms": [m[2] for m in metas],
                    "payload_bytes": [m[3] for m in metas],
                }
            )

    return df.select("asset_id", "payload").mapInPandas(parse, _META_SCHEMA)


_FEAT_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("features", ArrayType(DoubleType(), False), False),
    ]
)


def byte_histogram_features(
    df: DataFrame, n_bins: int = 16, normalize: bool = True
) -> DataFrame:
    """Deterministic per-asset feature vector: byte histogram of the
    payload — the feature-extraction stage with the codec swapped for a
    histogram (numpy bincount per asset).  ``normalize=False`` keeps raw
    integer counts (exact, so cross-engine oracle comparisons avoid
    float rounding ties)."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob in pdf["payload"]:
                arr = np.frombuffer(bytes(blob)[13:], dtype=np.uint8)
                if len(arr) == 0:
                    feats.append([0.0] * n_bins)
                    continue
                hist = np.bincount(arr >> (8 - n_bins.bit_length() + 1), minlength=n_bins)
                if normalize:
                    feats.append((hist / hist.sum()).tolist())
                else:
                    feats.append(hist.astype(np.float64).tolist())
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"].to_numpy(dtype=np.int64), "features": feats}
            )

    return df.select("asset_id", "payload").mapInPandas(featurize, _FEAT_SCHEMA)


def decode_image(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Decode + resize images to pixel arrays.

    STUB: requires an image codec (Pillow) that this container does not
    ship.  The Spark plumbing (signature, schema, batching) matches
    ``byte_histogram_features``; swap the body for ``PIL.Image.open``
    when the dependency exists.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "decode_image needs Pillow; this environment has no image codec. "
            "Use byte_histogram_features for the codec-free feature path."
        ) from exc
    raise NotImplementedError("real decode path reserved for codec-enabled builds")


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for video payloads.

    Real part: per-asset frame *timestamps* derived from the parsed
    duration (JVM-side sequence). Stub part: actual frame decode (no
    video codec in this container) — downstream gets (asset_id, frame_ts)
    rows ready to feed a decoder.
    """
    meta = extract_asset_meta(df)
    return (
        meta.where((F.col("kind") == "video") & (F.col("duration_ms") > 0))
        .select(
            "asset_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
            ).alias("frame_ts"),
        )
    )
