"""Mergeable-sketch framework: one partial+final aggregation skeleton for
every sketch family (HLL, Count-Min, Bloom, t-digest, KLL, ...).

Same execution shape as the MG pipeline (mgspark/aggregate.py): stage 1
is a shuffle-free ``mapInPandas`` over the scan partitions, each task
folding its Arrow batches into one O(sketch-size) state and emitting a
single serialized row; stage 2 tree-merges the partial rows with
``applyInPandas``.  PySpark has no Python UDAF merge hook, so the
partial/final split is staged explicitly.

A sketch family implements the five kernel hooks below on numpy state;
the Spark plumbing (``sketch_partials`` / ``sketch_tree_merge`` /
``sketch_agg``) is shared and never touches per-row Python.
"""

from __future__ import annotations

import time
from abc import ABC, abstractmethod
from typing import Any, Iterator

import numpy as np
import pandas as pd

from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

__all__ = ["MergeableSketch", "sketch_partials", "sketch_tree_merge", "sketch_agg", "sketch_agg_grouped", "splitmix64"]

SKETCH_PARTIAL_SCHEMA = StructType(
    [
        StructField("partition_id", LongType(), False),
        StructField("payload", BinaryType(), False),
        StructField("rows", LongType(), False),
        StructField("wall_sec", DoubleType(), False),
    ]
)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mixer (public-domain splitmix64 finalizer).

    Re-hashes int64 keys into uniform uint64 bits for register/bucket
    derivation — xxhash64 output alone is uniform, but families needing
    several independent hashes derive them from this mix.
    """
    z = x.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


class MergeableSketch(ABC):
    """Kernel contract for a mergeable sketch family.

    State is any picklable-free numpy structure; ``serialize`` /
    ``deserialize`` round-trip it through ``bytes`` for the Arrow
    boundary.  ``merge`` must be associative and commutative (or
    order-insensitive within the family's published error bound).
    """

    name: str = "sketch"

    @abstractmethod
    def zero(self) -> Any: ...

    @abstractmethod
    def build(self, state: Any, values: pd.Series) -> Any:
        """Fold one Arrow-batch column into the state (vectorized)."""

    @abstractmethod
    def merge(self, a: Any, b: Any) -> Any: ...

    @abstractmethod
    def serialize(self, state: Any) -> bytes: ...

    @abstractmethod
    def deserialize(self, blob: bytes) -> Any: ...


def sketch_partials(df: DataFrame, col: str, sketch: MergeableSketch) -> DataFrame:
    """Stage 1: one serialized partial sketch per non-empty scan partition.

    Raw Arrow record batches feed ``sketch.build`` as pandas Series built
    from a single Arrow column — no per-batch DataFrame block manager.
    """
    import pyarrow as pa

    projected = df.select(F.col(col).alias("_v"))

    def build(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        start = time.perf_counter()
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        state = sketch.zero()
        rows = 0
        for batch in batches:
            rows += batch.num_rows
            state = sketch.build(state, batch.column(0).to_pandas())
        if rows == 0:
            return
        yield pa.RecordBatch.from_pydict(
            {
                "partition_id": pa.array([pid], pa.int64()),
                "payload": pa.array([sketch.serialize(state)], pa.binary()),
                "rows": pa.array([rows], pa.int64()),
                "wall_sec": pa.array([time.perf_counter() - start], pa.float64()),
            }
        )

    return projected.mapInArrow(build, SKETCH_PARTIAL_SCHEMA)


def sketch_tree_merge(
    partials: DataFrame,
    sketch: MergeableSketch,
    fanout: int = 64,
    num_partials: int | None = None,
) -> DataFrame:
    """Stage 2: lazy tree merge of partial rows (ceil(log_fan P) rounds)."""
    if num_partials is None:
        num_partials = partials.rdd.getNumPartitions()

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        start = time.perf_counter()
        bucket = int(pdf["_bucket"].iloc[0])
        pdf = pdf.sort_values("partition_id")
        state = sketch.zero()
        for blob in pdf["payload"]:
            state = sketch.merge(state, sketch.deserialize(bytes(blob)))
        return pd.DataFrame(
            {
                "partition_id": [bucket],
                "payload": [sketch.serialize(state)],
                "rows": [int(pdf["rows"].sum())],
                "wall_sec": [time.perf_counter() - start],
            }
        )

    merged = partials
    remaining = max(int(num_partials), 1)
    while True:
        merged = (
            merged.withColumn("_bucket", (F.col("partition_id") / fanout).cast("long"))
            .groupBy("_bucket")
            .applyInPandas(merge_group, SKETCH_PARTIAL_SCHEMA)
        )
        if remaining <= fanout:
            return merged
        remaining = -(-remaining // fanout)


def sketch_agg(
    df: DataFrame,
    col: str,
    sketch: MergeableSketch,
    fanout: int = 64,
    checkpoint_dir: str | None = None,
) -> Any:
    """End-to-end: build + tree-merge, return the final state on the driver.

    ``checkpoint_dir`` persists the stage-1 partial rows (payload +
    lineage/metrics) to parquet; a rerun resumes from them — same
    contract as the MG pipeline's checkpointing.
    """
    if checkpoint_dir is not None:
        import os

        spark = df.sparkSession
        if not os.path.exists(os.path.join(checkpoint_dir, "_SUCCESS")):
            sketch_partials(df, col, sketch).write.mode("overwrite").parquet(
                checkpoint_dir
            )
        partials = spark.read.parquet(checkpoint_dir)
        # Upper bound on max(partition_id)+1, not a row count: checkpointed
        # ids can be sparse (empty partitions emit no row) and count()
        # would under-plan the merge rounds.
        max_pid = partials.agg(F.max("partition_id").alias("m")).first()["m"]
        num_partials = (int(max_pid) + 1) if max_pid is not None else 0
    else:
        partials = sketch_partials(df, col, sketch)
        num_partials = None
    rows = sketch_tree_merge(partials, sketch, fanout, num_partials).collect()
    if not rows:
        return sketch.zero()
    if len(rows) != 1:
        raise AssertionError(f"tree merge left {len(rows)} rows; round planning bug")
    return sketch.deserialize(bytes(rows[0]["payload"]))


GROUPED_PARTIAL_SCHEMA_SUFFIX = [
    StructField("payload", BinaryType(), False),
    StructField("rows", LongType(), False),
]


def sketch_agg_grouped(
    df: DataFrame,
    group_col: str,
    value_col: str,
    sketch: MergeableSketch,
    num_salts: int = 16,
) -> DataFrame:
    """Per-group sketches as a distributed DataFrame: one serialized
    state per group value — the ``df.groupBy(g).agg(sketch(x))`` shape
    PySpark cannot express as a Python UDAF.

    Two-stage salted plan (mirroring the grouped MG path): stage 1
    groups by ``(group, salt(value))`` so a single hot group fans across
    up to ``num_salts`` tasks instead of straggling on one; stage 2
    merges each group's <= ``num_salts`` partial payloads.  Both stages
    are ``applyInPandas`` folds over the vectorized kernel; shuffle
    volume after stage 1 is O(groups x num_salts x sketch-size) bytes,
    independent of row count.  Salting is by the VALUE hash, so
    identical rows split across salts (a group-constant salt could
    not).

    Output: (group_col, payload binary, rows long); map the family's
    ``estimate``/query over the payloads (e.g. HLL distinct per group).
    Null group values form their own group, matching SQL GROUP BY.
    """
    group_type = df.schema[group_col].dataType
    partial_schema = StructType(
        [StructField(group_col, group_type, True), *GROUPED_PARTIAL_SCHEMA_SUFFIX]
    )

    salted = df.select(
        F.col(group_col), F.col(value_col).alias("_v")
    ).withColumn("_salt", F.pmod(F.xxhash64("_v"), F.lit(num_salts)))

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        state = sketch.build(sketch.zero(), pdf["_v"])
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "payload": [sketch.serialize(state)],
                "rows": [len(pdf)],
            }
        )

    partials = salted.groupBy(group_col, "_salt").applyInPandas(fold, partial_schema)

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        state = sketch.zero()
        for blob in pdf["payload"]:
            state = sketch.merge(state, sketch.deserialize(bytes(blob)))
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "payload": [sketch.serialize(state)],
                "rows": [int(pdf["rows"].sum())],
            }
        )

    return partials.groupBy(group_col).applyInPandas(merge_group, partial_schema)
