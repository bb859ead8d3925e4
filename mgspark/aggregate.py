"""Distributed Misra-Gries aggregation: the two-stage plan.

PySpark exposes no Python UDAF ``merge()`` hook, so the partial/final
split of the reference's build+merge pipeline (pmg.py:26-98, 207-246) is
staged explicitly (SURVEY.md §4.1):

    Scan parquet -> Project(tokenize/encode) -> mapInPandas(build)   [stage 1]
      -> [optional parquet checkpoint of partials]
      -> groupBy(bucket).applyInPandas(merge) x ceil(log_fan P)      [stage 2]
      -> collect tiny final sketch -> driver-side DP release

Stage 1 runs directly on the scan partitions — **zero shuffles**: MG build
needs no key co-location, so each task folds its Arrow batches into one
O(k) state and emits a single partial row.  Stage 2 shuffles only the
partial rows (<= k keys each), which is bytes, not data.  Skewed input
(one giant repo) cannot create a straggler because stage 1 partitions by
input splits (``spark.sql.files.maxPartitionBytes``), not by key; the
grouped per-entity variant (``mg_sketch_grouped``) adds an explicit salt
column for the groupBy path instead.

Partial rows carry lineage + metrics (partition id, row count, wall time)
and can be persisted to a parquet checkpoint so a killed job resumes from
partials (north_star requirement).
"""

from __future__ import annotations

import time
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from mgspark.kernel import MGState, mg_build_weighted, mg_merge

__all__ = [
    "PARTIAL_SCHEMA",
    "mg_partials",
    "mg_tree_merge",
    "mg_sketch",
    "mg_sketch_grouped",
    "encode_tokens",
    "decode_keys",
    "mg_topk",
]

# One row per stage-1 task: the partial sketch plus lineage/metrics.
PARTIAL_SCHEMA = StructType(
    [
        StructField("partition_id", LongType(), False),
        StructField("keys", ArrayType(LongType(), False), False),
        StructField("counters", ArrayType(LongType(), False), False),
        StructField("n", LongType(), False),
        StructField("d", LongType(), False),
        StructField("rows", LongType(), False),
        StructField("wall_sec", DoubleType(), False),
    ]
)

# Mask keeping hashed keys non-negative (the reference's key domain is
# ints >= 0, pmg.py:32).
_HASH_MASK = (1 << 62) - 1


def _state_to_row(state: MGState, partition_id: int, rows: int, wall: float) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "partition_id": [partition_id],
            "keys": [state.keys.tolist()],
            "counters": [state.counters.tolist()],
            "n": [state.n],
            "d": [state.d],
            "rows": [rows],
            "wall_sec": [wall],
        }
    )


def _row_to_state(row, k: int) -> MGState:
    return MGState(
        k=k,
        keys=np.asarray(row["keys"], dtype=np.int64),
        counters=np.asarray(row["counters"], dtype=np.int64),
        n=int(row["n"]),
        d=int(row["d"]),
    )


def encode_tokens(df: DataFrame, col: str, key_col: str = "key") -> DataFrame:
    """Map an arbitrary token column onto the int64 key domain.

    Strings (and other non-integral types) are hashed with ``xxhash64``
    (JVM-side, whole-stage codegen) and masked non-negative; integral
    columns pass through unchanged so the reference's "integers >= 0,
    negatives skipped" contract (pmg.py:82-83) stays observable.  At
    100 TB this avoids any dictionary shuffle; released keys are decoded
    back to tokens with :func:`decode_keys` via a broadcast semi-join of
    only the <= k survivors.
    """
    dtype = dict(df.dtypes)[col]
    if dtype in ("tinyint", "smallint", "int", "bigint"):
        return df.withColumn(key_col, F.col(col).cast("long"))
    return df.withColumn(key_col, F.xxhash64(F.col(col)).bitwiseAND(F.lit(_HASH_MASK)))


def decode_keys(tokens_df: DataFrame, col: str, keys: list[int], key_col: str = "key") -> dict[int, str]:
    """Decode hashed keys back to their tokens.

    Broadcast the (tiny) released key set, filter the token stream to
    survivors only, and collect the distinct (key, token) pairs — O(k)
    result rows regardless of input size.
    """
    if not keys:
        return {}
    encoded = encode_tokens(tokens_df, col, key_col)
    pairs = (
        encoded.where(F.col(key_col).isin([int(key) for key in keys]))
        .select(key_col, F.col(col).cast("string").alias("_token"))
        .distinct()
        .collect()
    )
    return {int(row[key_col]): row["_token"] for row in pairs}


def mg_partials(
    df: DataFrame,
    key_col: str,
    k: int,
    weight_col: str | None = None,
) -> DataFrame:
    """Stage 1: per-partition MG build, no shuffle.

    ``mapInArrow`` streams raw Arrow record batches through a vectorized
    value_counts + merge fold (SURVEY.md §4.2) holding only O(k) state,
    and emits exactly one partial-sketch row per non-empty task.  Arrow
    columns go straight to numpy — no pandas block-manager construction
    in the hot path (~40% of per-task time in profiling).
    """
    import pyarrow as pa

    cols = [F.col(key_col).cast("long").alias("key")]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("long").alias("weight"))
    projected = df.select(*cols)

    def _to_int64(column, fill: int) -> np.ndarray:
        if column.null_count:
            import pyarrow.compute as pc

            column = pc.fill_null(column, fill)
        return column.to_numpy(zero_copy_only=False)

    def build(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        start = time.perf_counter()
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        state = MGState(k=k)
        rows = 0
        for batch in batches:
            rows += batch.num_rows
            keys = _to_int64(batch.column(0), -1)
            if weight_col is not None:
                weights = _to_int64(batch.column(1), 0)
            else:
                weights = np.ones(len(keys), dtype=np.int64)
            state = mg_build_weighted(state, keys, weights)
        if rows == 0:
            return
        yield pa.RecordBatch.from_pydict(
            {
                "partition_id": pa.array([pid], pa.int64()),
                "keys": pa.array([state.keys.tolist()], pa.list_(pa.int64())),
                "counters": pa.array([state.counters.tolist()], pa.list_(pa.int64())),
                "n": pa.array([state.n], pa.int64()),
                "d": pa.array([state.d], pa.int64()),
                "rows": pa.array([rows], pa.int64()),
                "wall_sec": pa.array([time.perf_counter() - start], pa.float64()),
            }
        )

    return projected.mapInArrow(build, PARTIAL_SCHEMA)


def _merge_group_fn(k: int):
    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        start = time.perf_counter()
        # Pin fold order by partition id so reruns are deterministic
        # (merge results can differ at (k+1)-th-largest ties otherwise).
        bucket = int(pdf["_bucket"].iloc[0])
        pdf = pdf.sort_values("partition_id")
        state = MGState(k=k)
        rows = 0
        for row in pdf.itertuples(index=False):
            state = mg_merge(state, _row_to_state(row._asdict(), k))
            rows += int(row.rows)
        # The bucket id becomes the (dense) partition id of the next round.
        return _state_to_row(state, bucket, rows, time.perf_counter() - start)

    return merge_group


def mg_tree_merge(
    partials: DataFrame, k: int, fanout: int = 64, num_partials: int | None = None
) -> DataFrame:
    """Stage 2: balanced pairwise-style merge rounds, fully lazy.

    Each round buckets partials by ``partition_id // fanout`` and merges a
    bucket with one ``applyInPandas`` task; ceil(log_fan P) rounds leave a
    single row.  Rounds are planned from ``num_partials`` (an upper bound
    on stage-1 rows — one per input partition) so no counting job runs and
    stage 1 executes exactly once.  Partial rows are <= k keys each, so
    every round shuffles kilobytes regardless of input size.
    """
    if num_partials is None:
        num_partials = partials.rdd.getNumPartitions()
    merged = partials
    remaining = max(int(num_partials), 1)
    while True:
        merged = (
            merged.withColumn("_bucket", (F.col("partition_id") / fanout).cast("long"))
            .groupBy("_bucket")
            .applyInPandas(_merge_group_fn(k), PARTIAL_SCHEMA)
        )
        if remaining <= fanout:
            return merged
        remaining = -(-remaining // fanout)


def mg_sketch(
    df: DataFrame,
    key_col: str,
    k: int,
    weight_col: str | None = None,
    checkpoint_dir: str | None = None,
    fanout: int = 64,
    pre_aggregate: bool = False,
) -> MGState:
    """End-to-end distributed MG sketch of ``df[key_col]``.

    Returns the final merged :class:`MGState` on the driver (it is O(k));
    DP release then happens exactly once, centrally (pmg.py:262-264).
    With ``checkpoint_dir`` set, stage-1 partials are persisted and reused
    on rerun (resumability with lineage+metrics).

    ``pre_aggregate=True`` inserts an exact JVM-side ``groupBy(key).sum``
    before the sketch: map-side combining means only *distinct* keys per
    shuffle partition cross the JVM->Python Arrow boundary (the per-pipe
    boundary throughput, not Python compute, is the hot-path ceiling).
    Results are identical — exact counts are a valid MG input — but the
    plan gains a key shuffle, so use it when the key cardinality is far
    below the row count and fits executor memory; leave it off for
    unbounded key spaces (the zero-shuffle sketch path is the default).
    """
    spark = df.sparkSession
    if pre_aggregate:
        weight_expr = F.count("*") if weight_col is None else F.sum(weight_col)
        pre = df.groupBy(key_col).agg(weight_expr.cast("long").alias("_w"))
        return mg_sketch(
            pre, key_col, k, weight_col="_w",
            checkpoint_dir=checkpoint_dir, fanout=fanout,
        )
    if checkpoint_dir is not None:
        import os

        done_marker = os.path.join(checkpoint_dir, "_SUCCESS")
        if not os.path.exists(done_marker):
            mg_partials(df, key_col, k, weight_col).write.mode("overwrite").parquet(
                checkpoint_dir
            )
        partials = spark.read.parquet(checkpoint_dir)
        # Round planning needs an upper bound on max(partition_id)+1, not
        # the row count: empty stage-1 partitions emit no row, so
        # checkpointed ids can be sparse and count() would under-plan the
        # rounds, leaving multiple final rows.
        max_pid = partials.agg(F.max("partition_id").alias("m")).first()["m"]
        num_partials = (int(max_pid) + 1) if max_pid is not None else 0
    else:
        partials = mg_partials(df, key_col, k, weight_col)
        num_partials = None
    final_rows = mg_tree_merge(partials, k, fanout, num_partials=num_partials).collect()
    if not final_rows:
        return MGState(k=k)
    if len(final_rows) != 1:
        raise AssertionError(
            f"tree merge left {len(final_rows)} rows; round planning bug"
        )
    return _row_to_state(final_rows[0].asDict(), k)


def mg_sketch_grouped(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
    salt_buckets: int = 8,
) -> DataFrame:
    """Per-entity MG sketches with explicit salting for skewed groups.

    ``groupBy(group)`` alone lets one giant group (e.g. a monorepo)
    straggle; instead group by ``(group, salt)`` where the salt spreads a
    group's rows over ``salt_buckets`` sub-sketches, then merge the
    sub-sketches per group in a second, tiny aggregation.  Output: one row
    per group with the merged sketch arrays.
    """
    # Salt deterministically from row content: a nondeterministic per-row
    # expression (e.g. monotonically_increasing_id) feeding a shuffle can
    # re-salt rows on task retry, duplicating/losing them.  Hashing the key
    # with a distinct seed term spreads any group whose keys vary; rows
    # with identical (group, key) collapsing to one bucket is harmless —
    # MG counts them identically wherever they land.
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(key_col), F.lit("mg_salt")), F.lit(salt_buckets))
    )

    def build_group(pdf: pd.DataFrame) -> pd.DataFrame:
        state = MGState(k=k)
        keys = pdf[key_col].to_numpy(dtype=np.int64, na_value=-1)
        state = mg_build_weighted(state, keys, np.ones(len(keys), dtype=np.int64))
        out = _state_to_row(state, 0, len(pdf), 0.0)
        out.insert(0, "group", [pdf["_group"].iloc[0]])
        return out

    grouped_schema = StructType(
        [StructField("group", df.schema[group_col].dataType, True)] + PARTIAL_SCHEMA.fields
    )

    partials = (
        salted.withColumn("_group", F.col(group_col))
        .groupBy("_group", "_salt")
        .applyInPandas(build_group, grouped_schema)
    )

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("partition_id")
        state = MGState(k=k)
        for row in pdf.itertuples(index=False):
            state = mg_merge(state, _row_to_state(row._asdict(), k))
        out = _state_to_row(state, 0, int(pdf["rows"].sum()), 0.0)
        out.insert(0, "group", [pdf["group"].iloc[0]])
        return out

    return partials.groupBy("group").applyInPandas(merge_group, grouped_schema)


def max_user_contribution(df: DataFrame, user_col: str) -> int:
    """Largest number of stream elements any single user contributed.

    The user-level DP releases (pmg.py:301-360) assume a contribution
    bound ``m``; this computes the actual bound with one
    combiner-friendly aggregation so callers can validate or derive it
    (SURVEY.md §1.1 "User" row).
    """
    row = df.groupBy(user_col).count().agg(F.max("count").alias("m")).first()
    return int(row["m"]) if row and row["m"] is not None else 0


def mg_user_level_release(
    df: DataFrame,
    user_col: str,
    token_col: str,
    k: int,
    epsilon: float,
    delta: float = 0.0,
    universe_size: int | None = None,
    user_element_count: int | None = None,
    rng=None,
) -> dict[int, int]:
    """End-to-end user-level DP heavy hitters over hashed token keys.

    Validates (or derives) the per-user contribution bound ``m`` with a
    distributed aggregate, builds the sketch with the distributed merge
    pipeline, then releases with the *merged* user-level mechanisms:
    group-privacy scaling (eps' = eps/m, delta' = delta/(m e^eps),
    pmg.py:301-360) composed with the sensitivity-``k`` merged release
    (pmg.py:249-298).  The element-level user-level mechanisms
    (sensitivity 1/2) only apply to sequentially built sketches — using
    them here would under-noise; the CLI's ``userlevel`` mode keeps them
    because it builds with the sequential kernel.  Returns the released
    {key: counter} dict; decode via :func:`decode_keys`.
    """
    from mgspark import dp

    m = max_user_contribution(df, user_col)
    if user_element_count is not None:
        if m > user_element_count:
            raise ValueError(
                f"user contribution bound violated: observed {m} > "
                f"declared {user_element_count}"
            )
        m = user_element_count
    if m <= 0:
        return {}
    encoded = encode_tokens(df, token_col)
    state = mg_sketch(encoded, "key", k)
    sketch = state.to_dict()
    if delta > 0:
        return dp.privatize_user_level_merged(sketch, k, epsilon, delta, m, rng=rng)
    if universe_size is None:
        raise ValueError("pure DP (delta=0) requires universe_size")
    return dp.purely_privatize_user_level_merged(
        sketch, k, epsilon, universe_size, m, rng=rng
    )


def mg_topk(
    df: DataFrame,
    token_col: str,
    k: int,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Heavy-hitter estimates for a token column, decoded back to tokens.

    Builds the distributed sketch over hashed keys, then decodes the <= k
    surviving keys via a broadcast semi-join.  Returns a DataFrame
    ``(token string, est long)`` sorted by estimate descending, token
    ascending.  When the column's true cardinality is <= k the estimates
    are exact (no decrement can fire), which is what the DuckDB oracle
    checks at small scale.
    """
    spark = df.sparkSession
    encoded = encode_tokens(df, token_col)
    state = mg_sketch(encoded, "key", k, checkpoint_dir=checkpoint_dir)
    mapping = decode_keys(df, token_col, state.keys.tolist())
    rows = [
        (mapping.get(int(key), str(int(key))), int(cnt))
        for key, cnt in zip(state.keys, state.counters)
    ]
    out = spark.createDataFrame(rows, schema="token string, est long")
    return out.orderBy(F.desc("est"), F.asc("token"))
