"""Temporal operators for event tables: sessionization and as-of joins.

Both are standard building blocks of behavioral / time-series feature
pipelines that Spark lacks as primitives, expressed here as pure
DataFrame window compositions — no UDF, one shuffle each (the hash
exchange on the entity key that any per-entity temporal operator
requires), whole-stage codegen throughout, and exactly SQL-oracle-able
(DuckDB: ``lag``/``sum`` windows for sessions, native ``ASOF JOIN`` for
the as-of join).

Scale notes: both operators partition by the entity key, so a single
pathological entity (one user with a billion events) is the skew unit —
pre-split such entities by a coarse time bucket first if they exist.
State per task is O(1) beyond the sort Spark already does for any
window; at 100 TB the plan is sort-within-partition after one exchange,
which AQE sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize", "session_stats", "asof_join", "rolling_features"]


def _epoch_sec(col: Column) -> Column:
    """Seconds since epoch as double (micros / 1e6) — works for both
    TIMESTAMP and TIMESTAMP_NTZ (which Spark cannot cast straight to
    double); the division matches DuckDB's ``epoch()`` bit-for-bit."""
    return F.unix_micros(col.cast("timestamp")) / F.lit(1000000.0)


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: float,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session ids: a new session starts whenever the
    time since the entity's previous event exceeds ``gap_seconds``.

    ``session_col`` is a per-entity ordinal (0, 1, 2, ...), computed as
    the running count of session-start flags — one window over
    (key, ts).  Tied timestamps are order-independent by construction
    (a zero gap never starts a session), so ids are deterministic even
    though the sort may order ties differently per run/engine — which is
    also why the gap must be non-negative (a negative gap would make
    every tie a nondeterministic session start).

    NULL timestamps sort LAST (matching SQL engines' default window
    NULLS LAST, so the cross-engine oracle agrees) and never start a
    new session: only the entity's first row or a real positive gap
    does, so null-ts rows inherit the entity's final session id instead
    of each spawning a phantom session that would shift every real
    row's ordinal.
    """
    if gap_seconds < 0:
        raise ValueError(f"gap_seconds must be >= 0, got {gap_seconds}")
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc_nulls_last())
    prev_ts = F.lag(F.col(ts_col)).over(w)
    gap_exceeded = (
        _epoch_sec(F.col(ts_col)) - _epoch_sec(prev_ts)
        > F.lit(float(gap_seconds))
    )
    # first row per entity (row_number, not prev.isNull(): a NULL prev
    # ts reappears at every null-ts row) or a real gap; NULL comparisons
    # fall through to 0 so null-ts rows never open a session.
    new_session = F.when(
        (F.row_number().over(w) == 1) | gap_exceeded, F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        session_col,
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - F.lit(1),
    )


def session_stats(
    df: DataFrame, key_col: str, ts_col: str, gap_seconds: float
) -> DataFrame:
    """One row per (entity, session): event count, start/end, duration
    seconds — the aggregation layer over :func:`sessionize` (its one
    extra shuffle is on (key, session), same width as the session ids).
    """
    sess = sessionize(df, key_col, ts_col, gap_seconds)
    return sess.groupBy(key_col, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        (F.max(_epoch_sec(F.col(ts_col))) - F.min(_epoch_sec(F.col(ts_col))))
        .alias("duration_sec"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row gets ``value_cols`` from one matching
    right row for the same key (null when no such row exists), where
    "matching" depends on ``direction``:

    * ``"backward"`` (default, SQL ASOF JOIN): the LATEST right row with
      ``right.ts <= left.ts``;
    * ``"forward"``: the EARLIEST right row with ``right.ts >= left.ts``;
    * ``"nearest"``: whichever of the two is closer in time (ties go
      backward — the pandas ``merge_asof`` convention).

    Implementation is the scalable union trick, not a range join: tag
    both sides, union, sort by (key, ts, side) once per direction, and
    propagate the last seen right-side ROW — one struct holding the
    right timestamp plus every value column, non-null exactly when a
    right row exists — with a single ``last(ignoreNulls)`` running
    window; then keep the left rows and project struct fields.
    Carrying the whole row as one struct (not one ``last`` per column)
    guarantees all values come from the SAME matching right row even
    when some of its value columns are NULL — per-column fills would
    skip a null and surface a different row's value instead.  One hash
    exchange on the key and one sort per needed direction (two for
    ``nearest``, sharing the exchange) — O(n log n) per partition,
    versus the quadratic blowup a naive ``left.ts >= right.ts``
    theta-join gives Spark (which can only nested-loop it per key).
    Right rows sort BEFORE left rows at equal timestamps in every
    direction, so an exactly-simultaneous right row is visible
    (inclusive semantics, matching SQL ASOF JOIN).

    Output: all left columns plus ``<value_col><suffix>`` for each
    requested right column.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward', or 'nearest', "
            f"got {direction!r}"
        )
    for c in value_cols:
        if c not in right.columns:
            raise ValueError(f"value column {c!r} not in right side")
        if f"{c}{suffix}" in left.columns:
            raise ValueError(
                f"output column '{c}{suffix}' collides with a left column; "
                "pass a different suffix"
            )
    lcols = left.columns
    from pyspark.sql.types import StructField, StructType

    rts_field = "_rts"
    while rts_field in value_cols:
        rts_field += "_"
    row_type = StructType(
        [StructField(rts_field, right.schema[right_ts].dataType, True)]
        + [StructField(c, right.schema[c].dataType, True) for c in value_cols]
    )
    tagged_left = left.select(
        F.col(key_col).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_l_{i}") for i, c in enumerate(lcols)],
        F.lit(None).cast(row_type).alias("_r"),
    )
    tagged_right = right.select(
        F.col(key_col).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{i}") for i, c in enumerate(lcols)],
        F.struct(
            F.col(right_ts).alias(rts_field),
            *[F.col(c).alias(c) for c in value_cols],
        ).alias("_r"),
    )
    # SQL ASOF semantics: a null key never matches (equality) and a null
    # right timestamp never satisfies the time predicate — drop both
    # from the fill side (null-ts rows would otherwise sort FIRST and
    # fill every left row that has no matching real right row).
    # Null-key or null-ts left rows survive with null as-of values
    # (enforced explicitly below — sort placement of nulls differs
    # between the asc and desc windows).
    unioned = tagged_left.unionByName(
        tagged_right.where(F.col("_k").isNotNull() & F.col("_ts").isNotNull())
    )
    frame = (Window.unboundedPreceding, Window.currentRow)
    w_back = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(*frame)
    )
    w_fwd = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").desc(), F.col("_side").asc())
        .rowsBetween(*frame)
    )
    fills = []
    if direction in ("backward", "nearest"):
        fills.append(F.last(F.col("_r"), ignorenulls=True).over(w_back).alias("_rb"))
    if direction in ("forward", "nearest"):
        fills.append(F.last(F.col("_r"), ignorenulls=True).over(w_fwd).alias("_rf"))
    filled = unioned.select(
        "_side",
        "_ts",
        *[F.col(f"_l_{i}") for i in range(len(lcols))],
        *fills,
    )
    if direction == "backward":
        chosen = F.col("_rb")
    elif direction == "forward":
        chosen = F.col("_rf")
    else:
        d_back = F.abs(
            _epoch_sec(F.col("_ts")) - _epoch_sec(F.col("_rb").getField(rts_field))
        )
        d_fwd = F.abs(
            _epoch_sec(F.col("_ts")) - _epoch_sec(F.col("_rf").getField(rts_field))
        )
        chosen = (
            F.when(F.col("_rb").isNull(), F.col("_rf"))
            .when(F.col("_rf").isNull(), F.col("_rb"))
            # ties (d_fwd == d_back) go backward, pandas-style
            .when(d_fwd < d_back, F.col("_rf"))
            .otherwise(F.col("_rb"))
        )
    chosen = F.when(F.col("_ts").isNotNull(), chosen)
    return filled.where(F.col("_side") == 1).select(
        *[F.col(f"_l_{i}").alias(c) for i, c in enumerate(lcols)],
        *[chosen.getField(c).alias(f"{c}{suffix}") for c in value_cols],
    )


def rolling_features(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_seconds: float,
    prefix: str = "roll",
) -> DataFrame:
    """Trailing time-window features per entity: for every row, the
    count / sum / mean of ``value_col`` over the entity's events in
    ``[ts - window_seconds, ts]`` (inclusive both ends).

    A RANGE window frame over integer epoch MICROseconds (RANGE
    boundaries must be integral and exact; float-second frames would
    also blur the inclusive edges) — Spark evaluates it with
    the same one exchange + one sort as :func:`sessionize`.  Cost
    caveat: Spark has no retractable aggregates, so the sliding frame
    re-aggregates from its lower bound each time it moves —
    O(rows-in-window) per row worst case, not O(1); still bounded by
    the window span per row, versus a time-inequality self-join which
    materializes every pair AND pays the join.  Entities hot enough to
    hold ~millions of events inside one window should be pre-thinned
    (:func:`mgspark.pipeline.sampling.hash_sample`) or time-bucketed
    first.  All rows at the same timestamp see the same frame
    (RANGE semantics), so results are tie-robust and exactly
    SQL-oracle-able.

    Output: the input plus ``{prefix}_n``, ``{prefix}_sum``,
    ``{prefix}_mean``.
    """
    if window_seconds < 0:
        raise ValueError(f"window_seconds must be >= 0, got {window_seconds}")
    window_us = int(round(float(window_seconds) * 1_000_000))
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.unix_micros(F.col(ts_col).cast("timestamp")).asc())
        .rangeBetween(-window_us, 0)
    )
    return (
        df.withColumn(f"{prefix}_n", F.count(F.col(value_col)).over(w))
        .withColumn(f"{prefix}_sum", F.sum(F.col(value_col)).over(w))
        .withColumn(f"{prefix}_mean", F.avg(F.col(value_col)).over(w))
    )
