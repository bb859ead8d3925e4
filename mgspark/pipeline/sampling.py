"""Deterministic sampling for training-data pipelines: reproducible
Bernoulli, per-stratum top-n, and source-mixture sampling.

Random sampling (``df.sample``) is the wrong tool for a training-data
pipeline: the kept set changes with partitioning, retries, and cluster
size, so a resumed or re-run job trains on different rows.  These
operators key every decision on a *deterministic per-row hash*, so the
sample is a pure function of (id, seed) — identical on 1 executor or
1000, across retries, and across engines (the hash is plain 64-bit
arithmetic, so DuckDB computes the same one for the oracle).

Hash: Knuth multiplicative hashing with the seed inside the
multiplication, ``h(id) = ((id + seed) * 2654435761) mod 2^32`` (the
golden-ratio multiplier, designed exactly for sequential integer keys).
The seed must pass THROUGH the multiplier: an additive-after-multiply
seed only rotates the kept arc by ``seed`` hash values, so adjacent
seeds yield near-identical samples and identical stratified orderings;
seeded pre-shift makes the kept set for seed s the fixed random set
shifted by -s — adjacent seeds decorrelate to the expected rate^2
overlap.  All expressions are JVM-side whole-stage codegen; the
Bernoulli forms are pure filters (NO shuffle — they compose with any
downstream plan and scale embarrassingly), the stratified form has the
one groupBy-shaped shuffle top-n-per-group requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "sample_hash_expr",
    "hash_sample",
    "stratified_sample",
    "mixture_sample",
    "weighted_sample",
]

_KNUTH = 2654435761  # 2^32 * (golden ratio - 1), Knuth TAOCP vol 3 §6.4
_MOD = 1 << 32


def sample_hash_expr(id_col: str, seed: int = 0) -> Column:
    """The deterministic 32-bit sampling hash as a Column (bigint in
    [0, 2^32)).  Ids must be integral, non-negative, and < 2^31 (and
    seed < 2^30) for the cross-engine guarantee: (id + seed) * 2654435761
    then stays below 2^63, so DuckDB computes the identical value
    (larger inputs overflow the 64-bit product differently per
    engine)."""
    if not 0 <= int(seed) < (1 << 30):
        raise ValueError(f"seed must be in [0, 2^30), got {seed}")
    id_val = F.col(id_col).cast("bigint")
    hash_val = F.pmod((id_val + F.lit(int(seed))) * F.lit(_KNUTH), F.lit(_MOD))
    # Enforce the precondition in-expression: an out-of-range id would
    # not error — it would silently produce a DIFFERENT sample than the
    # oracle/another engine (Spark pmod is non-negative, SQL % keeps the
    # dividend sign; >= 2^31 overflows the product differently).  One
    # branch per row, still whole-stage codegen.  A NULL id passes
    # through as a NULL hash (every comparison then filters the row —
    # identically in SQL), matching pre-guard behavior; format_string is
    # null-tolerant so a non-null violation always names itself.
    return F.when(
        id_val.isNull() | ((id_val >= 0) & (id_val < F.lit(1 << 31))), hash_val
    ).otherwise(
        F.raise_error(
            F.format_string(
                f"sampling id {id_col}=%s outside [0, 2^31) — "
                "the cross-engine determinism precondition",
                id_val.cast("string"),
            )
        ).cast("bigint")
    )


def hash_sample(
    df: DataFrame, id_col: str, rate: float, seed: int = 0
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows with hash < rate * 2^32.

    A pure filter — no shuffle, no state; the kept set is a function of
    (id, seed) only, so re-runs, retries, and different cluster sizes
    keep exactly the same rows (the property ``df.sample`` does not
    have).  Rate is exact in expectation over uniform ids.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.where(sample_hash_expr(id_col, seed) < int(rate * _MOD))


def stratified_sample(
    df: DataFrame, strata_col: str, id_col: str, n_per_stratum: int, seed: int = 0
) -> DataFrame:
    """Deterministic n rows per stratum: rank by (hash, id) within each
    stratum, keep rank <= n.

    The (hash, id) ordering makes the selection a uniform-without-
    replacement draw that is still fully reproducible.  One shuffle on
    the stratum key (the minimum top-n-per-group needs); strata with
    fewer than n rows keep all of them.  A stratum hot enough to
    straggle its one task should be pre-thinned with
    :func:`hash_sample` first — rank-per-group cannot split a group.
    """
    if n_per_stratum < 1:
        raise ValueError(f"n_per_stratum must be >= 1, got {n_per_stratum}")
    w = Window.partitionBy(strata_col).orderBy(
        sample_hash_expr(id_col, seed).asc(), F.col(id_col).asc()
    )
    rk = "_rk"
    while rk in df.columns:  # never clobber a caller column
        rk += "_"
    return (
        df.withColumn(rk, F.row_number().over(w))
        .where(F.col(rk) <= n_per_stratum)
        .drop(rk)
    )


def mixture_sample(
    df: DataFrame, source_col: str, id_col: str, rates: dict[str, float],
    seed: int = 0, default_rate: float = 0.0,
) -> DataFrame:
    """Per-source Bernoulli rates — the training-mixture reweighting step
    (e.g. keep 100% of books, 10% of web, 0% of the rest).

    Still a pure filter (no shuffle): the per-row rate is a CASE over
    ``source_col``, the keep decision the same deterministic hash.
    Sources absent from ``rates`` use ``default_rate``.
    """
    for src, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {src!r} must be in [0, 1], got {rate}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    cutoff = F.lit(int(default_rate * _MOD))
    for src, rate in sorted(rates.items()):
        cutoff = F.when(
            F.col(source_col) == F.lit(src), F.lit(int(rate * _MOD))
        ).otherwise(cutoff)
    return df.where(sample_hash_expr(id_col, seed) < cutoff)


def weighted_sample(
    df: DataFrame, id_col: str, weight_col, seed: int = 0
) -> DataFrame:
    """Per-row weighted Bernoulli: keep each row with probability equal
    to its own weight in [0, 1] (values outside clamp) — the
    quality-proportional downsampling step of a curation pipeline
    ("keep high-quality docs always, low-quality ones rarely").

    Still deterministic and zero-shuffle: the row's hash plays the role
    of the uniform draw, so the kept set is a pure function of
    (id, seed, weight expression) — identical across cluster sizes and
    engines.  ``weight_col`` is a column name or Column expression
    (e.g. the quality score itself, or any function of it).
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    w = F.least(F.lit(1.0), F.greatest(F.lit(0.0), w.cast("double")))
    return df.where(
        sample_hash_expr(id_col, seed) < (w * F.lit(float(_MOD))).cast("bigint")
    )
