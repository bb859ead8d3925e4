"""Evaluation harness utilities — the rebuild of evaluate.py's
measurement operators (SURVEY.md §2.5), minus matplotlib (not installed
here): results come back as plain dicts/lists ready for JSON/CSV.

* :func:`wilson_interval` — Wilson score CI (evaluate.py:417-426).
* :func:`privacy_deviation_test` — stochastic (eps, delta)-DP check
  (evaluate.py:236-358 semantics): run a mechanism repeatedly on a
  sketch and a neighboring sketch, compare outcome frequencies against
  e^eps with Wilson intervals, count deviations/violations.
* :func:`accuracy_sweep` — mean L1 release error versus sketch size
  (evaluate.py:361-414 semantics).
* :func:`time_operator` — repeated wall-clock timing (evaluate.py:220-233).
"""

from __future__ import annotations

import math
import time
from collections import Counter
from typing import Callable, Iterable

import numpy as np

__all__ = [
    "wilson_interval",
    "privacy_deviation_test",
    "accuracy_sweep",
    "time_operator",
]


def wilson_interval(successes: int, trials: int, alpha: float = 0.01) -> tuple[float, float]:
    """Wilson score interval for a binomial proportion (evaluate.py:417-426).

    z is the two-sided normal quantile for the given alpha; alpha=0.01
    matches the reference's 99% interval.
    """
    if trials == 0:
        return 0.0, 1.0
    # inverse normal CDF via Acklam-style rational approximation is
    # overkill here; the reference uses scipy. For the two alphas used in
    # tests we pin the quantiles explicitly.
    z = {0.01: 2.5758293035489004, 0.05: 1.959963984540054}.get(alpha)
    if z is None:
        raise ValueError("alpha must be 0.01 or 0.05 (scipy not available)")
    phat = successes / trials
    denom = 1 + z * z / trials
    center = (phat + z * z / (2 * trials)) / denom
    half = z * math.sqrt(phat * (1 - phat) / trials + z * z / (4 * trials * trials)) / denom
    return max(0.0, center - half), min(1.0, center + half)


def privacy_deviation_test(
    mechanism: Callable[[dict], object],
    sketch: dict,
    neighbor: dict,
    epsilon: float,
    repetitions: int = 2000,
    alpha: float = 0.01,
    min_probability: float = 0.005,
) -> dict:
    """Stochastic DP ratio check between a sketch and its neighbor.

    Runs ``mechanism`` ``repetitions`` times on each input, then for every
    outcome whose observed probability exceeds ``min_probability`` checks
    the frequency ratio against ``e^epsilon``; a *deviation* is a raw
    ratio breach, a *violation* is a breach that persists at the
    conservative ends of both Wilson intervals (the reference's stronger
    criterion, evaluate.py:302-321).
    """
    bound = math.exp(epsilon)
    outcomes_a = Counter(mechanism(dict(sketch)) for _ in range(repetitions))
    outcomes_b = Counter(mechanism(dict(neighbor)) for _ in range(repetitions))
    deviations = 0
    violations = 0
    checked = 0
    for outcome in set(outcomes_a) | set(outcomes_b):
        ca, cb = outcomes_a.get(outcome, 0), outcomes_b.get(outcome, 0)
        pa, pb = ca / repetitions, cb / repetitions
        if max(pa, pb) < min_probability:
            continue
        checked += 1
        hi = max(pa, pb)
        lo = min(pa, pb)
        if lo == 0 or hi / lo > bound:
            deviations += 1
            hi_c, lo_c = (ca, cb) if pa >= pb else (cb, ca)
            hi_low, _ = wilson_interval(hi_c, repetitions, alpha)
            _, lo_high = wilson_interval(lo_c, repetitions, alpha)
            if lo_high == 0 or hi_low / max(lo_high, 1e-12) > bound:
                violations += 1
    return {
        "checked_outcomes": checked,
        "deviations": deviations,
        "violations": violations,
        "deviation_rate": deviations / max(checked, 1),
    }


def accuracy_sweep(
    release: Callable[[dict, int], dict],
    true_counts: dict[int, int],
    sketch_sizes: Iterable[int],
    repetitions: int = 10,
) -> list[dict]:
    """Mean total L1 error of a release mechanism vs sketch size
    (evaluate.py:361-414 semantics).

    ``release(sketch, k)`` gets the exact top-k counts as its input
    sketch; the error compares released counters against true counts over
    the released keys plus dropped true heavy keys.
    """
    results = []
    ordered = sorted(true_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    for k in sketch_sizes:
        sketch = dict(ordered[:k])
        errors = []
        for _ in range(repetitions):
            released = release(dict(sketch), k)
            err = sum(
                abs(released.get(key, 0) - true_counts.get(key, 0))
                for key in set(sketch) | set(released)
            )
            errors.append(err)
        results.append(
            {"sketch_size": k, "mean_l1_error": float(np.mean(errors)),
             "max_l1_error": float(np.max(errors))}
        )
    return results


def time_operator(
    fn: Callable[[], object], repetitions: int = 10
) -> dict:
    """Repeated perf_counter timing (evaluate.py:220-233 semantics)."""
    times = []
    for _ in range(repetitions):
        start = time.perf_counter()
        fn()
        times.append(time.perf_counter() - start)
    return {
        "repetitions": repetitions,
        "mean_sec": float(np.mean(times)),
        "min_sec": float(np.min(times)),
        "max_sec": float(np.max(times)),
    }
