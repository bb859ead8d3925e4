"""SURVEY.md §2.3 completeness: the reference's superseded operators
(ops 17-21) re-expressed as test oracles and cross-checked against both
the reference implementations and the production kernels, plus the
evaluation-harness utilities (§2.5)."""

import math
import random
import sys

import numpy as np
import pytest

from mgspark import dp
from mgspark.evalx import (
    accuracy_sweep,
    privacy_deviation_test,
    time_operator,
    wilson_interval,
)
from mgspark.kernel import kth_largest, mg_reference

sys.path.insert(0, "/root/repo/tests")
from oracles import (  # noqa: E402
    find_threshold_union_bound,
    kth_largest_quickselect,
    mg_unoptimized,
    purely_privatize_full_scan,
)


@pytest.fixture(scope="module")
def reference_alternatives():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import pmg_alternatives  # noqa: PLC0415

    return pmg_alternatives


def test_mg_unoptimized_oracle_matches_kernel(reference_alternatives):
    rnd = random.Random(9)
    for _ in range(100):
        k = rnd.randint(1, 10)
        stream = [rnd.randint(-1, 25) for _ in range(rnd.randint(0, 150))]
        ours = mg_unoptimized(stream, k)
        theirs = reference_alternatives.misra_gries_unoptimized(stream, k)
        kernel = mg_reference(stream, k)
        # exact parity with reference op 17
        assert ours == theirs
        # vs the final kernel: identical nonzero counters, n, d (zero-key
        # *identity* legitimately differs between the two insert policies)
        assert (ours[1], ours[2]) == (kernel[1], kernel[2])
        assert {key: c for key, c in ours[0].items() if c > 0} == {
            key: c for key, c in kernel[0].items() if c > 0
        }


def test_grouped_variant_reference_agrees_with_kernel(reference_alternatives):
    # op 18 (doubly-linked count groups) has different decrement *timing*
    # than the final implementation, so only (n, d) and the deterministic
    # MG bound are shared guarantees (its golden-vector equality in
    # evaluate.py:94-96 holds only on those simple streams).
    rnd = random.Random(4)
    for _ in range(50):
        k = rnd.randint(1, 8)
        stream = [rnd.randint(0, 20) for _ in range(rnd.randint(0, 120))]
        theirs = reference_alternatives.misra_gries_with_groups(stream, k)
        kernel = mg_reference(stream, k)
        assert theirs[1] == kernel[1]  # n agrees; d can differ by timing
        true = {}
        for x in stream:
            true[x] = true.get(x, 0) + 1
        cap = len([x for x in stream if x >= 0]) // (k + 1)
        assert kernel[2] <= cap
        for key, est in kernel[0].items():
            assert true.get(key, 0) - cap <= est <= true.get(key, 0)
        # NOTE: op 18 itself is NOT asserted against the MG bound — the
        # reference's superseded grouped variant can *overestimate*
        # (observed: k=2, est=3 for true=2) and its decrement count can
        # exceed floor(N/(k+1)); its own tests only cover the golden
        # vectors (evaluate.py:94-96).  It was dropped by the reference
        # author and is kept here as a compatibility observation only.


def test_union_bound_matches_reference_and_is_looser(reference_alternatives):
    for eps, delta in [(0.1, 1e-6), (1.0, 1e-6), (0.5, 1e-3), (2.0, 1e-9)]:
        ours = find_threshold_union_bound(eps, delta)
        theirs = reference_alternatives.find_threshold_original(eps, delta, 1)
        assert ours == theirs
        assert dp.find_threshold(eps, delta) <= ours


def test_quickselect_matches_partition():
    rng = np.random.default_rng(2)
    for _ in range(50):
        items = rng.integers(0, 1000, size=int(rng.integers(1, 60))).tolist()
        k = int(rng.integers(1, len(items) + 1))
        assert kth_largest_quickselect(items, k) == kth_largest(np.array(items), k)
        assert kth_largest_quickselect(items, k) == sorted(items)[-k]


def test_pure_dp_full_scan_agrees_with_shortcut_shape():
    sketch = {5: 40, 9: 25, 12: 11}
    rng = np.random.Generator(np.random.PCG64(42))
    slow = purely_privatize_full_scan(
        sketch, 3, epsilon=5.0, universe_size=50, element_count=80,
        decrement_count=0, rng=rng,
    )
    fast = dp.purely_privatize_misra_gries(
        sketch, 3, 5.0, 50, 80, 0, rng=np.random.Generator(np.random.PCG64(42))
    )
    for released in (slow, fast):
        assert len(released) <= 3
        assert list(released) == sorted(released)
    # at eps=5 the heavy keys overwhelmingly survive both variants
    assert 5 in slow and 5 in fast


def test_wilson_interval_values():
    low, high = wilson_interval(50, 100, alpha=0.05)
    assert 0.40 < low < 0.41 and 0.59 < high < 0.60
    low99, high99 = wilson_interval(50, 100, alpha=0.01)
    assert low99 < low and high99 > high
    assert wilson_interval(0, 0) == (0.0, 1.0)


def test_privacy_deviation_harness_accepts_valid_mechanism():
    rng = np.random.Generator(np.random.PCG64(7))
    result = privacy_deviation_test(
        lambda s: frozenset(dp.privatize_misra_gries(s, 1.0, 1e-3, rng=rng)),
        {0: 140, 1: 70, 2: 1, 3: 0},
        {0: 140, 1: 70, 4: 0, 5: 0},
        epsilon=1.0,
        repetitions=3000,
    )
    assert result["violations"] == 0


def test_privacy_deviation_harness_rejects_broken_mechanism():
    # A mechanism that leaks the key set outright must show violations.
    result = privacy_deviation_test(
        lambda s: frozenset(s),  # identity: zero privacy
        {0: 140, 1: 70, 2: 1, 3: 0},
        {0: 140, 1: 70, 4: 0, 5: 0},
        epsilon=1.0,
        repetitions=500,
    )
    assert result["violations"] > 0


def test_accuracy_sweep_improves_with_epsilon():
    rng_lo = np.random.Generator(np.random.PCG64(3))
    rng_hi = np.random.Generator(np.random.PCG64(3))
    true = {i: 1000 - 10 * i for i in range(50)}
    noisy_lo = accuracy_sweep(
        lambda s, k: dp.privatize_misra_gries(s, 0.1, 1e-6, rng=rng_lo),
        true, [10, 20], repetitions=5,
    )
    noisy_hi = accuracy_sweep(
        lambda s, k: dp.privatize_misra_gries(s, 10.0, 1e-6, rng=rng_hi),
        true, [10, 20], repetitions=5,
    )
    for lo, hi in zip(noisy_lo, noisy_hi):
        assert hi["mean_l1_error"] < lo["mean_l1_error"]


def test_time_operator():
    out = time_operator(lambda: sum(range(1000)), repetitions=5)
    assert out["min_sec"] <= out["mean_sec"] <= out["max_sec"]
    assert out["repetitions"] == 5
