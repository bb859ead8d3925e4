"""Wall-budget behavior of the bench harness (no Spark needed).

The driver captures bench.py's stdout once per round; a run that
overruns the capture window used to leave NO artifact.  These tests pin
the degradation ladder: priority-ordered scaling pairs, history
fallback for skipped/failed pairs, error trails instead of silence, and
the schema-complete history-only scaling dict used by the partial emit.
"""

from __future__ import annotations

import json
import subprocess
import time

import pytest

import bench


@pytest.fixture
def history_file(tmp_path, monkeypatch):
    """Point bench's BENCH/ artifacts at a temp dir with a seeded history."""
    bdir = tmp_path / "BENCH"
    bdir.mkdir()
    history = {
        "host_probe_best": {
            "local8_sec": 1.0,
            "local32_sec": 0.4,
            "speedup": 2.5,
            "efficiency": 0.625,
            "max_steal_pct": 5.0,
        },
        "host_probe_legs_min": {"local8_sec": 1.0, "local32_sec": 0.4},
        "sketch_2v8": {
            "local2_sec": 6.0,
            "local8_sec": 2.0,
            "tokens": 1000,
            "local2_tokens_per_sec": 166,
            "local8_tokens_per_sec": 500,
            "efficiency": 0.75,
            "best_pair_efficiency": 0.9,
            "runs": 3,
        },
        "preagg_2v8": {
            "local2_sec": 15.0,
            "local8_sec": 4.0,
            "tokens": 1000,
            "local2_tokens_per_sec": 66,
            "local8_tokens_per_sec": 250,
            "efficiency": 0.93,
            "best_pair_efficiency": 0.99,
            "runs": 3,
        },
    }
    (bdir / "scaling_history.json").write_text(json.dumps(history))
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    return bdir / "scaling_history.json"


def _fake_pair(low=2, high=8, sec_low=2.0, sec_high=1.0, tokens=1000):
    return {
        f"local{low}_sec": sec_low,
        f"local{high}_sec": sec_high,
        "tokens": tokens,
        f"local{low}_tokens_per_sec": round(tokens / sec_low),
        f"local{high}_tokens_per_sec": round(tokens / sec_high),
        "efficiency": round(tokens / sec_high / (tokens / sec_low) / 4, 4),
    }


def test_history_scaling_is_schema_complete(history_file):
    s = bench._history_scaling()
    # Every key run_scaling's consumers touch must exist.
    for key in (
        "sketch_2v8",
        "preagg_2v8",
        "preagg_8v32",
        "host_cpu_probe_8v32",
        "host_cpu_probe_current",
        "preagg_8v32_vs_host_ceiling",
        "efficiency",
        "current_run_efficiency",
        "pairs_measured",
        "pairs_from_history",
        "pair_errors",
    ):
        assert key in s
    assert s["efficiency"] == 0.99  # best_pair_efficiency wins
    assert s["pairs_measured"] == []
    assert set(s["pairs_from_history"]) == {"sketch_2v8", "preagg_2v8"}


def test_history_scaling_empty_history(tmp_path, monkeypatch):
    (tmp_path / "BENCH").mkdir()
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    s = bench._history_scaling()
    assert s["efficiency"] is None
    assert s["pairs_from_history"] == []


def test_run_scaling_skips_later_pairs_when_budget_spent(
    history_file, monkeypatch
):
    calls = []

    def fake_scale_pair(low, high, repo_dir, warm_dir, rounds=1,
                        pre_aggregate=False, with_cpu_probe=False):
        calls.append((low, high, pre_aggregate))
        # Eat the whole remaining budget on the first (criterion) pair.
        bench._BENCH_START -= 1000.0
        return _fake_pair(low, high)

    fake_scale_pair.last_probe = None
    monkeypatch.setattr(bench, "_scale_pair", fake_scale_pair)
    monkeypatch.setattr(bench, "_BENCH_START", time.perf_counter())
    s = bench.run_scaling("scale", "warm")
    # Criterion pair always runs; the rest fall back to history.
    assert calls == [(2, 8, True)]
    assert s["pairs_measured"] == ["preagg_2v8"]
    assert set(s["pairs_from_history"]) == {"preagg_8v32", "sketch_2v8"}
    # sketch_2v8 still reported — from the seeded history.
    assert s["sketch_2v8"]["best_pair_efficiency"] == 0.9
    assert s["pair_errors"] == {}


def test_run_scaling_records_worker_timeout(history_file, monkeypatch):
    def fake_scale_pair(low, high, *a, **k):
        if (low, high) == (2, 8) and k.get("pre_aggregate"):
            raise subprocess.TimeoutExpired(cmd="worker", timeout=330)
        return _fake_pair(low, high)

    fake_scale_pair.last_probe = None
    monkeypatch.setattr(bench, "_scale_pair", fake_scale_pair)
    monkeypatch.setattr(bench, "_BENCH_START", None)  # unlimited budget
    s = bench.run_scaling("scale", "warm")
    assert "preagg_2v8" in s["pairs_from_history"]
    assert "timeout" in s["pair_errors"]["preagg_2v8"]
    # The failed pair still reports its history point.
    assert s["preagg_2v8"]["best_pair_efficiency"] == 0.99
    # Later pairs were unaffected by the failure.
    assert "sketch_2v8" in s["pairs_measured"]


def test_write_bench_md_handles_missing_pairs(history_file):
    queries = {"q_build_merge_repo_tokens": 5.0, "q_build_merge_preagg": 2.0}
    meta = {
        "repo_tokens_per_sec": 1_000_000,
        "preagg_tokens_per_sec": 2_000_000,
        "repo_tokens": 5_000_000,
        "query_runs": {},
        "query_best_observed": {},
    }
    scaling = bench._history_scaling()  # preagg_8v32 is absent entirely
    bench.write_bench_md(queries, meta, scaling)
    md = (history_file.parent / "BASELINE.md").read_text()
    assert "no data" in md  # absent pair reported, not crashed
    assert "best-observed history" in md


def _full_result(queries, scaling):
    return {
        "metric": "mg_build_merge_and_query_wall",
        "value": round(sum(queries.values()), 4),
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "throughput_tokens_per_sec": 5_300_000,
        "preagg_throughput_tokens_per_sec": 57_000_000,
        "scaling": scaling,
    }


def test_compact_emit_line_fits_capture_window(history_file):
    # A registry far past today's 87 rows must still fit the driver's
    # tail capture with margin (VERDICT r4 #4: r3 AND r4 shipped
    # "parsed": null because the full line outgrew the window).
    queries = {f"q_operator_family_variant_{i:03d}": float(i) for i in range(200)}
    line = bench.compact_emit_line(_full_result(queries, bench._history_scaling()))
    assert len(line) <= bench._EMIT_LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["n_queries"] == 200
    assert parsed["value"] == sum(queries.values())
    # Slowest-first ordering, truncated list, pointer to the full object.
    kept = list(parsed["queries"].values())
    assert kept == sorted(kept, reverse=True)
    assert len(kept) <= 15
    assert parsed["full"] == "BENCH/last_run.json"
    assert "efficiency" in parsed["scaling"]
    assert "partial" not in parsed


def test_compact_emit_line_shrinks_under_hostile_names(history_file):
    # Pathologically long query names force the slowest-list to shrink
    # rather than the line to overflow.
    queries = {("q_" + "x" * 300 + str(i)): float(i) for i in range(40)}
    result = _full_result(queries, bench._history_scaling())
    result["partial"] = True
    line = bench.compact_emit_line(result)
    assert len(line) <= bench._EMIT_LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["n_queries"] == 40
    assert len(parsed["queries"]) < 15
    assert parsed["partial"] is True


def test_run_scaling_flags_degraded_host_window(history_file, monkeypatch):
    # VERDICT r4 #5: a steal-window sample must be marked, not recorded
    # as if it were a clean measurement.
    def fake_scale_pair(low, high, *a, **k):
        if k.get("with_cpu_probe"):
            fake_scale_pair.last_probe = {
                "local8_sec": 2.0,   # best-observed window: 1.0
                "local32_sec": 0.8,  # best-observed window: 0.4
                "speedup": 2.5,
                "efficiency": 0.625,
                "max_steal_pct": 40.0,
            }
        return _fake_pair(low, high)

    fake_scale_pair.last_probe = None
    monkeypatch.setattr(bench, "_scale_pair", fake_scale_pair)
    monkeypatch.setattr(bench, "_BENCH_START", None)
    s = bench.run_scaling("scale", "warm")
    assert s["host_window_ratio"] == 2.0
    assert s["degraded"] is True
    # The degraded banner reaches the markdown artifact.
    queries = {"q": 1.0}
    meta = {
        "repo_tokens_per_sec": 1, "preagg_tokens_per_sec": 1,
        "repo_tokens": 1, "query_runs": {}, "query_best_observed": {},
    }
    bench.write_bench_md(queries, meta, s)
    md = (history_file.parent / "BASELINE.md").read_text()
    assert "DEGRADED HOST WINDOW" in md


def test_run_scaling_clean_window_not_degraded(history_file, monkeypatch):
    def fake_scale_pair(low, high, *a, **k):
        if k.get("with_cpu_probe"):
            fake_scale_pair.last_probe = {
                "local8_sec": 1.0,
                "local32_sec": 0.4,
                "speedup": 2.5,
                "efficiency": 0.625,
                "max_steal_pct": 0.1,
            }
        return _fake_pair(low, high)

    fake_scale_pair.last_probe = None
    monkeypatch.setattr(bench, "_scale_pair", fake_scale_pair)
    monkeypatch.setattr(bench, "_BENCH_START", None)
    s = bench.run_scaling("scale", "warm")
    assert s["degraded"] is False
    assert s["host_window_ratio"] == 1.0


def test_run_scaling_pair_filter_env(history_file, monkeypatch):
    # MGSPARK_BENCH_PAIRS restricts the measurement plan (used to
    # re-accumulate one pair's history from a clean window).
    calls = []

    def fake_scale_pair(low, high, *a, **k):
        calls.append((low, high, k.get("pre_aggregate", False)))
        return _fake_pair(low, high)

    fake_scale_pair.last_probe = None
    monkeypatch.setattr(bench, "_scale_pair", fake_scale_pair)
    monkeypatch.setattr(bench, "_BENCH_START", None)
    monkeypatch.setenv("MGSPARK_BENCH_PAIRS", "sketch_2v8")
    s = bench.run_scaling("scale", "warm")
    assert calls == [(2, 8, False)]
    assert s["pairs_measured"] == ["sketch_2v8"]
    # Unmeasured pairs still report from history.
    assert s["preagg_2v8"]["best_pair_efficiency"] == 0.99


def test_run_scaling_uniformly_slow_window_still_degraded(
    history_file, monkeypatch
):
    # A steal window that slows BOTH legs ~2x can tie or edge out the
    # historical best SPEEDUP — best-by-speedup would then compare the
    # slow probe against itself and report the window clean.  The
    # leg-minima baseline still flags it, and the fast legs stay pinned
    # in history.
    def fake_scale_pair(low, high, *a, **k):
        if k.get("with_cpu_probe"):
            fake_scale_pair.last_probe = {
                "local8_sec": 2.0,    # legs-min: 1.0
                "local32_sec": 0.79,  # legs-min: 0.4
                "speedup": 2.53,      # beats history's 2.5
                "efficiency": 0.633,
                "max_steal_pct": 30.0,
            }
        return _fake_pair(low, high)

    fake_scale_pair.last_probe = None
    monkeypatch.setattr(bench, "_scale_pair", fake_scale_pair)
    monkeypatch.setattr(bench, "_BENCH_START", None)
    s = bench.run_scaling("scale", "warm")
    assert s["degraded"] is True
    assert s["host_window_ratio"] == 2.0
    hist = json.loads(history_file.read_text())
    assert hist["host_probe_legs_min"] == {"local8_sec": 1.0, "local32_sec": 0.4}


def test_merge_query_history_reports_uniform_inflation(history_file):
    # The r5 contention window inflated every query ~1.66x while the CPU
    # probe's local[8] leg ran FASTER than its best — the per-query
    # median is the signal that catches wide-job contention.
    seed = {f"q{i}": 1.0 for i in range(10)}
    best, ratio = bench._merge_query_history(dict(seed), "0.1", 32)
    assert ratio is None  # first invocation: nothing to compare against
    _, ratio = bench._merge_query_history({k: 1.6 for k in seed}, "0.1", 32)
    assert ratio == 1.6
    # The min-fold keeps the clean bests; the inflated run displaces none.
    best, _ = bench._merge_query_history({k: 1.0 for k in seed}, "0.1", 32)
    assert all(v == 1.0 for v in best.values())


def test_merge_query_history_ignores_subsecond_jitter(history_file):
    # Queries under 0.3s best are excluded from the median: tripling a
    # 0.1s query is jitter, not a window signal.
    seed = {f"s{i}": 0.1 for i in range(10)}
    seed.update({f"q{i}": 1.0 for i in range(8)})
    bench._merge_query_history(dict(seed), "0.1", 32)
    nxt = {k: (v * 3 if v < 0.3 else v) for k, v in seed.items()}
    _, ratio = bench._merge_query_history(nxt, "0.1", 32)
    assert ratio == 1.0


def test_apply_query_window_flags_degraded(history_file):
    s = {"degraded": False, "host_window_ratio": 1.0}
    out = bench._apply_query_window(s, {"query_window_ratio": 1.66})
    assert out["degraded"] is True
    assert out["query_window_ratio"] == 1.66
    assert bench._apply_query_window(
        s, {"query_window_ratio": 1.1})["degraded"] is False
    assert bench._apply_query_window(
        s, {"query_window_ratio": None})["degraded"] is False
    # The probe-based flag is never cleared by a clean query median.
    probe_flagged = {"degraded": True, "host_window_ratio": 2.0}
    assert bench._apply_query_window(
        probe_flagged, {"query_window_ratio": 1.0})["degraded"] is True


def test_probe_legs_min_bootstrap_from_probe_best(history_file):
    # A history written before host_probe_legs_min existed must seed the
    # minima from host_probe_best's legs — self-seeding from the current
    # probe reports ratio=1.0 no matter how degraded the window is.
    hist = json.loads(history_file.read_text())
    del hist["host_probe_legs_min"]
    history_file.write_text(json.dumps(hist))
    slow_probe = {
        "local8_sec": 2.0,
        "local32_sec": 0.8,
        "speedup": 2.5,
        "efficiency": 0.625,
        "max_steal_pct": 40.0,
    }
    _, legs_min = bench._merge_probe_history(slow_probe)
    assert legs_min == {"local8_sec": 1.0, "local32_sec": 0.4}
