#!/usr/bin/env python3
"""Benchmark harness: headline MG queries at $SPARK_GRAFT_SF_DIR plus the
N-vs-4N-core scaling evidence (BASELINE.md).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
     "throughput": {...}, "scaling": {...}}

Scaling evidence: the identical build+merge job runs at local[8] and
local[32] on the same input (same file splits) in separate subprocesses;
efficiency = (throughput_32 / throughput_8) / 4.  Also refreshes
BENCH/BASELINE.md.

Usage:
    python bench.py                      # full run (headline + scaling)
    python bench.py --scale-worker N DIR # internal: one scaling datapoint
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DATA = os.path.join(REPO, ".bench_data")
REPO_ROWS = int(os.environ.get("MGSPARK_BENCH_ROWS", "400000"))
# Larger table for the scaling comparison: fixed overheads (job scheduling,
# merge round, collect) must be small relative to compute at both core counts.
SCALE_ROWS = int(os.environ.get("MGSPARK_SCALE_ROWS", "2400000"))

# ~64 input splits regardless of parquet layout so both parallelism
# levels see identical, ample task granularity.
SPLIT_CONF = {"spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
              "spark.sql.files.openCostInBytes": str(512 * 1024)}


def _repo_table_dir(rows: int) -> str:
    from mgspark.testgen import write_repo_table

    path = os.path.join(BENCH_DATA, f"repos_{rows}")
    write_repo_table(path, n_rows=rows, n_files=128)
    return path


def _build_merge_job(spark, repo_dir: str):
    """The headline job: tokenize -> per-partition build -> tree merge."""
    from pyspark.sql import functions as F

    from mgspark.aggregate import encode_tokens, mg_sketch
    from mgspark.tokenize import content_tokens

    df = spark.read.parquet(repo_dir)
    tokens = encode_tokens(content_tokens(df), "token")
    return mg_sketch(tokens, "key", k=1024)


def scale_worker(cores: int, repo_dir: str) -> None:
    from mgspark.session import get_spark

    spark = get_spark(f"mgspark-scale-{cores}", cores=cores, extra_conf=SPLIT_CONF)
    # Warm: JVM, parquet footers, python workers (worker pool fills over
    # the first few runs — measure steady state).
    spark.read.parquet(repo_dir).count()
    for _ in range(2):
        _build_merge_job(spark, repo_dir)
    best = float("inf")
    state = None
    for _ in range(3):
        start = time.perf_counter()
        state = _build_merge_job(spark, repo_dir)
        best = min(best, time.perf_counter() - start)
    print(json.dumps({"cores": cores, "sec": best, "tokens": state.n}))
    spark.stop()


def run_headline(spark, repo_dir: str) -> tuple[dict, dict]:
    import __spark_entry__ as entrymod

    queries = {}
    meta = {}

    def timed(name, fn):
        start = time.perf_counter()
        out = fn()
        queries[name] = round(time.perf_counter() - start, 4)
        return out

    state = timed("q_build_merge_repo_tokens", lambda: _build_merge_job(spark, repo_dir))
    meta["repo_tokens"] = state.n
    meta["repo_tokens_per_sec"] = round(state.n / queries["q_build_merge_repo_tokens"])

    qmap = entrymod.queries()
    for name in [
        "mg_topk_user_id",
        "mg_topk_returnflag",
        "mg_topk_doc_tokens_exact",
        "mg_sketch_doc_tokens_k8",
        "mg_private_topk_event_type",
        "mg_grouped_lang_by_source",
    ]:
        timed(name, lambda n=name: qmap[n](spark, SF_DIR).collect())
    return queries, meta


def run_scaling(repo_dir: str) -> dict:
    points = {}
    for cores in (8, 32):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scale-worker", str(cores), repo_dir],
            capture_output=True, text=True, check=True, cwd=REPO,
        )
        line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
        points[cores] = json.loads(line)
    thr8 = points[8]["tokens"] / points[8]["sec"]
    thr32 = points[32]["tokens"] / points[32]["sec"]
    return {
        "local8_sec": round(points[8]["sec"], 4),
        "local32_sec": round(points[32]["sec"], 4),
        "tokens": points[32]["tokens"],
        "local8_tokens_per_sec": round(thr8),
        "local32_tokens_per_sec": round(thr32),
        "efficiency": round(thr32 / thr8 / 4, 4),
    }


def write_bench_md(queries, meta, scaling) -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    lines = [
        "# BENCH — measured performance (local sandbox)",
        "",
        f"Input: synthetic repo table ({REPO_ROWS} rows headline / {SCALE_ROWS} rows scaling, "
        "128 parquet files each, seed=42)",
        f"+ driver testdata at `{SF_DIR}`.",
        "",
        "## Headline queries (local[{}])".format(CPUS),
        "",
        "| query | sec |",
        "|---|---|",
    ]
    lines += [f"| {name} | {sec} |" for name, sec in queries.items()]
    lines += [
        "",
        f"MG build+merge throughput: **{meta['repo_tokens_per_sec']:,} tokens/sec** "
        f"({meta['repo_tokens']:,} tokens).",
        "",
        "## Scaling: identical job at two parallelism levels (N vs 4N cores)",
        "",
        "Sandbox stand-in for the N-vs-4N-executor criterion (BASELINE.md):",
        "same input, same splits, local[8] vs local[32], best of 3 warm runs.",
        "",
        "| cores | sec | tokens/sec |",
        "|---|---|---|",
        f"| 8 | {scaling['local8_sec']} | {scaling['local8_tokens_per_sec']:,} |",
        f"| 32 | {scaling['local32_sec']} | {scaling['local32_tokens_per_sec']:,} |",
        "",
        f"Scaling efficiency (thr_32 / thr_8) / 4 = **{scaling['efficiency']}** "
        "(target >= 0.8).",
        "",
    ]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w", encoding="utf8") as f:
        f.write("\n".join(lines))


def main() -> None:
    if len(sys.argv) >= 4 and sys.argv[1] == "--scale-worker":
        scale_worker(int(sys.argv[2]), sys.argv[3])
        return

    from mgspark.session import get_spark

    repo_dir = _repo_table_dir(REPO_ROWS)
    scale_dir = _repo_table_dir(SCALE_ROWS)
    spark = get_spark("mgspark-bench", cores=CPUS, extra_conf=SPLIT_CONF)
    queries, meta = run_headline(spark, repo_dir)
    spark.stop()
    scaling = run_scaling(scale_dir)
    write_bench_md(queries, meta, scaling)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "mg_build_merge_and_query_wall",
                "value": round(sum(queries.values()), 4),
                "unit": "sec",
                "queries": queries,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "throughput_tokens_per_sec": meta["repo_tokens_per_sec"],
                "scaling": scaling,
            }
        )
    )


if __name__ == "__main__":
    main()
