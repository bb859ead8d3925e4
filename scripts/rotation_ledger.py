#!/usr/bin/env python
"""Regenerate BENCH/rotation_ledger.json — per-contract-query driver history.

The driver checks only the first 50 rows of ``__spark_entry__.queries()``
per round, so the registry (93 rows and growing) is rotated: long-stable
queries move to the tail to make room for new operators in the checked
window.  This ledger makes that rotation auditable — for every
registered query it records, per round, what the driver's
CORRECTNESS_r{N}.json said (``pass`` / ``no_oracle`` / ``err`` /
``absent``) and derives ``last_green_round`` so a tail query can never
silently go stale: tests/test_rotation_ledger.py fails if a registered
query is missing here, and the ledger itself shows any row whose last
green round is falling behind.

Run from the repo root after each driver round:

    python scripts/rotation_ledger.py
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _round_status(rec: dict) -> str:
    """Collapse one CORRECTNESS record to a ledger status.

    The driver records rows-only queries as ``err: "no_oracle"`` with a
    populated ``spark_rows`` — that is the weaker green, not a failure.
    """
    if rec.get("err") == "no_oracle":
        return "no_oracle" if rec.get("spark_rows") is not None else "err"
    if rec.get("err"):
        return "err"
    if rec.get("hash_match") is True:
        return "pass"
    return "fail"


def build_ledger(repo: str = REPO) -> dict:
    sys.path.insert(0, repo)
    import __spark_entry__ as entry

    registry = list(entry.queries())
    oracles = set(entry.oracle_sql())

    rounds: dict[int, dict] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path, encoding="utf8") as f:
            rounds[int(m.group(1))] = json.load(f)

    ledger = {}
    for name in registry:
        history = {}
        for rnd in sorted(rounds):
            rec = rounds[rnd].get(name)
            history[str(rnd)] = _round_status(rec) if rec else "absent"
        green = [
            int(r) for r, s in history.items() if s in ("pass", "no_oracle")
        ]
        ledger[name] = {
            "position": registry.index(name) + 1,
            "oracle": name in oracles,
            "rounds": history,
            "last_green_round": max(green) if green else None,
        }

    never = sorted(n for n, e in ledger.items() if e["last_green_round"] is None)
    window = 50
    # A stale row *positioned inside the driver window* is queued for
    # re-check next round — that is the rotation working, not a row
    # silently rotting in the tail.  Only stale rows OUTSIDE the window
    # are a discipline failure; the queued ones are listed separately
    # for auditability.
    stale_behind, stale_queued = [], []
    for n, e in sorted(ledger.items()):
        if e["last_green_round"] is None:
            continue
        if max(rounds, default=0) - e["last_green_round"] >= 2:
            (stale_queued if e["position"] <= window else stale_behind).append(n)
    return {
        "generated_from_rounds": sorted(rounds),
        "registered_queries": len(registry),
        "driver_window": window,
        "never_driver_green": never,
        "green_2plus_rounds_ago": stale_behind,
        "stale_queued_in_window": stale_queued,
        "queries": ledger,
    }


def main() -> None:
    out = os.path.join(REPO, "BENCH", "rotation_ledger.json")
    ledger = build_ledger()
    with open(out, "w", encoding="utf8") as f:
        json.dump(ledger, f, indent=1, sort_keys=False)
        f.write("\n")
    n = ledger["registered_queries"]
    print(
        f"wrote {out}: {n} queries over rounds {ledger['generated_from_rounds']}, "
        f"{len(ledger['never_driver_green'])} never green, "
        f"{len(ledger['green_2plus_rounds_ago'])} stale 2+ rounds"
    )


if __name__ == "__main__":
    main()
