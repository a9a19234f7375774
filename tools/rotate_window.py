#!/usr/bin/env python
"""Print the driver's next bounded correctness window (first 50 entries)
and cumulative green/red/unchecked counts across all CORRECTNESS_r*.json.

This tool DELEGATES to ``__spark_entry__.queries()`` — the live, self-
maintaining rotation the driver actually runs — so its printout can never
drift from the real window (round-5 verdict #4: the old standalone
re-implementation ordered rows-only entries before stale greens,
disagreeing with the live path by 3 slots). It no longer rewrites
``workload.py``: the registry dict order is frozen; ordering is computed
at call time from the CORRECTNESS history.

Usage: python tools/rotate_window.py [--dry-run]   (flag kept for
backwards compatibility; the tool is always read-only now)
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def classify() -> tuple[dict[str, str], list[str]]:
    """name -> 'red' | 'green' from the union of rounds (rows-only driver
    rows prove nothing and keep prior status)."""
    status: dict[str, str] = {}
    rounds = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    for path in rounds:
        for name, row in json.load(open(path)).items():
            if row.get("err") == "no_oracle":
                continue
            ok = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            )
            status[name] = "green" if ok else "red"
    return status, rounds


def main() -> int:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    order = list(entry.queries().keys())
    oracle_keys = set(entry.oracle_sql().keys())
    status, rounds = classify()

    red = [k for k in order if status.get(k) == "red"]
    green = [k for k in order if status.get(k) == "green"]
    unchecked = [k for k in order if k not in status and k in oracle_keys]
    rows_only = [
        k for k in order if k not in oracle_keys and status.get(k) != "red"
    ]

    print(f"rounds seen: {[os.path.basename(p) for p in rounds]}")
    print(
        f"red={len(red)} unchecked={len(unchecked)} "
        f"rows_only={len(rows_only)} green={len(green)}"
    )
    print(f"window of {WINDOW} (live __spark_entry__.queries() order):")
    for k in order[:WINDOW]:
        tag = status.get(k, "unchecked" if k in oracle_keys else "rows-only")
        print(f"  {k} [{tag}]")
    leftover = [k for k in order[WINDOW:] if k in oracle_keys and k not in status]
    if leftover:
        print(f"still outside the window (next rotation): {leftover}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
