#!/usr/bin/env python
"""Rotate the `workload.QUERIES` dict so the driver's bounded correctness
gate (first 50 entries) proves the not-yet-proven queries first.

The per-round driver only records CORRECTNESS rows for the first 50
`queries()` entries, so over rounds the dict order must rotate until every
oracle-backed query has a green row. Priority order produced:

1. entries with a RED driver row (hash/row/schema mismatch or hard error)
   in any CORRECTNESS_r*.json — regressions must re-prove first;
2. oracle-backed entries with NO driver row in any round yet;
3. rows-only entries (no oracle — a driver row adds little; keep them out
   of the window while proof slots are scarce);
4. entries already green in some round (most-recently-proven last).

Usage: python tools/rotate_window.py [--dry-run]

Rewrites statline_bq_spark/workload.py in place (dict entries only) and
prints the resulting 50-entry window. Run the window emulator afterwards:
`python tools/check_window.py 50`.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKLOAD = os.path.join(REPO, "statline_bq_spark", "workload.py")
WINDOW = 50


def classify() -> tuple[dict[str, str], list[str]]:
    """name -> 'red' | 'green' | 'unchecked' from the union of rounds."""
    status: dict[str, str] = {}
    rounds = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    for path in rounds:
        for name, row in json.load(open(path)).items():
            if row.get("err") == "no_oracle":
                continue  # a rows-only row proves nothing; keep prior status
            ok = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            )
            status[name] = "green" if ok else "red"
    return status, rounds


def main() -> int:
    dry = "--dry-run" in sys.argv
    src = open(WORKLOAD).read()
    m = re.search(r"(^QUERIES[^=]*=\s*\{\n)(.*?)(^\})", src, re.S | re.M)
    assert m, "QUERIES dict not found"
    body = m.group(2)
    entries = dict(re.findall(r'^\s*"([a-z0-9_]+)":\s*([a-zA-Z0-9_]+),', body, re.M))
    order = re.findall(r'^\s*"([a-z0-9_]+)":', body, re.M)
    assert len(entries) == len(order), "duplicate keys?"

    m2 = re.search(r"(^ORACLES[^=]*=\s*\{\n)(.*?)(^\})", src, re.S | re.M)
    oracle_keys = set(re.findall(r'^\s*"([a-z0-9_]+)":', m2.group(2), re.M))

    status, rounds = classify()
    red = [k for k in order if status.get(k) == "red"]
    unchecked = [
        k for k in order if k not in status and k in oracle_keys
    ]
    rows_only = [k for k in order if k not in oracle_keys and status.get(k) != "red"]
    green = [k for k in order if status.get(k) == "green"]
    new_order = red + unchecked + rows_only + green
    assert sorted(new_order) == sorted(order)

    print(f"rounds seen: {[os.path.basename(p) for p in rounds]}")
    print(f"red={len(red)} unchecked={len(unchecked)} "
          f"rows_only={len(rows_only)} green={len(green)}")
    print(f"window of {WINDOW}:")
    for k in new_order[:WINDOW]:
        print(f"  {k} [{status.get(k, 'unchecked' if k in oracle_keys else 'rows-only')}]")
    leftover = [k for k in new_order[WINDOW:] if k in oracle_keys and k not in status]
    if leftover:
        print(f"still outside the window (next rotation): {leftover}")

    if dry:
        return 0
    new_body = "".join(f'    "{k}": {entries[k]},\n' for k in new_order)
    open(WORKLOAD, "w").write(src[: m.start(2)] + new_body + src[m.end(2) :])
    print("workload.py rewritten")
    return 0


if __name__ == "__main__":
    sys.exit(main())
