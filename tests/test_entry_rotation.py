"""The driver-window rotation in ``__spark_entry__.queries()``.

The driver checks only the first ~50 entries of ``queries()`` per round, so
the dict ORDER is load-bearing: unverified oracle-backed entries must come
first (they get the full rows+schema+hash check), rows-only entries next,
and already-proven entries last — resweeping stalest-proof-first so silent
regressions in old greens are eventually re-caught once the backlog drains.

No SparkSession needed: this exercises the ordering logic against the real
CORRECTNESS_r*.json artifacts committed in the repo root.
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def entry_mod():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _green(path: str) -> set[str]:
    with open(path) as f:
        rows = json.load(f)
    return {
        k
        for k, r in rows.items()
        if isinstance(r, dict)
        and r.get("err") != "no_oracle"
        and r.get("rows_match")
        and r.get("schema_match")
        and r.get("hash_match")
    }


def test_driver_verified_tracks_latest_round(entry_mod):
    verified = entry_mod._driver_verified()
    paths = sorted(
        p
        for p in os.listdir(REPO)
        if p.startswith("CORRECTNESS_r") and p.endswith(".json")
    )
    assert paths, "repo should carry at least one driver correctness file"
    per_round = {
        int(p.split("_r")[1].split(".")[0]): _green(os.path.join(REPO, p))
        for p in paths
    }
    for rnd, greens in per_round.items():
        later = {r for r in per_round if r > rnd}
        for name in greens:
            # a later round's verdict (green or red) overrides; otherwise
            # the query must be recorded as proven in THIS round
            if any(
                name in json.load(open(os.path.join(REPO, f"CORRECTNESS_r{r:02d}.json")))
                for r in later
            ):
                continue
            assert verified.get(name) == rnd, name


def test_queries_order_unverified_oracle_first(entry_mod):
    from statline_bq_spark import workload

    verified = entry_mod._driver_verified()
    order = list(entry_mod.queries())
    assert set(order) == set(workload.QUERIES)

    def group(name: str) -> int:
        if name not in verified:
            # terminal rows-only entries go DEAD LAST: their weaker check
            # must never displace a hash-proof resweep from the window
            return 0 if name in workload.ORACLES else 2
        return 1

    groups = [group(n) for n in order]
    assert groups == sorted(groups), (
        "queries() must order unverified-oracle-backed, then verified "
        "resweeps, then the terminal rows-only trio"
    )


def test_verified_tail_resweeps_stalest_first(entry_mod):
    verified = entry_mod._driver_verified()
    order = list(entry_mod.queries())
    tail_rounds = [verified[n] for n in order if n in verified]
    assert tail_rounds == sorted(tail_rounds), (
        "proven entries must resweep oldest-proof-first"
    )
    # both proof rounds present in the repo today must appear in the tail
    assert len(set(tail_rounds)) >= 2


def test_regression_drops_back_to_front(entry_mod, tmp_path, monkeypatch):
    """A query proven green in an old round but red in the latest must leave
    the verified group (and so rejoin the front of the window)."""
    rows_r1 = {"q_old": {"rows_match": True, "schema_match": True, "hash_match": True}}
    rows_r2 = {"q_old": {"rows_match": True, "schema_match": False, "hash_match": False}}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(rows_r1))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps(rows_r2))
    monkeypatch.setattr(entry_mod, "_REPO_ROOT", str(tmp_path))
    assert entry_mod._driver_verified() == {}
