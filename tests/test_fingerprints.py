"""ORACLE_HASHES.json freshness pin — the mechanical _CHANGED_SINCE
referee (r10 ADVICE #4 / verdict "What's wrong" #2).

A semantics-affecting edit to any registry query (engine function,
any helper it references, or its oracle SQL) changes that query's
fingerprint; this test then fails until ``python
tools/update_fingerprints.py`` is run, which bumps the query's
``round`` in the snapshot and thereby re-prioritizes it for a fresh
driver row.  The hand-maintained bump list can no longer rot by
omission.
"""

from __future__ import annotations

import json
from pathlib import Path

from mapreduce_sssp_spark.fingerprints import all_fingerprints

ROOT = Path(__file__).resolve().parents[1]
SNAPSHOT = ROOT / "ORACLE_HASHES.json"


def test_snapshot_exists():
    assert SNAPSHOT.exists(), "run: python tools/update_fingerprints.py"


def test_fingerprints_match_snapshot():
    snap = json.loads(SNAPSHOT.read_text())["queries"]
    live = all_fingerprints()
    stale = sorted(
        n for n in live
        if n not in snap or snap[n]["fp"] != live[n]
    )
    dropped = sorted(set(snap) - set(live))
    assert not stale and not dropped, (
        f"ORACLE_HASHES.json is stale (changed/new: {stale}, dropped: "
        f"{dropped}) — a semantics-affecting edit landed without the "
        f"bump; run: python tools/update_fingerprints.py"
    )


def test_snapshot_covers_registry():
    from mapreduce_sssp_spark import queries_registry as reg

    snap = json.loads(SNAPSHOT.read_text())["queries"]
    assert set(snap) == set(reg.QUERIES)
