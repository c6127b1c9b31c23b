"""Refresh ORACLE_HASHES.json — the committed per-query semantic
fingerprint snapshot consumed by the registry's staleness queue.

Usage: python tools/update_fingerprints.py

For every registry query, computes md5(oracle SQL + recursive engine
source closure) and compares to the committed snapshot:
- unchanged fingerprint: entry kept as-is (round preserved);
- changed fingerprint: ``round`` bumps to the CURRENT round (max
  CORRECTNESS_r*.json round + 1), so queries_registry re-prioritizes
  the query for a fresh driver row;
- new query: round = current round (it is never-checked anyway, so the
  round only matters once it has a row);
- first run (no snapshot): all rounds seed to 0 — baseline, no change
  signal.

tests/test_fingerprints.py fails when this file is stale, so a
semantics-affecting edit cannot land without running this updater.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

ROOT = Path(__file__).resolve().parents[1]
SNAPSHOT = ROOT / "ORACLE_HASHES.json"


def current_round() -> int:
    rounds = [
        int(m.group(1))
        for p in ROOT.glob("CORRECTNESS_r*.json")
        if (m := re.search(r"r(\d+)", p.name))
    ]
    return (max(rounds) + 1) if rounds else 1


def main() -> None:
    from mapreduce_sssp_spark.fingerprints import all_fingerprints

    fps = all_fingerprints()
    rnd = current_round()
    old = {}
    first_run = not SNAPSHOT.exists()
    if not first_run:
        old = json.loads(SNAPSHOT.read_text()).get("queries", {})
    out = {}
    changed, new, dropped = [], [], []
    for name in sorted(fps):
        fp = fps[name]
        prev = old.get(name)
        if prev is None:
            out[name] = {"fp": fp, "round": 0 if first_run else rnd}
            new.append(name)
        elif prev["fp"] != fp:
            out[name] = {"fp": fp, "round": rnd}
            changed.append(name)
        else:
            out[name] = prev
    dropped = sorted(set(old) - set(fps))
    SNAPSHOT.write_text(
        json.dumps({"queries": out}, indent=1, sort_keys=True) + "\n"
    )
    print(f"round={rnd} queries={len(out)} changed={len(changed)} "
          f"new={len(new)} dropped={len(dropped)}")
    for n in changed:
        print(f"  changed: {n} -> round {rnd}")
    for n in dropped:
        print(f"  dropped: {n}")


if __name__ == "__main__":
    main()
