"""Registry invariants: name uniqueness, oracle subset, and the dynamic
driver-history iteration order (weak-evidence entries first).

No SparkSession needed — these are pure-Python checks.
"""

from mapreduce_sssp_spark import queries_registry as qr


def test_every_oracle_has_a_query():
    assert set(qr.ORACLE) <= set(qr.QUERIES)


def test_registry_order_is_a_permutation():
    names = list(qr.QUERIES)
    assert sorted(names) == sorted(set(names))
    assert list(qr.ORACLE) == [n for n in names if n in qr.ORACLE]


def test_driver_history_reads_correctness_files():
    red, checked = qr._driver_history()
    # The repo checkout ships CORRECTNESS_r0{1,2,3}.json, so history exists.
    assert checked is not None and len(checked) > 0
    assert red <= checked


def test_weak_evidence_entries_come_first():
    """Red/upgraded entries precede never-checked, which precede green."""
    red, checked = qr._driver_history()
    if checked is None:  # fallback environment without history files
        return
    names = list(qr.QUERIES)
    phase = [
        0 if n in red else (1 if n not in checked else 2) for n in names
    ]
    assert phase == sorted(phase), "registry order must be red, never, green"


def test_rows_only_entries_with_new_oracle_are_red():
    """A query whose LATEST driver row was rows-only (err=no_oracle) but
    that now ships an oracle twin must be re-prioritized for a hash
    verdict.  The candidate set is computed from the history precondition
    itself — a hard-coded name list encodes one round's state and goes
    stale the moment the driver upgrades those entries (the r4 lesson)."""
    latest = qr._latest_rows()
    if latest is None:
        return
    red, checked = qr._driver_history()
    upgradable = {
        n for n, row in latest.items()
        if row.get("err") == "no_oracle" and n in qr.ORACLE
    }
    assert upgradable <= red
    # And conversely: a hash-green latest row with no error must not sit
    # in the red (re-check-first) set.
    green = {
        n for n, row in latest.items()
        if row.get("hash_match") is True and row.get("err") is None
    }
    assert not (green & red)


def test_registry_order_fallback_without_history():
    """With no history the static r2-r3 snapshot drives the same 3-phase
    shape."""
    names = list(qr.QUERIES)
    orig = qr._driver_history
    qr._driver_history = lambda: (None, None)
    try:
        ordered = qr._registry_order(names)
    finally:
        qr._driver_history = orig
    assert sorted(ordered) == sorted(names)
    front = {n for n in qr._RECHECK_FIRST if n in names}
    assert set(ordered[: len(front)]) == front
