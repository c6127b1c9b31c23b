"""ANOVA near-2^53 battery (r11 ADVICE, landed r12): >=1000 groups
whose per-group e3-quantized term is just under 2^53, so the
cross-group term SUM passes 2^63-1. A BIGINT sum carrier would
ANSI-crash Spark-side while DuckDB sums into HUGEINT and diverges
later; the DECIMAL(38,0) carrier plus the `s1_e3 < 2^53` rail in
q_anova_oneway (stat_models.py) must instead land BOTH engines on the
same NULL ssb/ssw/f_stat row, crash-free.

This lives as a dedicated referee with its OWN corpus rather than rows
in tools/make_adversarial_sf.py: 1100 extra event types would turn
every |types|^2 pair query in the full-registry sweep into a ~620k-pair
run (measured: the sweep stalls for hours).
"""

from __future__ import annotations

import datetime as dt
import math
import pathlib

import duckdb
import pytest


N_GROUPS = 1100  # > 2^63 / 2^53 = 1024, with margin
VALUE = 29_900.0  # cents 2.99e6 -> term 8.9401e15 < 2^53 = 9.007e15


@pytest.fixture(scope="module")
def limits_dir(spark, tmp_path_factory):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # a few ordinary groups so k > near-limit count and n_g varies
    for i in range(6):
        rows.append((i, t0, 1, "view", 5.0, None))
    for i in range(4):
        rows.append((10 + i, t0, 2, "purchase", float(i), None))
    for i in range(N_GROUPS):
        rows.append(
            (100 + i, t0 + dt.timedelta(seconds=i), 3, f"aov_{i:04d}",
             VALUE, None)
        )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string",
    )
    d = tmp_path_factory.mktemp("anova_limits")
    ev.write.mode("overwrite").parquet(str(pathlib.Path(d) / "events.parquet"))
    return str(d)


def test_term_sum_passes_int64(limits_dir):
    # the fixture's reason to exist: per-group terms fit 2^53, their
    # sum does NOT fit int64 — the exact hazard the decimal carrier
    # closes.
    term = round((VALUE * 100) ** 2 * 1_000)
    assert term < 2**53
    assert N_GROUPS * term > 2**63 - 1


def test_anova_near_limit_groups_match_duckdb(spark, limits_dir):
    import __spark_entry__ as entrymod

    got = (
        entrymod.queries()["anova_oneway"](spark, limits_dir)
        .collect()
    )
    assert len(got) == 1
    row = got[0].asDict()
    assert row["k"] == N_GROUPS + 2
    # out of domain by the s1_e3 >= 2^53 rail: NULL SS and F, no crash
    assert row["ssb_e3"] is None
    assert row["ssw_e3"] is None
    assert row["f_stat"] is None

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{limits_dir}/events.parquet/*.parquet')"
    )
    cols, vals = None, None
    rel = con.execute(entrymod.oracle_sql()["anova_oneway"])
    cols = [c[0] for c in rel.description]
    vals = rel.fetchall()
    assert len(vals) == 1
    oracle = dict(zip(cols, vals[0]))
    for k, v in oracle.items():
        g = row[k]
        if v is None or g is None:
            assert v is None and g is None, k
        elif isinstance(v, float):
            assert math.isclose(float(g), v, rel_tol=0, abs_tol=0), k
        else:
            assert int(g) == int(v), k
