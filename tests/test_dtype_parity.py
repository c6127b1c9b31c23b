"""Registry-wide dtype-parity audit: every oracle-backed query's Spark
result schema must canonically match its DuckDB oracle's Arrow schema.

The external driver's value-hash is dtype-sensitive, so equal values
with drifting dtypes (DuckDB SUM widening BIGINT -> HUGEINT, DECIMAL vs
DOUBLE) fail the driver even though fetched Python values compare equal
— the round-4 BPE false negative.  This audit catches that class
locally, for every current and future oracle, at sf0.001 so the whole
sweep stays cheap.
"""

from __future__ import annotations

import duckdb
import pytest

from mapreduce_sssp_spark import queries_registry as qr
from mapreduce_sssp_spark.dtype_parity import dtype_drift
from mapreduce_sssp_spark.io.sources import TABLES

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    yield con
    con.close()


def test_all_oracles_dtype_parity(spark, duck):
    """One sweep, all drifts reported together (not -x-style first-only)
    so a new oracle author sees every offending column at once."""
    failures = []
    for name, sql in qr.ORACLE.items():
        sdf = qr.QUERIES[name](spark, SF_SMOKE)
        # LIMIT 0 keeps the fetch schema-only where DuckDB can
        # short-circuit; types are decided at plan time so the Arrow
        # schema is identical to a full run's.
        tbl = duck.execute(
            f"SELECT * FROM ({sql}) LIMIT 0"
        ).fetch_arrow_table()
        drifts = dtype_drift(sdf.schema, tbl.schema)
        if drifts:
            failures.append(f"{name}: " + "; ".join(drifts))
        spark.catalog.clearCache()
    assert not failures, "dtype drift (spark vs duckdb oracle):\n" + "\n".join(
        failures
    )
