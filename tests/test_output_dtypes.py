"""Registry-wide OUTPUT-dtype whitelist — the structural close of the
driver-hash dtype incidents (r4 BPE HUGEINT drift, r6 -0.0 repr drift,
r10 moments_value decimal-vs-decimal hash RED).

The external driver hashes stringified values per-dtype, and three
separate rounds proved that any output column outside a small portable
set can hash differently between a Spark collect and a DuckDB fetch
EVEN WHEN every value is bit-identical.  The whitelist below is the
proven-portable set:

- int64 / int32: both engines surface Arrow int64/int32; stringify
  identically (int32 has been driver-green since r2: window_rank,
  scalar_date, topk_orders, ... ~30 queries).
- float64: IEEE doubles; repr parity is separately guarded by the
  exactly-rounded-ops doctrine + the -0.0 rail (test_negzero.py).
- string: the universal portable carrier (wide decimals, arrays, md5
  digests all ship as strings — see q_moments_value's s1..s4).
- bool, date, timestamp (NTZ only — session-TZ-aware timestamps are
  exactly the drift class the hash fails on).

Everything else — decimal(p,s), float32, int16/int8, binary, arrays,
maps, structs, TZ-aware timestamps — is banned as an OUTPUT dtype.
Wide decimals remain fine as INTERNAL accumulators; cast to STRING (or
split hi/lo BIGINT) at the output projection.

tools/check_oracle.py enforces the same list per-run (DTYPE-RISK), so
a violation is caught both at pytest time and at oracle-check time.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from mapreduce_sssp_spark.dtype_parity import (
    OUTPUT_DTYPE_WHITELIST,
    canon_spark_dtype,
)

SF_SMOKE = "/root/testdata/sf0.001"


def test_every_registry_query_emits_whitelisted_output_dtypes(spark):
    """Build (not execute) every registry query at sf0.001 and assert
    every output column's canonical dtype is whitelisted."""
    violations = {}
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_SMOKE)
        bad = [
            f"{f.name}:{canon_spark_dtype(f.dataType)}"
            for f in df.schema.fields
            if canon_spark_dtype(f.dataType) not in OUTPUT_DTYPE_WHITELIST
        ]
        if bad:
            violations[name] = bad
    assert not violations, (
        "non-portable output dtypes (driver hash WILL eventually fail "
        "on these even when values match — cast to STRING/BIGINT at the "
        f"output projection): {violations}"
    )


@pytest.mark.parametrize(
    "banned",
    ["decimal(38,0)", "float32", "int16", "binary", "timestamp_tz"],
)
def test_whitelist_rejects_known_bad_classes(banned):
    assert banned not in OUTPUT_DTYPE_WHITELIST
