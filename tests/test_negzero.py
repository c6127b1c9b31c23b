"""Registry-wide sign-of-zero audit plus the REPR-DRIFT gate unit test.

IEEE -0.0 compares equal to +0.0 (Python, SQL, and the local mimic's
approx_equal all say so) but the external driver's value-hash
stringifies cells, so '-0.0' vs '0.0' is a hash failure.  Round 6
shipped exactly that: ``longest_path_dag`` negated the source node's
0.0 dist into -0.0 and the one red row in the repo was born.  This
sweep asserts no registered query emits -0.0 in any float/double
column at sf0.001, so every future negation/subtraction-based operator
(ewma, gini, z-score, correlation, longest-path) is covered the day it
is registered — the same registry-wide-audit device as
tests/test_dtype_parity.py, one level down (value representation
rather than dtype).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T

from mapreduce_sssp_spark import queries_registry as qr
from tools.check_oracle import approx_equal, compare

SF_SMOKE = "/root/testdata/sf0.001"


def _float_fields(schema):
    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.FloatType, T.DoubleType))
    ]


def _negzero_cells(c):
    # -0.0 == 0.0 numerically; the string cast is what distinguishes the
    # two, exactly as the driver's stringified hash does.
    return F.sum(
        ((F.col(c) == F.lit(0.0)) & (F.col(c).cast("string") == F.lit("-0.0")))
        .cast("long")
    ).alias(c)


def test_no_registered_query_emits_negative_zero(spark):
    """One sweep, all offenders reported together.  Stays distributed:
    per query we aggregate a count of -0.0 cells over its float columns
    and collect one row, never the result set."""
    failures = []
    for name, fn in qr.QUERIES.items():
        sdf = fn(spark, SF_SMOKE)
        cols = _float_fields(sdf.schema)
        if cols:
            row = sdf.agg(*[_negzero_cells(c) for c in cols]).collect()[0]
            bad = {c: row[c] for c in cols if row[c]}
            if bad:
                failures.append(f"{name}: {bad}")
        spark.catalog.clearCache()
    assert not failures, (
        "-0.0 emitted (driver hash WILL fail; use F.lit(0.0) - col, not "
        "unary negation):\n" + "\n".join(failures)
    )


def test_negzero_detector_detects():
    """The sweep's detector itself must see -0.0 where == cannot."""
    import math

    assert -0.0 == 0.0  # why the naive gate was blind
    assert math.copysign(1.0, -0.0) != math.copysign(1.0, 0.0)


def test_approx_equal_flags_sign_of_zero():
    eq, dev = approx_equal(-0.0, 0.0)
    assert eq and dev == "reprdrift"
    eq, dev = approx_equal(0.0, -0.0)
    assert eq and dev == "reprdrift"
    eq, dev = approx_equal(0.0, 0.0)
    assert eq and dev == 0.0


def test_compare_reports_repr_drift_as_failure():
    """Pre-fix longest_path_dag must FAIL the local mimic: values equal,
    sign of zero drifts -> non-OK status (the r6 false-negative class)."""
    status, detail = compare(
        "t", ["a"], [(-0.0,), (1.5,)], ["a"], [(0.0,), (1.5,)]
    )
    assert status == "REPR-DRIFT"
    status, _ = compare("t", ["a"], [(0.0,), (1.5,)], ["a"], [(0.0,), (1.5,)])
    assert status == "OK"
