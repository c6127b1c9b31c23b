"""as-of join semantics: nearest-preceding match, exact ties, missing
preceding rows, key isolation."""

from __future__ import annotations

import datetime as dt

from mapreduce_sssp_spark.operators.asof import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 12, m)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts(30)),  # matches right at :20 (not :40)
            (2, 10, _ts(5)),   # no preceding right row -> NULLs
            (3, 20, _ts(30)),  # key isolation: only key-20 rows match
            (4, 10, _ts(20)),  # exact tie: right at :20 IS visible (<=)
        ],
        "lid long, k long, t timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts(10)),
            (101, 10, _ts(20)),
            (102, 10, _ts(40)),
            (200, 20, _ts(25)),
        ],
        "rid long, k long, rt timestamp_ntz",
    )
    out = {
        r.lid: (r.asof_rid, r.asof_rt)
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="rt",
            right_cols=["rid", "rt"],
        ).collect()
    }
    assert out[1] == (101, _ts(20))
    assert out[2] == (None, None)
    assert out[3] == (200, _ts(25))
    assert out[4] == (101, _ts(20))
    assert len(out) == 4  # every left row survives (left semantics)
