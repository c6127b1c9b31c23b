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


def test_asof_forward_semantics(spark):
    from mapreduce_sssp_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame(
        [
            (1, 10, _ts(30)),  # matches right at :40 (not :20)
            (2, 10, _ts(45)),  # no following right row -> NULLs
            (3, 20, _ts(20)),  # key isolation
            (4, 10, _ts(20)),  # exact tie: right at :20 IS visible (>=)
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
        for r in asof_join_forward(
            left, right, on="k", left_time="t", right_time="rt",
            right_cols=["rid", "rt"],
        ).collect()
    }
    assert out[1] == (102, _ts(40))
    assert out[2] == (None, None)
    assert out[3] == (200, _ts(25))
    assert out[4] == (101, _ts(20))
    assert len(out) == 4


def test_asof_both_directions_match_python_reference(spark):
    """Property: on pseudo-random keyed event sets, both as-of variants
    must agree with a brute-force Python reference, including exact
    ties and keys present on only one side."""
    import hashlib

    def h(i):  # deterministic pseudo-random minute in [0, 60)
        return int(hashlib.md5(f"m{i}".encode()).hexdigest()[:4], 16) % 60

    left_rows = [(i, (i * 7) % 5, _ts(h(i))) for i in range(60)]
    right_rows = [(1000 + i, (i * 3) % 6, _ts(h(i + 100))) for i in range(40)]
    left = spark.createDataFrame(left_rows, "lid long, k long, t timestamp_ntz")
    right = spark.createDataFrame(right_rows, "rid long, k long, rt timestamp_ntz")

    def ref(direction):
        out = {}
        for lid, k, t in left_rows:
            cands = [
                (rt, rid)
                for rid, rk, rt in right_rows
                if rk == k and (rt <= t if direction == "back" else rt >= t)
            ]
            if direction == "back":
                best = max(cands, default=None)  # latest; max rid on ties
            else:
                # earliest; min rid on ties (matches engine tiebreak)
                best = min(cands, default=None)
            out[lid] = best[1] if best else None
        return out

    from mapreduce_sssp_spark.operators.asof import asof_join, asof_join_forward

    back = {
        r.lid: r.asof_rid
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="rt",
            right_cols=["rid", "rt"],
        ).collect()
    }
    fwd = {
        r.lid: r.asof_rid
        for r in asof_join_forward(
            left, right, on="k", left_time="t", right_time="rt",
            right_cols=["rid", "rt"],
        ).collect()
    }
    ref_fwd = ref("fwd")
    assert fwd == ref_fwd, {k: (fwd[k], ref_fwd[k]) for k in fwd if fwd[k] != ref_fwd[k]}
    ref_back = ref("back")
    # backward ties are unordered among equal (rt); compare by rt value
    rt_of = {rid: rt for rid, _, rt in right_rows}
    for lid in back:
        a, b = back[lid], ref_back[lid]
        assert (a is None) == (b is None), (lid, a, b)
        if a is not None:
            assert rt_of[a] == rt_of[b], (lid, a, b)
