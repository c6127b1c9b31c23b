"""Property-based cross-checks (hypothesis): the custom as-of join
against pandas.merge_asof, and the WCC fixpoint against a union-find —
randomized inputs, trusted independent implementations.

Example counts are small (Spark jobs per example); deadlines disabled.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreduce_sssp_spark.operators.asof import asof_join

KEYS = st.integers(min_value=0, max_value=2)
TIMES = st.integers(min_value=0, max_value=20)

left_rows = st.lists(st.tuples(KEYS, TIMES), min_size=1, max_size=12)
right_rows = st.lists(st.tuples(KEYS, TIMES, st.integers(0, 99)), max_size=12)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=left_rows, right=right_rows)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    # De-dup (key, time) on the right: with ties merge_asof keeps the
    # LAST row while the window formulation keeps the last in sort order
    # too, but sort stability differs — dropping ties makes the spec
    # unambiguous without weakening the <= semantics under test.
    seen = set()
    right = [
        r for r in right if (r[0], r[1]) not in seen and not seen.add((r[0], r[1]))
    ]
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k long, t long, lid long"
    )
    rdf = spark.createDataFrame(right, "k long, t long, v long")
    got = {
        (r.lid): r.asof_v
        for r in asof_join(ldf, rdf, "k", "t", "t", ["v"]).collect()
    }

    lp = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], columns=["k", "t", "lid"]
    ).sort_values("t", kind="mergesort")
    rp = pd.DataFrame(right, columns=["k", "t", "v"]).sort_values(
        "t", kind="mergesort"
    )
    if rp.empty:
        want = {int(r.lid): None for r in lp.itertuples()}
    else:
        m = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
        want = {
            int(r.lid): (None if pd.isna(r.v) else int(r.v)) for r in m.itertuples()
        }
    assert got == want


edges_strategy = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)), min_size=1, max_size=25
)


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edges_strategy)
def test_wcc_matches_union_find(spark, edges):
    from mapreduce_sssp_spark.graph.wcc import wcc

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in wcc(df).collect()}
    want = _union_find_components(edges)
    # Same partition into components AND min-id labeling.
    assert got == want


words_strategy = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=6), min_size=1, max_size=12
)


def _ref_bpe(words: list[str], n_merges: int):
    """Trusted pure-Python twin of _learn_bpe: positional pair counts
    over the distinct-word vocab, (count DESC, lhs, rhs) argmax, and
    str.replace merge application — Python's replace is the same
    non-overlapping left-to-right scan as Spark/DuckDB replace()."""
    from collections import Counter

    vocab = Counter(words)
    sym_counts = Counter()
    for w, c in vocab.items():
        sym_counts[" " + " ".join(w) + " "] += c
    merges = []
    for rank in range(1, n_merges + 1):
        pc = Counter()
        for s, c in sym_counts.items():
            sy = s.split()
            for a, b in zip(sy, sy[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        (l, r), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, n))
        nxt = Counter()
        for s, c in sym_counts.items():
            nxt[s.replace(f" {l} {r} ", f" {l}{r} ")] += c
        sym_counts = nxt
    return merges


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(words=words_strategy)
def test_bpe_merges_match_pure_python(spark, words):
    from mapreduce_sssp_spark.operators.text_analysis import _learn_bpe

    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    merges, vocab = _learn_bpe(docs, 3)
    vocab.unpersist()
    assert merges == _ref_bpe(words, 3)


NEAREST_TIMES = st.integers(min_value=0, max_value=15)
probe_rows = st.lists(
    st.tuples(st.integers(0, 1), NEAREST_TIMES), min_size=1, max_size=10
)
click_rows = st.lists(
    st.tuples(st.integers(0, 1), NEAREST_TIMES), max_size=10
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(probes=probe_rows, clicks=click_rows)
def test_nearest_join_matches_bruteforce(spark, probes, clicks):
    """asof_join_nearest core vs a brute-force referee implementing the
    documented spec: closest |gap| wins, tie -> backward; backward
    includes equal timestamps, forward is strictly later; tie clicks at
    one timestamp -> max id backward, min id forward."""
    import datetime

    from mapreduce_sssp_spark.operators.asof import nearest_join

    t0 = datetime.datetime(2024, 1, 1)

    def ts(t):
        return t0 + datetime.timedelta(hours=t)

    ldf = spark.createDataFrame(
        [(i, k, ts(t)) for i, (k, t) in enumerate(probes)],
        "event_id long, user_id long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, 100 + i, ts(t)) for i, (k, t) in enumerate(clicks)],
        "user_id long, _r_id long, _r_ts timestamp",
    )
    got = {
        r.event_id: (r.click_id, r.direction)
        for r in nearest_join(ldf, rdf).collect()
    }

    want = {}
    for i, (k, t) in enumerate(probes):
        back = [
            (ct, cid)
            for cid, (ck, ct) in [
                (100 + j, c) for j, c in enumerate(clicks)
            ]
            if ck == k and ct <= t
        ]
        fwd = [
            (ct, cid)
            for cid, (ck, ct) in [
                (100 + j, c) for j, c in enumerate(clicks)
            ]
            if ck == k and ct > t
        ]
        b = max(back) if back else None  # max (ts, id): latest, max id
        f = min(fwd) if fwd else None    # min (ts, id): earliest, min id
        if b is None and f is None:
            want[i] = (None, None)
        elif f is None or (b is not None and (t - b[0]) <= (f[0] - t)):
            want[i] = (b[1], "backward")
        else:
            want[i] = (f[1], "forward")
    assert got == want


cdc_snap = st.lists(st.tuples(st.integers(0, 5), st.integers(0, 999)),
                    max_size=6, unique_by=lambda r: r[0])
cdc_log = st.lists(
    st.tuples(
        st.integers(0, 7),          # key (some outside the snapshot)
        st.integers(0, 4),          # seq (ties possible)
        st.sampled_from(["U", "D"]),
        st.integers(0, 999),
    ),
    max_size=10,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(snap=cdc_snap, log=cdc_log)
def test_merge_apply_matches_bruteforce(spark, snap, log):
    """merge_apply vs a referee implementing last-write-wins with the
    (seq, op, cents) total-order election and MERGE semantics."""
    from mapreduce_sssp_spark.operators.cdc import merge_apply

    sdf = spark.createDataFrame(
        snap or [], "key long, base_cents long"
    ) if snap else spark.createDataFrame([], "key long, base_cents long")
    ldf = spark.createDataFrame(
        log or [], "key long, seq long, op string, cents long"
    ) if log else spark.createDataFrame([], "key long, seq long, op string, cents long")
    got = {r.key: (r.cents, r.action) for r in merge_apply(sdf, ldf).collect()}

    latest = {}
    for k, seq, op, cents in log:
        cand = (seq, op, cents)
        if k not in latest or cand > latest[k]:
            latest[k] = cand
    base = dict(snap)
    want = {}
    for k, v in base.items():
        if k not in latest:
            want[k] = (v, "base")
    for k, (seq, op, cents) in latest.items():
        if op == "D":
            continue
        want[k] = (cents, "updated" if k in base else "inserted")
    assert got == want


pit_events = st.lists(
    st.tuples(
        st.integers(0, 1),               # user
        st.integers(0, 8),               # hour
        st.sampled_from(["a", "b", "purchase"]),
    ),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=pit_events)
def test_point_in_time_join_matches_bruteforce(spark, events):
    """The leakage-safe temporal join vs a referee implementing the
    documented spec: SCD2 runs ordered by (ts, event_id); a probe sees
    the state of the latest interval with valid_from STRICTLY before
    its timestamp; run starts tying with the probe instant are
    invisible; ties among run starts resolve to the highest run_id."""
    import datetime
    import tempfile

    from mapreduce_sssp_spark.operators.event_windows import (
        q_point_in_time_join,
    )

    t0 = datetime.datetime(2024, 1, 1)

    def ts(h):
        return t0 + datetime.timedelta(hours=h)

    rows = [
        (i, ts(h), u, typ, 0.0, None)
        for i, (u, h, typ) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = tempfile.mkdtemp(prefix="pit-prop-")
    df.write.parquet(f"{d}/events.parquet")
    got = {
        r.event_id: (r.state_asof, r.state_since)
        for r in q_point_in_time_join(spark, d).collect()
    }

    # Referee: build runs per user, then probe.
    from collections import defaultdict

    by_user = defaultdict(list)
    for i, (u, h, typ) in enumerate(events):
        by_user[u].append((ts(h), i, typ))
    intervals = defaultdict(list)  # user -> [(valid_from, run_id, state)]
    for u, evs in by_user.items():
        evs.sort()
        run_id = 0
        prev = None
        for t, i, typ in evs:
            if prev is None or typ != prev:
                run_id += 1
                intervals[u].append((t, run_id, typ))
            prev = typ
    want = {}
    for i, (u, h, typ) in enumerate(events):
        if typ != "purchase":
            continue
        cands = [
            (vf, rid, state)
            for vf, rid, state in intervals[u]
            if vf < ts(h)
        ]
        if cands:
            vf, rid, state = max(cands, key=lambda c: (c[0], c[1]))
            want[i] = (state, vf)
        else:
            want[i] = (None, None)
    assert got == want


skyline_rows = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 40)), min_size=1, max_size=25
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=skyline_rows)
def test_skyline_2d_matches_bruteforce(spark, rows):
    """The two-level bucketed skyline must equal the O(n^2) dominance
    definition on random integer points (minimize x, maximize y) —
    including duplicates and cross-bucket-boundary dominance, the two
    cases the prefix-carry decomposition could plausibly get wrong."""
    from mapreduce_sssp_spark.operators.relational import skyline_2d

    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(rows)],
        "rid long, x long, y long",
    )
    got = {(r.rid, r.x, r.y) for r in skyline_2d(df, "x", "y").collect()}
    want = {
        (i, x, y)
        for i, (x, y) in enumerate(rows)
        if not any(qx < x and qy > y for qx, qy in rows)
    }
    assert got == want


# --- portable minhash-LSH mirror (r10) ---------------------------------

_VOCAB = ["alpha", "beta", "gamma", "delta", "epsi", "zeta", "eta", "theta"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=3, max_size=8),
    min_size=2,
    max_size=8,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=docs_strategy, dup_mask=st.lists(st.booleans(), max_size=8))
def test_dedup_minhash_engine_matches_duckdb_mirror(
    spark, tmp_path_factory, docs, dup_mask
):
    """The portable LSH pipeline (universal-hash signatures -> banding
    -> bucket cap -> exact verify) must agree with its DuckDB mirror
    (_LSH_PAIRS_SQL) on arbitrary corpora — including planted exact and
    near duplicates, which exercise the identical-signature bucket path
    the banding device exists for. This is the randomized referee for
    the r10 'cap is contract' claim."""
    import duckdb

    from mapreduce_sssp_spark.operators.dedup import ORACLE, q_dedup_minhash

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    # Plant duplicates/near-duplicates for masked docs: an exact copy
    # and a one-token-dropped near copy (high but <1 Jaccard when the
    # doc is long enough).
    nid = 100
    for i, dup in enumerate(dup_mask[: len(docs)]):
        if dup:
            rows.append((nid, " ".join(docs[i])))
            rows.append((nid + 1, " ".join(docs[i][:-1])))
            nid += 10
    df = spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id",
        "text",
        "'en' AS lang",
        "'src' AS source",
        "cast(length(text) AS long) AS n_chars",
    )
    d = tmp_path_factory.mktemp("mh_prop")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    got = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in q_dedup_minhash(spark, str(d)).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    want = {
        (a, b, round(j, 9))
        for a, b, j in con.execute(ORACLE["dedup_minhash"]).fetchall()
    }
    assert got == want
    spark.catalog.clearCache()
