"""HITS cross-check against a numpy power iteration implementing
identical semantics (uniform hub init, synchronous auth-then-hub
updates, fixed round count, ONE L1 normalization at the end — the
linear updates commute with scaling, see graph/hits.py)."""

from __future__ import annotations

import numpy as np
import pytest


def _numpy_hits(edges, *, iterations=6):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    simple = sorted(set(edges))
    h = np.full(n, 1.0 / n)
    a = np.zeros(n)
    for _ in range(iterations):
        a = np.zeros(n)
        for s, d in simple:
            a[idx[d]] += h[idx[s]]
        h = np.zeros(n)
        for s, d in simple:
            h[idx[s]] += a[idx[d]]
    a = a / a.sum()
    h = h / h.sum()
    return (
        {v: h[idx[v]] for v in nodes},
        {v: a[idx[v]] for v in nodes},
    )


GRAPHS = {
    "line": [(1, 2), (2, 3), (3, 4)],
    "cycle_with_tail": [(1, 2), (2, 3), (3, 1), (3, 4)],
    "star_hub": [(1, 5), (2, 5), (3, 5), (4, 5), (5, 1)],
    "bipartite": [(1, 10), (1, 11), (2, 10), (2, 11), (3, 11)],
    "parallel_edges": [(1, 2), (1, 2), (2, 1)],  # collapse to simple links
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_hits_matches_numpy(spark, name):
    from mapreduce_sssp_spark.graph.hits import hits

    edges = GRAPHS[name]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = hits(df, iterations=6).collect()
    got_h = {r.node: r.hub for r in rows}
    got_a = {r.node: r.auth for r in rows}
    want_h, want_a = _numpy_hits(edges, iterations=6)
    assert set(got_h) == set(want_h)
    for v in want_h:
        assert got_h[v] == pytest.approx(want_h[v], rel=1e-9, abs=1e-12), v
        assert got_a[v] == pytest.approx(want_a[v], rel=1e-9, abs=1e-12), v
    # L1 invariants and the structural zeros.
    assert sum(got_h.values()) == pytest.approx(1.0, rel=1e-9)
    assert sum(got_a.values()) == pytest.approx(1.0, rel=1e-9)
    srcs = {s for s, _ in edges}
    dsts = {d for _, d in edges}
    for v in set(got_h) - srcs:  # pure sinks hub 0
        assert got_h[v] == 0.0, v
    for v in set(got_a) - dsts:  # pure sources auth 0
        assert got_a[v] == 0.0, v


def test_hits_star_ranking(spark):
    """On the star, node 5 is THE authority and the leaves are the
    hubs pointing at it — the qualitative shape HITS exists to find."""
    from mapreduce_sssp_spark.graph.hits import hits

    df = spark.createDataFrame(GRAPHS["star_hub"], "src long, dst long")
    rows = {r.node: r for r in hits(df, iterations=6).collect()}
    assert rows[5].auth == max(r.auth for r in rows.values())
    for leaf in (1, 2, 3, 4):
        assert rows[leaf].hub > rows[5].hub
