"""PageRank cross-check against a numpy power iteration implementing
identical semantics (uniform init, dangling redistribution, fixed
synchronous rounds)."""

from __future__ import annotations

import numpy as np
import pytest


def _numpy_pagerank(edges, *, damping=0.85, iterations=10):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for s, d in set(edges):
        out.setdefault(s, []).append(d)
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        dangling = sum(r[idx[u]] for u in nodes if u not in out)
        nxt = np.full(n, (1.0 - damping) / n) + damping * dangling / n
        for s, ds in out.items():
            share = r[idx[s]] / len(ds)
            for d in ds:
                nxt[idx[d]] += damping * share
        r = nxt
    return {n_: r[idx[n_]] for n_ in nodes}


GRAPHS = {
    "line": [(1, 2), (2, 3), (3, 4)],
    "cycle_with_tail": [(1, 2), (2, 3), (3, 1), (3, 4)],
    "star_hub": [(1, 5), (2, 5), (3, 5), (4, 5), (5, 1)],
    "two_components": [(1, 2), (2, 1), (10, 11)],
    "parallel_edges": [(1, 2), (1, 2), (2, 1)],  # collapse to simple links
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_pagerank_matches_numpy(spark, name):
    from mapreduce_sssp_spark.graph.pagerank import pagerank

    edges = GRAPHS[name]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, iterations=10).collect()}
    want = _numpy_pagerank(edges, iterations=10)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], rel=1e-9), node
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def _numpy_ppr(edges, source, *, damping=0.85, iterations=10):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for s, d in set(edges):
        out.setdefault(s, []).append(d)
    r = np.zeros(n)
    r[idx[source]] = 1.0
    for _ in range(iterations):
        dangling = sum(r[idx[u]] for u in nodes if u not in out)
        nxt = np.zeros(n)
        nxt[idx[source]] = (1.0 - damping) + damping * dangling
        for s, ds in out.items():
            share = r[idx[s]] / len(ds)
            for d in ds:
                nxt[idx[d]] += damping * share
        r = nxt
    return {n_: r[idx[n_]] for n_ in nodes}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_personalized_pagerank_matches_numpy(spark, name):
    from mapreduce_sssp_spark.graph.pagerank import pagerank

    edges = GRAPHS[name]
    source = min(s for s, _ in edges)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.rank
        for r in pagerank(df, iterations=10, source=source).collect()
    }
    want = _numpy_ppr(edges, source, iterations=10)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], rel=1e-9, abs=1e-12), node
    # Mass conservation: restarts keep total mass at 1.
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)
    # Personalization really biases towards the seed's neighborhood:
    # the seed outranks its global-pagerank self.
    uniform = _numpy_pagerank(edges, iterations=10)
    assert want[source] >= uniform[source] - 1e-12
