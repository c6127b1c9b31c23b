"""SCC fixpoint: crafted-graph semantics + a Tarjan referee on a
fixed-seed random digraph (iterative Tarjan — an entirely sequential,
entirely independent algorithm)."""

from __future__ import annotations

import random

from mapreduce_sssp_spark.graph.scc import scc

CASES = {
    "cycle_with_tail": (
        [(1, 2), (2, 3), (3, 1), (3, 4)],
        {1: 1, 2: 1, 3: 1, 4: 4},
    ),
    "two_sccs_chained": (
        [(1, 2), (2, 1), (2, 3), (3, 4), (4, 3)],
        {1: 1, 2: 1, 3: 3, 4: 3},
    ),
    "dag": ([(1, 2), (2, 3), (1, 3)], {1: 1, 2: 2, 3: 3}),
    "selfloop_and_edge": ([(5, 5), (6, 7)], {5: 5, 6: 6, 7: 7}),
    # SCC {2,3}'s min-color is blocked by upstream SCC {0,1} in round 1
    # and resolves in round 2 — the multi-outer-round path.
    "blocked_scc": (
        [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2)],
        {0: 0, 1: 0, 2: 2, 3: 2},
    ),
}


def test_scc_crafted_graphs(spark):
    for name, (edges, want) in CASES.items():
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r.scc for r in scc(df).collect()}
        assert got == want, name
        spark.catalog.clearCache()


def test_scc_empty_edges(spark):
    """Zero edges → zero SCC rows with the standard schema, not an
    IndexError on the unassembled parts list."""
    df = spark.createDataFrame([], "src long, dst long")
    out = scc(df)
    assert out.columns == ["node", "scc"]
    assert out.count() == 0


def _tarjan(edges):
    """Iterative Tarjan; returns {node: min_member_of_its_scc}."""
    adj = {}
    nodes = set()
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        nodes.update((u, v))
    index = {}
    low = {}
    on_stack = set()
    stack = []
    counter = [0]
    label = {}

    for start in sorted(nodes):
        if start in index:
            continue
        work = [(start, iter(adj.get(start, [])))]
        index[start] = low[start] = counter[0]
        counter[0] += 1
        stack.append(start)
        on_stack.add(start)
        while work:
            u, it = work[-1]
            advanced = False
            for v in it:
                if v not in index:
                    index[v] = low[v] = counter[0]
                    counter[0] += 1
                    stack.append(v)
                    on_stack.add(v)
                    work.append((v, iter(adj.get(v, []))))
                    advanced = True
                    break
                elif v in on_stack:
                    low[u] = min(low[u], index[v])
            if advanced:
                continue
            work.pop()
            if work:
                pu = work[-1][0]
                low[pu] = min(low[pu], low[u])
            if low[u] == index[u]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == u:
                        break
                m = min(comp)
                for w in comp:
                    label[w] = m
    return label


def test_scc_matches_tarjan_on_random_graph(spark):
    rng = random.Random(20260815)
    n = 30
    edges = sorted(
        {(rng.randrange(n), rng.randrange(n)) for _ in range(70)}
    )
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.scc for r in scc(df).collect()}
    want = _tarjan(edges)
    assert got == want


def test_condensation_is_acyclic(spark, sf_dir):
    """The condensation must be a DAG (cycle would mean two SCCs are
    mutually reachable — a contradiction)."""
    from mapreduce_sssp_spark.operators.graph_queries import (
        q_condensation_dag,
    )

    edges = [
        (r.scc_src, r.scc_dst)
        for r in q_condensation_dag(spark, sf_dir).collect()
    ]
    # Kahn's algorithm: a DAG fully empties.
    from collections import defaultdict, deque

    indeg = defaultdict(int)
    adj = defaultdict(list)
    nodes = set()
    for u, v in edges:
        adj[u].append(v)
        indeg[v] += 1
        nodes.update((u, v))
    q = deque(n for n in nodes if indeg[n] == 0)
    seen = 0
    while q:
        u = q.popleft()
        seen += 1
        for v in adj[u]:
            indeg[v] -= 1
            if indeg[v] == 0:
                q.append(v)
    assert seen == len(nodes), "condensation contains a cycle"
