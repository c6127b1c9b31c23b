"""Cross-check the `sssp` query against pure-Python Dijkstra on the real
testdata graphs, and pin the round bound its DuckDB oracle depends on
(the round-bounded Bellman-Ford in operators/graph_queries.py is only
exact while every graph converges in < 64 synchronous rounds).
"""

from __future__ import annotations

import pytest

from mapreduce_sssp_spark.operators import graph_queries as gq
from tests.test_sssp import dijkstra

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("qname,edge_fn", [
    ("sssp", "edges_from_lineitem"),
    ("sssp_dag", "edges_order_chain"),
])
def test_sssp_matches_dijkstra_on_testdata(spark, qname, edge_fn):
    from mapreduce_sssp_spark.io import sources

    edges = getattr(sources, edge_fn)(spark, SF)
    triples = [(r["src"], r["dst"], r["weight"]) for r in edges.collect()]
    source = min(t[0] for t in triples)
    expected = dijkstra(triples, source)
    got = {r["node"]: r["dist"] for r in gq.QUERIES[qname](spark, SF).collect()}
    assert got == expected


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_b1_converges_well_inside_oracle_round_bound(spark, sf):
    """The sssp oracle runs EXACTLY 64 Bellman-Ford levels; that is only
    the converged fixpoint if the graph converges in fewer synchronous
    rounds. Pin it on the actual testdata (a refresh that produced a
    deeper graph would silently break the oracle without this)."""
    from mapreduce_sssp_spark.io.sources import edges_from_lineitem

    triples = [
        (r["src"], r["dst"], r["weight"])
        for r in edges_from_lineitem(spark, sf).collect()
    ]
    source = min(t[0] for t in triples)
    dist = {source: 0.0}
    rounds = 0
    while True:
        rounds += 1
        changed = False
        # Synchronous round: relax from the previous round's state.
        snapshot = dict(dist)
        for s, d, w in triples:
            if s in snapshot:
                cand = snapshot[s] + w
                if cand < dist.get(d, float("inf")):
                    dist[d] = cand
                    changed = True
        if not changed:
            break
        assert rounds < 64, "graph needs >= 64 rounds; raise the oracle bound"
    assert rounds < 32, f"converged in {rounds} rounds, margin shrinking"


def test_longest_path_dominates_shortest_on_dag(spark):
    """On the same DAG, every reachable node's critical-path distance is
    >= its shortest-path distance, with equality exactly where one path
    exists; source distance is 0 in both."""
    from mapreduce_sssp_spark.operators.graph_queries import (
        q_longest_path_dag,
        q_sssp_dag,
    )

    sf = "/root/testdata/sf0.001"
    longest = {r.node: r.dist for r in q_longest_path_dag(spark, sf).collect()}
    shortest = {
        r.node: r.dist
        for r in q_sssp_dag(spark, sf).collect()
        if r.dist != 65535.0
    }
    assert longest, "DAG must have reachable nodes"
    assert set(longest) == set(shortest)
    src = min(longest)
    assert longest[src] == 0.0 == shortest[src]
    assert all(longest[n] >= shortest[n] for n in longest)
    assert any(longest[n] > shortest[n] for n in longest), (
        "test DAG should contain at least one multi-path node"
    )
