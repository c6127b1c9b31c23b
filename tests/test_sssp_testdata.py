"""Cross-check the no-oracle `sssp` query against pure-Python Dijkstra on
the real testdata graphs (backs the rows-only driver check — see
operators/graph_queries.py docstring for why DuckDB 1.0 cannot oracle a
cyclic-graph fixpoint).
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
