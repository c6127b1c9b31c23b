from __future__ import annotations

from mapreduce_sssp_spark.graph.compat import (
    format_final_line,
    format_reverse_line,
)
from mapreduce_sssp_spark.graph.reverse import adjacency_list, reverse_graph
from mapreduce_sssp_spark.graph.sssp import sssp


def _edges(spark, triples):
    return spark.createDataFrame(triples, "src long, dst long, weight double")


def test_reverse_graph_sorted_groups(spark):
    # edges u->v grouped as v -> sorted list of u (ReverseGraph.java net effect)
    e = _edges(spark, [(3, 1, 1.0), (2, 1, 1.0), (1, 2, 1.0), (2, 1, 1.0)])
    rows = reverse_graph(e).collect()
    assert [(r["node"], r["neighbors"]) for r in rows] == [(1, [2, 3]), (2, [1])]


def test_reverse_graph_keeps_duplicates_when_asked(spark):
    e = _edges(spark, [(2, 1, 1.0), (2, 1, 1.0)])
    rows = reverse_graph(e, distinct=False).collect()
    assert [(r["node"], r["neighbors"]) for r in rows] == [(1, [2, 2])]


def test_adjacency_list(spark):
    e = _edges(spark, [(1, 3, 2.0), (1, 2, 5.0), (1, 2, 1.0)])
    rows = adjacency_list(e).collect()
    assert rows[0]["node"] == 1
    assert [(a["dst"], a["weight"]) for a in rows[0]["adj"]] == [
        (2, 1.0),
        (2, 5.0),
        (3, 2.0),
    ]


def test_compat_line_formats(spark):
    e = _edges(spark, [(1, 2, 1.0)])
    final = format_final_line(sssp(e, 1)).collect()
    assert {r["value"] for r in final} == {"1 1 0.0", "1 2 1.0"}
    rev = format_reverse_line(reverse_graph(e)).collect()
    assert [r["value"] for r in rev] == ["2\t1"]


def test_wcc_two_components(spark):
    from mapreduce_sssp_spark.graph.wcc import wcc

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (12, 11), (5, 5)],
        "src long, dst long",
    )
    out = {r.node: r.component for r in wcc(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 5: 5}
