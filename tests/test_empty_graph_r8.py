"""Empty-graph / single-edge contract sweep for the round-8 graph
operators (wl_relabel, link_prediction_scores, the degree-capped joins,
negative_sampling, walk_pmi_pairs): a zero-edge or one-edge B1 table
must yield a well-formed (possibly empty) result, never a driver-side
crash. This is the r7 scc-IndexError / pagerank-ZeroDivisionError class
applied to the newest operators: permille caps over empty histograms
(NULL cap), modulo-|V| with |V| = 0, and zero-survivor capped joins.
"""

from __future__ import annotations

import pytest


def _fixture_dir(spark, tmp_path_factory, rows):
    """A sf-dir containing only lineitem.parquet with the given rows
    (schema cloned from the sf0.001 testdata so column dtypes match)."""
    schema = spark.read.parquet(
        "/root/testdata/sf0.001/lineitem.parquet"
    ).schema
    d = tmp_path_factory.mktemp("graphfix")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "lineitem.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    return _fixture_dir(spark, tmp_path_factory, [])


@pytest.fixture(scope="module")
def one_edge_dir(spark, tmp_path_factory):
    # One lineitem row -> a single edge 7 -> 1007 with weight 5.
    base = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .limit(1)
        .collect()[0]
        .asDict()
    )
    base.update({"l_suppkey": 7, "l_partkey": 1007, "l_quantity": 5.0})
    schema = spark.read.parquet(
        "/root/testdata/sf0.001/lineitem.parquet"
    ).schema
    d = tmp_path_factory.mktemp("graphfix1")
    spark.createDataFrame([tuple(base[f.name] for f in schema)], schema)\
        .coalesce(1).write.mode("overwrite").parquet(str(d / "lineitem.parquet"))
    return str(d)


R8_GRAPH_QUERIES = [
    "wl_relabel",
    "link_prediction_scores",
    "two_hop_paths_capped",
    "bipartite_projection_capped",
    "negative_sampling",
    "walk_pmi_pairs",
]


@pytest.mark.parametrize("qname", R8_GRAPH_QUERIES)
def test_r8_graph_ops_survive_empty_graph(spark, empty_dir, qname):
    from mapreduce_sssp_spark.queries_registry import QUERIES

    out = QUERIES[qname](spark, empty_dir)
    assert out.count() == 0, qname
    spark.catalog.clearCache()


@pytest.mark.parametrize("qname", R8_GRAPH_QUERIES)
def test_r8_graph_ops_survive_single_edge(spark, one_edge_dir, qname):
    from mapreduce_sssp_spark.queries_registry import QUERIES

    out = QUERIES[qname](spark, one_edge_dir)
    n = out.count()  # must execute; row count is op-specific
    assert n >= 0, qname
    spark.catalog.clearCache()
