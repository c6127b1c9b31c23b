"""Empty-input contract sweep for the graph fixpoints: zero edges must
yield a zero-row frame with the operator's standard schema, never a
driver-side crash (the scc IndexError and pagerank/hits
ZeroDivisionError class)."""

from __future__ import annotations


def _empty(spark, schema):
    return spark.createDataFrame([], schema)


def test_fixpoints_handle_empty_edges(spark):
    from mapreduce_sssp_spark.graph.hits import hits
    from mapreduce_sssp_spark.graph.kcore import kcore
    from mapreduce_sssp_spark.graph.ktruss import ktruss
    from mapreduce_sssp_spark.graph.lpa import label_propagation
    from mapreduce_sssp_spark.graph.mis import mis_greedy
    from mapreduce_sssp_spark.graph.pagerank import pagerank
    from mapreduce_sssp_spark.graph.sssp import sssp
    from mapreduce_sssp_spark.graph.wcc import wcc

    sd = _empty(spark, "src long, dst long")
    sdw = _empty(spark, "src long, dst long, weight double")
    uv = _empty(spark, "u long, v long")

    cases = {
        "sssp": (sssp(sdw, 0), ["source", "node", "dist"]),
        "wcc": (wcc(sd), ["node", "component"]),
        "pagerank": (pagerank(sd), ["node", "rank"]),
        "hits": (hits(sd), ["node", "hub", "auth"]),
        "mis": (mis_greedy(uv), ["node", "in_mis", "decided_round"]),
        "kcore": (kcore(uv, 3), ["node", "core_deg"]),
        "ktruss": (ktruss(uv, 3), ["u", "v", "support"]),
        "lpa": (label_propagation(uv), None),
    }
    for name, (out, cols) in cases.items():
        if cols is not None:
            assert out.columns == cols, name
        assert out.count() == 0, name
        spark.catalog.clearCache()
