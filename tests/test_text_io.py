"""The reference's two text input contracts, exercised on literal files.

Parse semantics under test (cited against the reference):
* weighted edge list: 4 space-separated fields, edge id DISCARDED
  (SingleSourceSP.java:60-66)
* TSV edge list: lines not starting with a digit are SKIPPED —
  SNAP-style '#' headers tolerated (ReverseGraph.java:110-128)
"""

from __future__ import annotations

from mapreduce_sssp_spark.io.sources import read_edge_list_text, read_tsv_edge_list


def test_weighted_edge_list_discards_edge_id(spark, tmp_path):
    p = tmp_path / "edges.txt"
    p.write_text("0 1 2 3.5\n999 2 3 0.25\n")
    rows = sorted(
        read_edge_list_text(spark, str(p)).collect(), key=lambda r: r.src
    )
    assert [tuple(r) for r in rows] == [(1, 2, 3.5), (2, 3, 0.25)]
    assert read_edge_list_text(spark, str(p)).columns == ["src", "dst", "weight"]


def test_tsv_edge_list_skips_comments(spark, tmp_path):
    p = tmp_path / "graph.txt"
    p.write_text("# Directed graph\n# Nodes: 3\n1\t2\n2\t3\nc stray line\n10\t1\n")
    rows = sorted(read_tsv_edge_list(spark, str(p)).collect(), key=lambda r: (r.src, r.dst))
    assert [tuple(r) for r in rows] == [(1, 2), (2, 3), (10, 1)]
