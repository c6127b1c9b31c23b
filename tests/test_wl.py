"""Referee for Weisfeiler-Lehman color refinement: pure-python WL with
the identical label scheme (degree string -> md5(own|sorted,neighbors))
recomputed from the raw parquet, compared per node."""

from __future__ import annotations

import hashlib

import duckdb

SF = "/root/testdata/sf0.001"


def _wl_python():
    con = duckdb.connect()
    edges = con.execute(
        f"SELECT DISTINCT l_suppkey, l_partkey FROM '{SF}/lineitem.parquet'"
    ).fetchall()
    nbrs = {}
    for s, d in edges:
        nbrs.setdefault(s, []).append(d)
        nbrs.setdefault(d, []).append(s)
    lbl = {v: str(len(ns)) for v, ns in nbrs.items()}
    for _ in range(2):
        nxt = {}
        for v, ns in nbrs.items():
            sig = ",".join(sorted(lbl[u] for u in ns))
            nxt[v] = hashlib.md5(
                (lbl[v] + "|" + sig).encode()
            ).hexdigest()
        lbl = nxt
    return {v: (len(ns), lbl[v]) for v, ns in nbrs.items()}


def test_wl_relabel_matches_python(spark):
    from mapreduce_sssp_spark.operators.graph_queries import q_wl_relabel

    want = _wl_python()
    got = {r.node: (r.degree, r.wl_label) for r in
           q_wl_relabel(spark, SF).collect()}
    assert got == want


def test_wl_refines_strictly_on_this_graph(spark):
    """Round-2 WL must distinguish at least as many classes as the raw
    degree histogram — refinement never merges classes."""
    want = _wl_python()
    deg_classes = {d for d, _ in want.values()}
    wl_classes = {h for _, h in want.values()}
    assert len(wl_classes) >= len(deg_classes)
