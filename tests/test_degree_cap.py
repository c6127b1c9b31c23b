"""Degree-capped hub-quadratic joins: the in-plan 99.9th-permille cap
must (a) compute the exact order statistic, (b) actually prune a hub on
a skewed graph, and (c) plan the cap filter as a semi-join feeding the
pair self-join (never a post-join filter).

The TPC-H-derived testdata has near-uniform degrees, so the cap prunes
nothing there (the capped oracle twins hash-match the mechanism but
exercise the no-prune path); these tests inject crafted power-law skew
through the loader seam to prove the prune itself.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_sssp_spark.operators import graph_queries as G


def test_permille_cap_exact_order_statistic(spark):
    # 1500 loads of 1 and one hub load of 2500: cum(1)=1500,
    # 1500*1000 >= 1501*999, so the 99.9th-permille cap is 1.
    rows = [(i, 1) for i in range(1500)] + [(9999, 2500)]
    loads = spark.createDataFrame(rows, "mid long, load long")
    assert G._permille_cap(loads, "load").collect()[0].cap == 1

    # 998 of 1000 at 1: cum(1)=998 < 999*1000/1000 -> cap moves to 5.
    rows = [(i, 1) for i in range(998)] + [(9998, 5), (9999, 7)]
    loads = spark.createDataFrame(rows, "mid long, load long")
    assert G._permille_cap(loads, "load").collect()[0].cap == 5

    # Tiny input: a single load is its own 99.9th percentile.
    loads = spark.createDataFrame([(1, 42)], "mid long, load long")
    assert G._permille_cap(loads, "load").collect()[0].cap == 42


def _crafted_edges(spark):
    """1500 light relays (load 1) + one hub relay (load 50*50=2500)."""
    light = [(10000 + i, 20000 + i) for i in range(1500)] + [
        (20000 + i, 30000 + i) for i in range(1500)
    ]
    hub = [(i, 100) for i in range(50)] + [
        (100, 200 + j) for j in range(50)
    ]
    return spark.createDataFrame(light + hub, "src long, dst long")


def test_two_hop_capped_prunes_hub_relay(spark, monkeypatch):
    edges = _crafted_edges(spark)
    monkeypatch.setattr(
        G, "edges_from_lineitem", lambda _spark, _sf: edges
    )
    capped = {
        r.src: r.n_paths2
        for r in G.q_two_hop_paths_capped(spark, "unused").collect()
    }
    uncapped = {
        r.src: r.n_paths2
        for r in G.q_two_hop_paths(spark, "unused").collect()
    }
    # Uncapped: every hub in-neighbor i has 50 paths i->100->*.
    assert all(uncapped[i] == 50 for i in range(50))
    # Capped: the hub relay (load 2500 > cap 1) is gone; light relays
    # survive untouched.
    assert not any(i in capped for i in range(50))
    assert len(capped) == 1500
    assert all(
        capped[10000 + i] == 1 for i in range(0, 1500, 97)
    )


def test_bipartite_capped_prunes_hub_part(spark, monkeypatch):
    # 2000 light parts of degree 2 (pair (2k, 2k+1) shares 40 parts)
    # + two hub parts of degree 40 over suppliers 0..39.
    rows = [(2 * (j % 50), j) for j in range(2000)] + [
        (2 * (j % 50) + 1, j) for j in range(2000)
    ]
    rows += [(s, p) for p in (9998, 9999) for s in range(40)]
    inc = spark.createDataFrame(rows, "l_suppkey long, l_partkey long")
    monkeypatch.setattr(
        G, "load_table", lambda _spark, _sf, _name: inc
    )
    capped = G.q_bipartite_projection_capped(spark, "unused").collect()
    uncapped = G.q_bipartite_projection(spark, "unused").collect()
    # Uncapped: C(40,2)=780 hub-mediated pairs (n_shared>=2 via the two
    # hub parts) + 30 light-only pairs (2k,2k+1), k=20..49.
    assert len(uncapped) == 810
    # Capped: hub parts (degree 40 > cap 2) never generate pairs; only
    # the 50 light pairs survive, each with its true 40 shared parts.
    assert len(capped) == 50
    assert all(r.n_shared == 40 for r in capped)
    # deg1/deg2 stay TRUE degrees (full incidence), not capped ones.
    by_pair = {(r.s1, r.s2): r for r in capped}
    r = by_pair[(0, 1)]
    assert r.deg1 == 42 and r.deg2 == 42  # 40 light + 2 hub parts


def test_capped_plans_semi_join_before_pair_join(spark):
    import contextlib
    import io

    sf = "/root/testdata/sf0.001"
    for q in (G.q_two_hop_paths_capped, G.q_bipartite_projection_capped):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            q(spark, sf).explain("simple")
        plan = buf.getvalue()
        assert "LeftSemi" in plan, plan
        assert "CartesianProduct" not in plan, plan
