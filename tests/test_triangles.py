"""Triangle counting: hand-built graphs with known counts, plus a
randomized cross-check against an itertools brute force (the trusted
independent implementation — no orientation, no joins)."""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreduce_sssp_spark.graph.triangles import canonical_edges, triangle_counts


def _run(spark, pairs):
    df = spark.createDataFrame(pairs, "u long, v long")
    return {
        r.node: r.n_tri for r in triangle_counts(canonical_edges(df)).collect()
    }


def _brute(pairs):
    edges = {(min(u, v), max(u, v)) for u, v in pairs if u != v}
    nodes = sorted({n for e in edges for n in e})
    counts: dict[int, int] = {}
    for a, b, c in combinations(nodes, 3):
        if {(a, b), (b, c), (a, c)} <= edges:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_k4_every_node_in_three_triangles(spark):
    k4 = [(u, v) for u, v in combinations(range(4), 2)]
    assert _run(spark, k4) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_path_graph_has_no_triangles(spark):
    path = [(i, i + 1) for i in range(5)]
    assert _run(spark, path) == {}


def test_duplicate_reversed_and_self_loop_edges_are_canonicalized(spark):
    tri = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (1, 2)]
    assert _run(spark, tri) == {0: 1, 1: 1, 2: 1}


def test_hub_star_plus_rim(spark):
    # Hub 0 connected to 1..6; rim edges (1,2),(3,4) close two triangles.
    pairs = [(0, i) for i in range(1, 7)] + [(1, 2), (3, 4)]
    assert _run(spark, pairs) == {0: 2, 1: 1, 2: 1, 3: 1, 4: 1}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=30
    )
)
def test_random_graphs_match_brute_force(spark, pairs):
    assert _run(spark, pairs) == _brute(pairs)


def test_edge_tie_strength_hand_graph(spark):
    """Kite graph: K3 {1,2,3} plus pendant 4-3. Common neighbors and
    jaccard per edge, hand-computed."""
    from mapreduce_sssp_spark.graph.triangles import edge_tie_strength

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "u long, v long"
    )
    got = {
        (r.u, r.v): r for r in edge_tie_strength(canonical_edges(df)).collect()
    }
    assert set(got) == {(1, 2), (2, 3), (1, 3), (3, 4)}
    # (1,2): common {3}; union = nbrs(1)\{2} u nbrs(2)\{1} = {3} -> 1/1
    assert got[(1, 2)].n_common == 1 and got[(1, 2)].jaccard == 1.0
    # (2,3): common {1}; union = {1} u {1,4} = {1,4} -> 1/2
    assert got[(2, 3)].n_common == 1 and got[(2, 3)].jaccard == 0.5
    assert got[(1, 3)].n_common == 1 and got[(1, 3)].jaccard == 0.5
    # (3,4): no common; union = {1,2} -> 0, jaccard 0.0
    assert got[(3, 4)].n_common == 0 and got[(3, 4)].jaccard == 0.0
    assert (got[(3, 4)].deg_u, got[(3, 4)].deg_v) == (3, 1)


def test_edge_tie_strength_isolated_edge_union_empty(spark):
    """A lone edge has empty neighborhood union -> jaccard defined 0.0."""
    from mapreduce_sssp_spark.graph.triangles import edge_tie_strength

    df = spark.createDataFrame([(7, 9)], "u long, v long")
    (r,) = edge_tie_strength(canonical_edges(df)).collect()
    assert (r.n_common, r.jaccard) == (0, 0.0)


def test_graph_sample_khop_bounded_fanout(spark, sf_dir):
    """No node contributes more than K=3 edges per hop, every hop-1
    source is a seed-derived node, and hop-2 sources come from hop-1
    destinations."""
    from collections import Counter

    from mapreduce_sssp_spark.operators.graph_queries import (
        q_graph_sample_khop,
    )

    rows = q_graph_sample_khop(spark, sf_dir).collect()
    per = Counter((r.hop, r.src) for r in rows)
    assert per and max(per.values()) <= 3
    h1_dst = {r.dst for r in rows if r.hop == 1}
    h2_src = {r.src for r in rows if r.hop == 2}
    assert h2_src <= h1_dst


def test_two_hop_paths_matches_python(spark, sf_dir):
    """FoF counts cross-checked against a pure-Python enumeration."""
    from collections import defaultdict

    from mapreduce_sssp_spark.io.sources import edges_from_lineitem
    from mapreduce_sssp_spark.operators.graph_queries import q_two_hop_paths

    edges = {
        (r.src, r.dst)
        for r in edges_from_lineitem(spark, sf_dir)
        .select("src", "dst")
        .distinct()
        .collect()
    }
    out = defaultdict(set)
    for s, d in edges:
        out[s].add(d)
    want = {}
    for s in out:
        n_paths = sum(len(out.get(m, ())) for m in out[s])
        fof = {
            e
            for m in out[s]
            for e in out.get(m, ())
            if e != s and (s, e) not in edges
        }
        if n_paths:
            want[s] = (n_paths, len(fof))
    got = {
        r.src: (r.n_paths2, r.n_fof)
        for r in q_two_hop_paths(spark, sf_dir).collect()
    }
    assert got == want
