"""Greedy MIS: hand graphs with known results plus randomized
cross-checks against a pure-Python sequential greedy (the trusted
reference — Luby local-minima with distinct priorities converges to
exactly the sequential greedy MIS in priority order), and the
clustering-coefficient consumer of the triangle closure."""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreduce_sssp_spark.graph.mis import (
    MIS_PRI_MOD,
    MIS_PRI_MULT,
    mis_greedy,
)
from mapreduce_sssp_spark.graph.triangles import (
    canonical_edges,
    clustering_coefficients,
)


def _pri(n: int) -> int:
    return (n * MIS_PRI_MULT) % MIS_PRI_MOD


def _run(spark, pairs):
    df = spark.createDataFrame(pairs, "u long, v long")
    rows = mis_greedy(canonical_edges(df)).collect()
    return {r.node: (r.in_mis, r.decided_round) for r in rows}


def _greedy_ref(pairs):
    """Sequential greedy MIS in priority order (the trusted model)."""
    adj: dict[int, set[int]] = {}
    for u, v in pairs:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    mis: set[int] = set()
    blocked: set[int] = set()
    for n in sorted(adj, key=_pri):
        if n not in blocked:
            mis.add(n)
            blocked |= adj[n]
    return mis


def test_triangle_selects_exactly_one(spark):
    out = _run(spark, [(1, 2), (2, 3), (1, 3)])
    winners = {n for n, (m, _) in out.items() if m}
    assert len(winners) == 1
    assert winners == {min((1, 2, 3), key=_pri)}
    # everything decided in round 1: one winner, two eliminated
    assert {r for _, (_, r) in out.items()} == {1}


def test_path_alternation_and_rounds(spark):
    # Path 1-2-3-4-5: result must be independent and maximal; rounds
    # must be consistent (a loser's round equals some adjacent winner's
    # round).
    pairs = [(i, i + 1) for i in range(1, 5)]
    out = _run(spark, pairs)
    mis = {n for n, (m, _) in out.items() if m}
    assert mis == _greedy_ref(pairs)
    for u, v in pairs:
        assert not (u in mis and v in mis)


def test_star_center_or_all_leaves(spark):
    star = [(10, i) for i in range(11, 19)]
    out = _run(spark, star)
    mis = {n for n, (m, _) in out.items() if m}
    assert mis == _greedy_ref(star)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=23),
            st.integers(min_value=0, max_value=23),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_matches_sequential_greedy(spark, raw):
    pairs = [(u, v) for u, v in raw if u != v]
    if not pairs:
        return
    out = _run(spark, pairs)
    mis = {n for n, (m, _) in out.items() if m}
    assert mis == _greedy_ref(pairs)
    # independence
    nbr = {(min(u, v), max(u, v)) for u, v in pairs}
    for u, v in nbr:
        assert not (u in mis and v in mis)
    # maximality: every non-member has a member neighbor
    adj: dict[int, set[int]] = {}
    for u, v in nbr:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    for n in adj:
        if n not in mis:
            assert adj[n] & mis
    # totality: every node decided
    assert all(m is not None for m, _ in out.values())


def test_tail_finish_matches_distributed(spark):
    """The hybrid driver tail finish must be byte-identical to the
    fully distributed loop — same in_mis AND same decided_round —
    whether it triggers immediately (default thresholds swallow a small
    graph whole), mid-loop (tail_nodes=10 forces 1-2 distributed rounds
    first), or never (tail_nodes=0)."""
    import random

    rng = random.Random(20260815)
    pairs = [
        (u, v)
        for u, v in {
            (rng.randrange(40), rng.randrange(40)) for _ in range(120)
        }
        if u != v
    ]
    ce = canonical_edges(spark.createDataFrame(pairs, "u long, v long"))

    def run(**kw):
        out = {
            r.node: (r.in_mis, r.decided_round)
            for r in mis_greedy(ce, **kw).collect()
        }
        spark.catalog.clearCache()
        return out

    distributed = run(tail_nodes=0)
    assert run() == distributed  # tail takes over at round 1
    assert run(tail_nodes=10) == distributed  # tail joins mid-loop
    # too-dense guard: an edge budget of 0 must keep it distributed
    assert run(tail_edges=0) == distributed


def test_mis_converges_within_oracle_unroll_at_sf001(spark):
    """The driver's oracle unrolls _MIS_ORACLE_ROUNDS rounds; the Spark
    fixpoint must converge (max decided_round) comfortably inside that
    bound on the real co-occurrence graph."""
    from mapreduce_sssp_spark.operators.graph_queries import (
        _MIS_ORACLE_ROUNDS,
        q_mis_greedy,
    )

    out = q_mis_greedy(spark, "/root/testdata/sf0.001").collect()
    assert all(r.in_mis is not None for r in out)
    max_round = max(r.decided_round for r in out)
    assert max_round <= _MIS_ORACLE_ROUNDS - 4  # safety margin


def test_clustering_coefficient_known_values(spark):
    # Triangle 1-2-3 with pendant 4 on node 3:
    #   nodes 1,2: deg 2, one closed pair -> lcc 1.0
    #   node 3: deg 3, pairs 3, one closed -> 1/3
    #   node 4: deg 1 -> 0.0 (and present in the output)
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "u long, v long"
    )
    rows = {
        r.node: r for r in clustering_coefficients(canonical_edges(df)).collect()
    }
    assert rows[1].lcc == 1.0 and rows[2].lcc == 1.0
    assert abs(rows[3].lcc - 1 / 3) < 1e-15
    assert rows[4].lcc == 0.0 and rows[4].n_tri == 0 and rows[4].deg == 1
    k4 = list(combinations(range(10, 14), 2))
    out = clustering_coefficients(
        canonical_edges(spark.createDataFrame(k4, "u long, v long"))
    ).collect()
    assert all(r.lcc == 1.0 and r.n_tri == 3 for r in out)


def test_random_walks_are_valid_edge_paths(spark):
    """Every consecutive (step t -> t+1) pair of a walk must be an edge
    of the graph, every start walks exactly WALK_STEPS steps, and the
    chosen successor is the argmin of the step hash over cur's
    neighbors (checked in pure Python)."""
    from mapreduce_sssp_spark.operators.graph_queries import (
        WALK_STEPS,
        _WALK_A1,
        _WALK_A2,
        _WALK_A3,
        _WALK_M,
        _part_cooccurrence_edges,
        q_random_walks,
    )

    sf = "/root/testdata/sf0.001"
    edges = {
        (r.u, r.v)
        for r in _part_cooccurrence_edges(spark, sf).collect()
    }
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    rows = q_random_walks(spark, sf).collect()
    walks = {}
    for r in rows:
        walks.setdefault(r.start, {})[r.step] = r.node
    assert set(walks) == set(adj)
    h = lambda c, t, n: (
        (c * _WALK_A1) % _WALK_M
        + (t * _WALK_A2) % _WALK_M
        + (n * _WALK_A3) % _WALK_M
    ) % _WALK_M
    for start, steps in walks.items():
        assert sorted(steps) == list(range(WALK_STEPS + 1))
        assert steps[0] == start
        for t in range(1, WALK_STEPS + 1):
            cur, nxt = steps[t - 1], steps[t]
            assert nxt in adj[cur]  # a real edge
            assert nxt == min(adj[cur], key=lambda n: (h(cur, t, n), n))


def test_dedup_keep_best_elects_longest_member(spark):
    from mapreduce_sssp_spark.operators.dedup import (
        q_dedup_keep_best,
        q_dedup_minhash_clusters,
    )
    from mapreduce_sssp_spark.operators.text_analysis import load_parallel

    sf = "/root/testdata/sf0.001"
    clusters = {}
    for r in q_dedup_minhash_clusters(spark, sf).collect():
        clusters.setdefault(r.canon_id, []).append(r.doc_id)
    nchars = {
        r.doc_id: r.n_chars
        for r in load_parallel(spark, sf, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    best = {r.canon_id: r for r in q_dedup_keep_best(spark, sf).collect()}
    assert set(best) == set(clusters)
    for canon, members in clusters.items():
        want = min(members, key=lambda d: (-nchars[d], d))
        r = best[canon]
        assert r.keep_id == want
        assert r.kept_n_chars == nchars[want]
        assert r.n_members == len(members)


def _ktruss_ref(pairs, k):
    """Pure-Python synchronous k-truss peel (the trusted model)."""
    es = set()
    adj = {}
    for u, v in pairs:
        if u == v:
            continue
        e = (min(u, v), max(u, v))
        es.add(e)
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    while True:
        doomed = [(u, v) for (u, v) in es if len(adj[u] & adj[v]) < k - 2]
        if not doomed:
            break
        for u, v in doomed:
            es.discard((u, v))
            adj[u].discard(v)
            adj[v].discard(u)
    return {(u, v): len(adj[u] & adj[v]) for u, v in es}


def test_ktruss_hand_and_random(spark):
    from itertools import combinations

    from mapreduce_sssp_spark.graph.ktruss import ktruss

    def run(pairs, k):
        df = spark.createDataFrame(pairs, "u long, v long")
        return {
            (r.u, r.v): r.support
            for r in ktruss(canonical_edges(df), k).collect()
        }

    # K5 with a pendant triangle: 4-truss keeps exactly the K5 (every
    # K5 edge has 3 common neighbors; the pendant triangle's edges have
    # only 1 and peel, cascading nothing else).
    k5 = list(combinations(range(5), 2))
    g = k5 + [(4, 10), (4, 11), (10, 11)]
    out = run(g, 4)
    assert out == {(u, v): 3 for u, v in k5}
    # the same graph at k=3 keeps everything (triangle edges have 1 >= 1)
    assert set(run(g, 3)) == {(min(u, v), max(u, v)) for u, v in g}
    # cascade case: two triangles sharing an edge, k=4 kills all
    g2 = [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4)]
    assert run(g2, 4) == {}
    assert run(g2, 4) == _ktruss_ref(g2, 4)
    # randomized referee
    import random

    rng = random.Random(7)
    pairs = {
        (rng.randrange(16), rng.randrange(16)) for _ in range(60)
    }
    pairs = [(u, v) for u, v in pairs if u != v]
    for k in (3, 4, 5):
        assert run(pairs, k) == _ktruss_ref(pairs, k)
