"""Label propagation vs a pure-Python reference (same semantics: fixed
synchronous rounds, neighbor-majority vote, ties to smallest label)."""

import random
from collections import Counter, defaultdict

from mapreduce_sssp_spark.graph.lpa import label_propagation


def ref_lpa(pairs, rounds):
    adj = defaultdict(set)
    for u, v in pairs:
        adj[u].add(v)
        adj[v].add(u)
    lab = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n in adj:
            cnt = Counter(lab[m] for m in adj[n])
            new[n] = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        lab = new
    return lab


def run(spark, pairs, rounds):
    df = spark.createDataFrame(pairs, "u long, v long")
    return {
        r.node: r.community
        for r in label_propagation(df, rounds=rounds).collect()
    }


def test_triangle_converges_to_min_label(spark):
    pairs = [(1, 2), (1, 3), (2, 3)]
    assert run(spark, pairs, 4) == {1: 1, 2: 1, 3: 1}


def test_two_cliques_with_bridge(spark):
    clique = lambda ns: [(a, b) for a in ns for b in ns if a < b]  # noqa: E731
    pairs = clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(4, 10)]
    got = run(spark, pairs, 4)
    assert got == ref_lpa(pairs, 4)
    # Both cliques settle on their own min label.
    assert {got[n] for n in (1, 2, 3)} == {1}
    assert {got[n] for n in (11, 12, 13)} == {10}


def test_random_graph_matches_reference(spark):
    rng = random.Random(7)
    nodes = list(range(60))
    pairs = sorted(
        {
            (min(a, b), max(a, b))
            for _ in range(150)
            for a, b in [(rng.choice(nodes), rng.choice(nodes))]
            if a != b
        }
    )
    for rounds in (1, 3):
        assert run(spark, pairs, rounds) == ref_lpa(pairs, rounds)


def test_duplicate_edges_collapse(spark):
    # Parallel edges must not double a neighbor's vote.
    pairs = [(1, 2), (1, 2), (2, 3), (1, 3), (3, 4)]
    assert run(spark, pairs, 2) == ref_lpa({(1, 2), (2, 3), (1, 3), (3, 4)}, 2)
