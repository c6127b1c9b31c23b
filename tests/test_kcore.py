"""k-core peeling: hand graphs with known cores plus randomized
cross-checks against a pure-Python peel (the trusted reference)."""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreduce_sssp_spark.graph.kcore import kcore
from mapreduce_sssp_spark.graph.triangles import canonical_edges


def _run(spark, pairs, k):
    df = spark.createDataFrame(pairs, "u long, v long")
    return {r.node: r.core_deg for r in kcore(canonical_edges(df), k).collect()}


def _brute(pairs, k):
    adj: dict[int, set[int]] = {}
    for u, v in pairs:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
                changed = True
    return {n: len(nbrs) for n, nbrs in adj.items()}


def test_k4_is_its_own_3core(spark):
    k4 = list(combinations(range(4), 2))
    assert _run(spark, k4, 3) == {i: 3 for i in range(4)}


def test_pendant_chain_peels_away_entirely(spark):
    chain = [(i, i + 1) for i in range(6)]
    assert _run(spark, chain, 2) == {}


def test_core_with_cascading_peel(spark):
    # Triangle core 0-1-2 plus a tail 2-3-4: peeling at k=2 removes 4,
    # then 3 (cascade), leaving the triangle.
    g = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]
    assert _run(spark, g, 2) == {0: 2, 1: 2, 2: 2}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=30
    ),
    k=st.integers(2, 4),
)
def test_random_graphs_match_brute_force(spark, pairs, k):
    assert _run(spark, pairs, k) == _brute(pairs, k)


def test_sf001_synchronous_peel_inside_oracle_bound():
    """The kcore DuckDB oracle runs EXACTLY 16 synchronous peel levels;
    pin that the real sf0.01 co-occurrence graph at k=80 converges well
    inside that (currently 5 rounds — a testdata refresh that cascades
    deeper would silently break the oracle without this)."""
    import duckdb

    con = duckdb.connect()
    pairs = con.execute(
        """
        WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                    FROM read_parquet('/root/testdata/sf0.01/lineitem.parquet'))
        SELECT DISTINCT a.p, b.p FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        """
    ).fetchall()
    adj: dict[int, set[int]] = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    rounds = 0
    while True:
        doomed = [n for n, nbrs in adj.items() if len(nbrs) < 80]
        if not doomed:
            break
        rounds += 1
        for n in doomed:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
        assert rounds < 16, "peel needs >= 16 rounds; raise the oracle bound"
    assert rounds <= 8, f"converged in {rounds} rounds, margin shrinking"
    assert len(adj) > 0  # the sf0.01 80-core is non-trivial
