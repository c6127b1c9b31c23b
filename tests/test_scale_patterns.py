"""Scale-pattern operators: salted agg equivalence, approx-distinct
error bound, bucketed co-located join (no exchange in the join plan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_sssp_spark.operators.scale_patterns import salted_agg


def test_salted_agg_equals_plain_agg(spark):
    df = spark.range(0, 10_000).select(
        (F.col("id") % 3).alias("k"), (F.col("id") % 7).cast("double").alias("v")
    )
    plain = {
        (r.k): (r.n, r.s)
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        (r.k): (r.n, r.s)
        for r in salted_agg(
            df,
            "k",
            measures_partial=[F.count("*").alias("pn"), F.sum("v").alias("ps")],
            measures_final=[F.sum("pn").alias("n"), F.sum("ps").alias("s")],
        ).collect()
    }
    assert plain == salted


def test_approx_distinct_error_bound(spark, sf_dir):
    from mapreduce_sssp_spark.operators.scale_patterns import (
        q_approx_distinct_verified,
    )

    rows = q_approx_distinct_verified(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.est_in_envelope, dict(r.asDict())


def test_approx_quantiles_error_bound(spark, sf_dir):
    """GK sketch quartiles must land within rank-error of the exact
    quantiles (accuracy=10000 -> 1/10000 rank error; allow a loose
    margin via exact rank windows)."""
    from mapreduce_sssp_spark.operators.scale_patterns import q_approx_quantiles

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = {
        r.l_returnflag: r.q
        for r in li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").alias("q"))
        .collect()
    }
    for r in q_approx_quantiles(spark, sf_dir).collect():
        quartiles = (r.approx_q1, r.approx_median, r.approx_q3)
        assert r.min_price <= quartiles[0] <= quartiles[1]
        assert quartiles[1] <= quartiles[2] <= r.max_price
        for got, want in zip(quartiles, exact[r.l_returnflag]):
            assert got == pytest.approx(want, rel=0.01), r.l_returnflag


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """bucketBy + saveAsTable co-locates both join sides: the sort-merge
    join plan must contain NO Exchange (the 100 TB co-located join)."""
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    for name in ("bt_a", "bt_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
        (
            df.write.bucketBy(8, "k")
            .sortBy("k")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(name)
        )
    # Disable broadcast so the planner must pick the bucketed sort-merge
    # path (at real scale both sides are too big to broadcast anyway).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bt_a").join(spark.table("bt_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for name in ("bt_a", "bt_b"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_sketch_merge_union_equals_direct_and_bounds_error(spark, sf_dir):
    """HLL union of per-linestatus sketches must track the direct
    sketch over the same rows (exactly equal in sparse mode; within
    combined rsd once dense — 1991 vs 1999 on 2000 distinct at sf0.01),
    and the estimate must sit within 5% of the exact count."""
    from mapreduce_sssp_spark.operators.scale_patterns import (
        _sketch_merge_frame,
        q_sketch_merge_verified,
    )

    rows = _sketch_merge_frame(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert abs(r["merged"] - r["direct"]) <= 0.04 * r["direct"] + 5, (
            r["merged"], r["direct"],
        )
        assert abs(r["merged"] - r["exact"]) / r["exact"] < 0.05, dict(r.asDict())
    # The verified sibling's invariant booleans must all come out TRUE —
    # the exact expected values its DuckDB oracle asserts. Checked at
    # BOTH test SFs so the sparse- and dense-mode regimes are covered.
    for d in (sf_dir, "/root/testdata/sf0.01"):
        for r in q_sketch_merge_verified(spark, d).collect():
            assert r.union_tracks_direct and r.merged_in_envelope, (
                d, dict(r.asDict()),
            )


def test_heavy_hitters_cut_and_cumulative(spark, sf_dir):
    from mapreduce_sssp_spark.operators.scale_patterns import q_heavy_hitters

    rows = q_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == 20
    rows = sorted(rows, key=lambda r: (-r.n, r.l_partkey))
    cum = 0
    for r in rows:
        cum += r.n
        assert r.cum_n == cum
        assert abs(r.share - r.n / r.n_total) < 1e-15
        assert abs(r.cum_share - cum / r.n_total) < 1e-15
    # descending count order with key tie-break
    assert all(
        rows[i].n >= rows[i + 1].n for i in range(len(rows) - 1)
    )


def test_interval_self_join_banded_matches_naive(spark, sf_dir):
    """The band decomposition must produce the EXACT naive theta-join
    pair set (every qualifying pair found exactly once, no band-edge
    duplicates or misses)."""
    import itertools
    from collections import defaultdict

    from mapreduce_sssp_spark.operators.scale_patterns import (
        BAND_DAYS,
        q_interval_self_join_banded,
    )

    got = {
        r.cust: (r.n_pairs, r.max_gap_days, r.min_gap_days)
        for r in q_interval_self_join_banded(spark, sf_dir).collect()
    }
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    by_cust = defaultdict(list)
    epoch = None
    for o in orders:
        by_cust[o.o_custkey].append((o.o_orderkey, o.o_orderdate.toordinal()))
    want = {}
    for cust, rows in by_cust.items():
        gaps = [
            abs(da - db)
            for (ka, da), (kb, db) in itertools.combinations(rows, 2)
            if abs(da - db) <= BAND_DAYS
        ]
        if gaps:
            want[cust] = (len(gaps), max(gaps), min(gaps))
    assert got == want


def test_levenshtein_ascii_parity_and_unicode_divergence(spark):
    """Pin the levenshtein contract (probed r10): Spark counts CHARS,
    DuckDB counts BYTES. They agree on ASCII — which is why the
    fuzzy_match_parts / entity_clusters oracles hold on TPC-H names —
    and DIVERGE on multibyte text. If either engine changes semantics,
    this test flags the contract note in fuzzy_nearest's docstring."""
    import duckdb

    from pyspark.sql import functions as F

    cases = [
        ("kitten", "sitting"),
        ("", "abc"),
        ("ab", "ba"),
        ("MFGR#12", "MFGR#21"),
    ]
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(cases)],
        "i long, a string, b string",
    )
    got = {
        r.i: r.d
        for r in df.select("i", F.levenshtein("a", "b").alias("d")).collect()
    }
    con = duckdb.connect()
    for i, (a, b) in enumerate(cases):
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert got[i] == want, (a, b, got[i], want)
    # The documented divergence: chars vs bytes on multibyte input.
    spark_d = (
        df.sparkSession.createDataFrame([("naïve", "naive")], "a string, b string")
        .select(F.levenshtein("a", "b").alias("d"))
        .collect()[0]
        .d
    )
    duck_d = con.execute("SELECT levenshtein('naïve', 'naive')").fetchone()[0]
    assert spark_d == 1 and duck_d == 2
