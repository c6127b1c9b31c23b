"""Deterministic sampling / split / packing operators (operators/sampling.py).

The oracle gate proves cross-engine equality; these tests pin the
*semantic* properties that make the operators useful: exact-function
determinism, partition (every doc in exactly one split), fraction
accuracy, stratification rates, and the packing invariants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_sssp_spark.operators import sampling

SF = "/root/testdata/sf0.01"


def test_md5_bucket_matches_duckdb(spark):
    # The whole module rests on Spark md5 == DuckDB md5 (lowercase hex).
    import duckdb

    got = (
        spark.range(1)
        .select(F.md5(F.lit("split:42")).alias("h"))
        .collect()[0]["h"]
    )
    want = duckdb.connect().execute("SELECT md5('split:42')").fetchone()[0]
    assert got == want


def test_split_partition_and_fractions(spark):
    df = sampling.q_split_train_test(spark, SF).cache()
    n = df.count()
    counts = {r["split"]: r["cnt"] for r in df.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == n  # exactly one split per doc
    # 500 docs, 80/10/10: binomial 3-sigma ≈ ±27 on train, ±20 on val/test
    assert abs(counts["train"] - 0.8 * n) < 30 * 2
    assert abs(counts.get("val", 0) - 0.1 * n) < 25 * 2
    assert abs(counts.get("test", 0) - 0.1 * n) < 25 * 2


def test_split_is_deterministic(spark):
    a = sorted(map(tuple, sampling.q_split_train_test(spark, SF).collect()))
    b = sorted(map(tuple, sampling.q_split_train_test(spark, SF).collect()))
    assert a == b


def test_sample_rate_and_independence(spark):
    docs_n = spark.read.parquet(f"{SF}/documents.parquet").count()
    sample = sampling.q_sample_hash(spark, SF).cache()
    k = sample.count()
    # 10% of 500, 3-sigma ≈ ±20
    assert abs(k - 0.1 * docs_n) < 25 * 2
    # Different salt ⇒ the sample is NOT just the test split: correlation
    # between (in sample) and (split == test) should look independent.
    split = sampling.q_split_train_test(spark, SF)
    joint = (
        sample.join(split, "doc_id")
        .filter(F.col("split") == "test")
        .count()
    )
    # Independent draws: E[joint] = n * 0.1 * 0.1 = 5, allow wide slack
    assert joint < 0.1 * docs_n  # far below "sample == test split"


def test_stratified_rates(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    base = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    samp = sampling.q_stratified_sample(spark, SF)
    got = {r["lang"]: r["n"] for r in samp.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # en kept at ~20%, es ~50%, everything else exactly 100%
    for lang, n in base.items():
        if lang == "en":
            assert got.get(lang, 0) < 0.45 * n
        elif lang == "es":
            assert 0.2 * n < got.get(lang, 0) <= max(1, 0.8 * n)
        else:
            assert got.get(lang, 0) == n


def test_pack_sequences_invariants(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    max_doc = docs.agg(F.max("n_chars")).collect()[0][0]
    packs = sampling.q_pack_sequences(spark, SF).cache()
    rows = packs.collect()
    # Every document is in exactly one pack.
    assert sum(r["n_docs"] for r in rows) == n_docs
    # Straddle rule: a pack can exceed capacity only by the straddling
    # document, i.e. total < capacity + max single-doc cost; and any pack
    # except a shard's last must have reached capacity with its straddler.
    for r in rows:
        assert r["total_chars"] < sampling.PACK_CAPACITY + max_doc
    # pack_ids are dense-ish per shard: min is 0 and count ≤ max+1.
    per_shard = {}
    for r in rows:
        per_shard.setdefault(r["shard"], []).append(r["pack_id"])
    for shard, ids in per_shard.items():
        assert min(ids) == 0
        assert len(ids) == len(set(ids))


def test_pack_sequences_plan_has_no_global_sort(spark):
    # The window partitions by shard — the physical plan must sort within
    # partitions (local per-shard runs), never range-exchange globally.
    plan = (
        sampling.q_pack_sequences(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" not in plan.lower()


def test_chunk_documents_window_grid(spark, tmp_path):
    """Window-count formula edge cases: n <= W -> one tail-truncated
    chunk; n = W + 1 -> two chunks with the second holding the
    (n - stride) tail; empty text -> no chunks."""
    import pyspark.sql.functions as F
    from mapreduce_sssp_spark.operators.sampling import (
        CHUNK_STRIDE,
        CHUNK_W,
        q_chunk_documents,
    )

    words = lambda n: " ".join(f"t{i}" for i in range(n))
    docs = spark.createDataFrame(
        [
            (1, words(CHUNK_W)),       # exactly one full window
            (2, words(CHUNK_W + 1)),   # spills into a second window
            (3, words(10)),            # short doc -> one short chunk
            (4, ""),                   # empty -> no chunks
        ],
        "doc_id long, text string",
    )
    sf = str(tmp_path / "sf")
    import os
    os.makedirs(sf, exist_ok=True)
    docs.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = {
        (r.doc_id, r.chunk_idx): r.n_chunk_tokens
        for r in q_chunk_documents(spark, sf).collect()
    }
    assert out == {
        (1, 0): CHUNK_W,
        (2, 0): CHUNK_W,
        (2, 1): CHUNK_W + 1 - CHUNK_STRIDE,
        (3, 0): 10,
    }


def test_domain_mix_rates_follow_targets(spark, sf_dir):
    """Listed sources get boosted keep-rates (kept whole when their
    target share exceeds their natural share); unlisted sources are
    downsampled toward the remainder share; the whole draw is
    deterministic."""
    from mapreduce_sssp_spark.operators.sampling import (
        _MIX_TARGETS,
        q_domain_mix_sample,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_by_src = {r.source: r.n for r in docs.groupBy("source").count()
                .withColumnRenamed("count", "n").collect()}
    out = q_domain_mix_sample(spark, sf_dir).collect()
    kept = {}
    for r in out:
        kept[r.source] = kept.get(r.source, 0) + 1
    # Sources uniform in the testdata: a 20% target on a ~5% natural
    # share means rate >= 1 -> listed sources keep every doc.
    for s in _MIX_TARGETS:
        assert kept.get(s) == n_by_src[s], (s, kept.get(s), n_by_src[s])
    # Unlisted sources must shed mass in aggregate to fund the boost.
    unlisted_total = sum(n for s, n in n_by_src.items() if s not in _MIX_TARGETS)
    unlisted_kept = sum(n for s, n in kept.items() if s not in _MIX_TARGETS)
    assert unlisted_kept < unlisted_total
    # Determinism: a second run selects the identical doc set.
    again = {r.doc_id for r in q_domain_mix_sample(spark, sf_dir).collect()}
    assert again == {r.doc_id for r in out}


def test_weighted_sample_is_deterministic_and_weight_biased(spark, sf_dir):
    from pyspark.sql import functions as F

    from mapreduce_sssp_spark.operators.sampling import q_weighted_sample

    got = q_weighted_sample(spark, sf_dir)
    a = {r.o_orderkey for r in got.collect()}
    b = {r.o_orderkey for r in q_weighted_sample(spark, sf_dir).collect()}
    assert a == b and 0 < len(a)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.count()
    assert len(a) < n
    # Expected keep rate = mean(price)/max(price); binomial tolerance.
    stats = orders.agg(
        F.avg("o_totalprice").alias("m"), F.max("o_totalprice").alias("mx")
    ).collect()[0]
    expect = stats.m / stats.mx
    assert abs(len(a) / n - expect) < 0.05
    # Kept rows skew expensive: mean kept price > corpus mean.
    kept_mean = (
        orders.filter(F.col("o_orderkey").isin(list(a)[:5000]))
        .agg(F.avg("o_totalprice"))
        .collect()[0][0]
    )
    assert kept_mean > stats.m


def test_priority_sample_topk_python_replay(spark):
    """The k selected orders must equal a pure-Python replay of the
    priority formula (md5 uniform, cents/u, top-k with id tiebreak)."""
    import hashlib
    from decimal import Decimal

    from mapreduce_sssp_spark.operators.sampling import (
        PSAMPLE_K,
        _PSAMPLE_DENOM,
        _PSAMPLE_KEY,
        q_priority_sample_topk,
    )

    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    ).collect()
    scored = []
    for r in orders:
        cents = int(
            Decimal(str(r.o_totalprice)).quantize(Decimal("0.01")) * 100
        )
        h = int(
            hashlib.md5(
                f"{_PSAMPLE_KEY}{r.o_orderkey}".encode()
            ).hexdigest()[:15],
            16,
        )
        u = float(h + 1) / _PSAMPLE_DENOM
        scored.append((float(cents) / u, r.o_orderkey))
    want = sorted(scored, key=lambda t: (-t[0], t[1]))[:PSAMPLE_K]
    got = q_priority_sample_topk(spark, sf).collect()
    assert len(got) == min(PSAMPLE_K, len(orders))
    assert [(r.priority, r.o_orderkey) for r in got] == want


def test_bootstrap_ci_covers_true_mean(spark):
    """The 32 Poisson-replicate means must straddle the exact corpus
    mean (an estimator whose bootstrap interval misses its own point
    estimate is broken), the weights must behave like Poisson(1)
    (sum_w within 4 sigma of n), and the run must be deterministic."""
    import duckdb

    rows = sampling.q_bootstrap_ci_mean(spark, SF).collect()
    assert len(rows) == sampling.BOOTSTRAP_B
    means = sorted(r.mean_cents for r in rows)
    true_mean = (
        duckdb.connect()
        .execute(
            "SELECT AVG(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
            f" AS BIGINT)) FROM '{SF}/orders.parquet'"
        )
        .fetchone()[0]
    )
    n = (
        duckdb.connect()
        .execute(f"SELECT COUNT(*) FROM '{SF}/orders.parquet'")
        .fetchone()[0]
    )
    assert means[0] < true_mean < means[-1]
    # Poisson(1) sum over n rows: mean n, sd sqrt(n).
    for r in rows:
        assert abs(r.sum_w - n) < 4 * n**0.5, (r.b, r.sum_w, n)
    again = {r.b: r.mean_cents for r in sampling.q_bootstrap_ci_mean(spark, SF).collect()}
    assert {r.b: r.mean_cents for r in rows} == again
