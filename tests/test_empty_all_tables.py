"""All-tables-empty contract sweep: every query that elects seeds or
reads back its own sink must yield a typed empty result on a dataset of
zero-row tables, never an undocumented driver-side crash (int(None)
seed elections, .first()[0] dim probes, schema inference over zero
part files, the Python DataSource's empty-partition-list read(None)).

The two streaming DEMO queries whose in-query asserts exist to prove a
mechanism engaged (multi-batch throttling, watermark late-drop) raise
their documented AssertionError on vacuous input — pinned as such.
"""

from __future__ import annotations

import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Queries that crashed on all-empty inputs before round 9 (TypeError /
# AttributeError / schema-inference AnalysisException classes), now
# required to return a 0-row frame.
FIXED = [
    "sssp",
    "sssp_dag",
    "sssp_paths_dag",
    "betweenness_source_dag",
    "longest_path_dag",
    "personalized_pagerank",
    "graph_diameter_estimate",
    "compat_state_lines",
    "compat_final_lines",
    "pca_power_iteration",
    "streaming_foreach_upsert",
    "streaming_parquet_sink",
    "export_training_shards",
    "sink_compaction_roundtrip",
    "sink_partitioned_roundtrip",
    "pyds_edges_roundtrip",
    "pyds_edges_writer_roundtrip",
]

# Demo queries whose in-query assert is the documented contract: on an
# empty source the demonstration is vacuous and must fail LOUDLY with
# its own message (not a raw TypeError).
GUARDED = {
    "streaming_incremental": "multi-batch",
    "streaming_late_data": "watermark demonstration is vacuous",
}


@pytest.fixture(scope="module")
def all_empty_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("allempty")
    for t in TABLES:
        spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet").limit(
            0
        ).coalesce(1).write.mode("overwrite").parquet(str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("qname", FIXED)
def test_seed_and_sink_queries_survive_all_empty(spark, all_empty_dir, qname):
    from mapreduce_sssp_spark.queries_registry import QUERIES

    assert QUERIES[qname](spark, all_empty_dir).count() == 0, qname
    spark.catalog.clearCache()


@pytest.mark.parametrize("qname", sorted(GUARDED))
def test_streaming_demo_guards_fail_loudly_on_empty(
    spark, all_empty_dir, qname
):
    from mapreduce_sssp_spark.queries_registry import QUERIES

    with pytest.raises(AssertionError, match=GUARDED[qname]):
        QUERIES[qname](spark, all_empty_dir).count()
    spark.catalog.clearCache()


@pytest.fixture(scope="module")
def one_row_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("onerow")
    for t in TABLES:
        spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet").limit(
            1
        ).coalesce(1).write.mode("overwrite").parquet(str(d / f"{t}.parquet"))
    return str(d)


def test_markov_attribution_survives_single_event(spark, one_row_dir):
    """One event -> no journey ever converts -> baseline 0: the removal
    effect is undefined (NULL), not a ZeroDivisionError (found by the
    r9 singleton sweep — the only crash among 346 queries)."""
    from mapreduce_sssp_spark.queries_registry import QUERIES

    out = QUERIES["markov_attribution"](spark, one_row_dir)
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0].removal_effect is None
    spark.catalog.clearCache()
