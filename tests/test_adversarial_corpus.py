"""Adversarial-corpus engine-vs-DuckDB sweep (r10): a crafted documents
table full of content the generated testdata never contains — unicode
spaces (U+3000), NBSP, zero-width joins, vertical tab / form feed /
CRLF, astral chars, empty and whitespace-only docs, one huge token,
exact and near duplicates — run through the riskiest documents-table
queries with BOTH engines and compared value-for-value.

The full 74-query sweep ran once offline and found four divergences
(dedup_simhash empty-doc rows; the multimodal family's byte-vs-code-
point head reads — all fixed in r10); this test keeps the ten
structurally riskiest queries pinned so the classes cannot regress.
"""

from __future__ import annotations

import duckdb
import pytest

import importlib.util
import pathlib

# The corpora are SHARED with tools/make_adversarial_sf.py (the
# full-registry sweep builder) — imported, not copied, so the pinned
# regression fixtures and the offline sweeps can never drift apart
# (r10 review finding: a hand-copied events fixture had already lost
# the duplicate-timestamp burst and the constant daily series).
_TOOL = pathlib.Path(__file__).resolve().parents[1] / "tools" / "make_adversarial_sf.py"
_spec = importlib.util.spec_from_file_location("make_adversarial_sf", _TOOL)
_mk = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mk)

QUERIES_UNDER_TEST = [
    "dedup_exact",
    "dedup_simhash",
    "simhash_hamming_pairs",
    "ngram_jaccard_pairs",
    "multimodal_features",
    "multimodal_frames",
    "multimodal_resize",
    "text_scrub",
    "text_stats",
    "lang_id",
]


@pytest.fixture(scope="module")
def adv_dir(spark, tmp_path_factory):
    df = _mk.adversarial_documents(spark)
    d = tmp_path_factory.mktemp("adv_corpus")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def _canon(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def _key(row):
    # NULLs first, then string form — rows may mix None with numbers.
    return tuple((x is None, str(x)) for x in row)


@pytest.mark.parametrize("qname", QUERIES_UNDER_TEST)
def test_engine_matches_duckdb_on_adversarial_corpus(spark, adv_dir, qname):
    from mapreduce_sssp_spark import queries_registry as qr

    sdf = qr.QUERIES[qname](spark, adv_dir)
    scols = sorted(sdf.columns)
    got = sorted(
        (tuple(_canon(r[c]) for c in scols) for r in sdf.collect()),
        key=_key,
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{adv_dir}/documents.parquet/*.parquet')"
    )
    rel = con.execute(qr.ORACLE[qname])
    dcols = [d[0] for d in rel.description]
    rows = rel.fetchall()
    assert sorted(dcols) == scols, (qname, dcols, scols)
    order = [dcols.index(c) for c in scols]
    want = sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows), key=_key
    )
    assert got == want, qname
    spark.catalog.clearCache()


EVENTS_QUERIES_UNDER_TEST = [
    "moments_value",
    "anova_oneway",
    "t_test_welch",
    "cross_correlation_lag",
    "markov_stationary",
    "gini_value",
    "max_drawdown",
    "ewma_value",
]


@pytest.fixture(scope="module")
def adv_ev_dir(spark, tmp_path_factory):
    df = _mk.adversarial_events(spark)
    d = tmp_path_factory.mktemp("adv_events")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("qname", EVENTS_QUERIES_UNDER_TEST)
def test_engine_matches_duckdb_on_adversarial_events(spark, adv_ev_dir, qname):
    from mapreduce_sssp_spark import queries_registry as qr

    sdf = qr.QUERIES[qname](spark, adv_ev_dir)
    scols = sorted(sdf.columns)
    got = sorted(
        (tuple(_canon(r[c]) for c in scols) for r in sdf.collect()),
        key=_key,
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{adv_ev_dir}/events.parquet/*.parquet')"
    )
    rel = con.execute(qr.ORACLE[qname])
    dcols = [d[0] for d in rel.description]
    rows = rel.fetchall()
    assert sorted(dcols) == scols, (qname, dcols, scols)
    order = [dcols.index(c) for c in scols]
    want = sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows), key=_key
    )
    assert got == want, qname
    spark.catalog.clearCache()


# --- r11 campaign: embeddings / orders ---------------------------------------
# The r11 sweep over crafted embeddings (zero vector, float32 denormals,
# 1e19-magnitude components, exact dup / negated / scaled copies) and
# crafted orders (half-cent prices, duplicate keys, negative credits)
# found 21 failures: 19 crashes (zero-norm cosine 0/0 under ANSI; e6
# quantization carriers overflowing int64 at |x|*1e6; the inferred
# size(transform(...))>0 scan predicate evaluating the quantize cast on
# rows the vec_domain rail had already rejected) and 2 value
# divergences (DuckDB's double->DECIMAL cast rounding the shortest
# decimal repr on half-cent prices; a value-envelope check on a
# rank-guaranteed sketch).  The riskiest queries stay pinned here.

EMB_QUERIES_UNDER_TEST = [
    "similarity_topk",
    "embedding_neardup",
    "label_centroid_similarity",
    "embedding_label_outliers",
    "rank_fusion_rrf",
    "embedding_quantize",
    "roc_auc_features",
    "pr_auc_features",
]


@pytest.fixture(scope="module")
def adv_emb_dir(spark, tmp_path_factory):
    df = _mk.adversarial_embeddings(spark)
    d = tmp_path_factory.mktemp("adv_embeddings")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(d / "embeddings.parquet")
    )
    return str(d)


@pytest.mark.parametrize("qname", EMB_QUERIES_UNDER_TEST)
def test_engine_matches_duckdb_on_adversarial_embeddings(
    spark, adv_emb_dir, qname
):
    from mapreduce_sssp_spark import queries_registry as qr

    sdf = qr.QUERIES[qname](spark, adv_emb_dir)
    scols = sorted(sdf.columns)
    got = sorted(
        (tuple(_canon(r[c]) for c in scols) for r in sdf.collect()),
        key=_key,
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{adv_emb_dir}/embeddings.parquet/*.parquet')"
    )
    rel = con.execute(qr.ORACLE[qname])
    dcols = [d[0] for d in rel.description]
    rows = rel.fetchall()
    assert sorted(dcols) == scols, (qname, dcols, scols)
    order = [dcols.index(c) for c in scols]
    want = sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows), key=_key
    )
    assert got == want, qname
    spark.catalog.clearCache()


def test_vec_domain_excludes_exactly_the_crafted_outliers(spark):
    """The rail's semantics pinned value-for-value: of the crafted
    vectors, exactly the zero vector and the -0.0 vector (norm 0) and
    the 1e19 vector (|x| > 1e6) are excluded; denormals, negations,
    duplicates and one-hots stay in."""
    from mapreduce_sssp_spark.operators.similarity import vec_domain

    df = _mk.adversarial_embeddings(spark).filter("vec_id >= 1000000")
    kept = {r.vec_id for r in vec_domain(df).select("vec_id").collect()}
    all_ids = {r.vec_id for r in df.select("vec_id").collect()}
    excluded = all_ids - kept
    # vec_id layout (see adversarial_embeddings): 1000000 zero vector,
    # 1000007 the 1e19 vector, 1000009 the -0.0 vector, 1000012 the
    # NULL embedding (wave 3; exists() over NULL is NULL -> dropped).
    assert excluded == {1000000, 1000007, 1000009, 1000012}


def test_cents_rounding_matches_duckdb_on_half_cent_boundaries():
    """The cogroup cents device (Decimal(v*100) ROUND_HALF_UP) agrees
    with DuckDB round(v*100) on the exact boundary values that diverged
    under CAST(.. AS DECIMAL(18,2)) — probed r11: DuckDB's decimal cast
    rounds the SHORTEST repr (100.005 -> 100.01) while the binary value
    is below the half (100.00499...)."""
    from decimal import ROUND_HALF_UP, Decimal

    con = duckdb.connect()
    for v in (100.005, 0.005, 1234.565, -500.255, 0.015, 2.675, 8.835):
        duck = con.execute(
            f"SELECT CAST(round(CAST({v!r} AS DOUBLE) * 100) AS BIGINT)"
        ).fetchone()[0]
        eng = int(
            Decimal(float(v) * 100.0).quantize(
                Decimal(1), rounding=ROUND_HALF_UP
            )
        )
        assert eng == duck, (v, eng, duck)


# --- r11 wave 2: part / customer / supplier ----------------------------------
# Crafted part (unicode names, duplicate keys, duplicate names, negative
# and half-cent prices), customer (dup keys, orphan nations, unseen
# segment) and supplier (dup key, tied balances) found 3 more classes:
# sqrt(negative retail price) — Spark NaN vs DuckDB raise; the
# levenshtein chars-vs-bytes split on unicode names (now an ENFORCED
# ASCII match domain, both engines); and a canonical-name fan-out when
# duplicate part keys collide two names onto one MIN(p_partkey) id.

PART_QUERIES_UNDER_TEST = [
    "fuzzy_match_parts",
    "entity_clusters",
    "scalar_string_math",
]


@pytest.fixture(scope="module")
def adv_part_dir(spark, tmp_path_factory):
    df = _mk.adversarial_part(spark)
    d = tmp_path_factory.mktemp("adv_part")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "part.parquet"))
    return str(d)


@pytest.mark.parametrize("qname", PART_QUERIES_UNDER_TEST)
def test_engine_matches_duckdb_on_adversarial_parts(
    spark, adv_part_dir, qname
):
    from mapreduce_sssp_spark import queries_registry as qr

    sdf = qr.QUERIES[qname](spark, adv_part_dir)
    scols = sorted(sdf.columns)
    got = sorted(
        (tuple(_canon(r[c]) for c in scols) for r in sdf.collect()),
        key=_key,
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW part AS SELECT * FROM "
        f"read_parquet('{adv_part_dir}/part.parquet/*.parquet')"
    )
    rel = con.execute(qr.ORACLE[qname])
    dcols = [d[0] for d in rel.description]
    rows = rel.fetchall()
    assert sorted(dcols) == scols, (qname, dcols, scols)
    order = [dcols.index(c) for c in scols]
    want = sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows), key=_key
    )
    assert got == want, qname
    spark.catalog.clearCache()


# --- r11 wave 4: orders / lineitem NULL cells --------------------------------

ORDERS_QUERIES_UNDER_TEST = [
    "window_lag",
    "window_ntile",
    "window_moving",
    "agg_delta_maintenance",
    "distribution_drift",
    "skyline_orders",
    "regression_trend",
]


@pytest.fixture(scope="module")
def adv_orders_dir(spark, tmp_path_factory):
    df = _mk.adversarial_orders(spark)
    d = tmp_path_factory.mktemp("adv_orders")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "orders.parquet"))
    return str(d)


@pytest.mark.parametrize("qname", ORDERS_QUERIES_UNDER_TEST)
def test_engine_matches_duckdb_on_adversarial_orders(
    spark, adv_orders_dir, qname
):
    from mapreduce_sssp_spark import queries_registry as qr

    sdf = qr.QUERIES[qname](spark, adv_orders_dir)
    scols = sorted(sdf.columns)
    got = sorted(
        (tuple(_canon(r[c]) for c in scols) for r in sdf.collect()),
        key=_key,
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{adv_orders_dir}/orders.parquet/*.parquet')"
    )
    rel = con.execute(qr.ORACLE[qname])
    dcols = [d[0] for d in rel.description]
    rows = rel.fetchall()
    assert sorted(dcols) == scols, (qname, dcols, scols)
    order = [dcols.index(c) for c in scols]
    want = sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows), key=_key
    )
    assert got == want, qname
    spark.catalog.clearCache()


def test_b1_edge_contract_drops_null_weights(spark):
    """The B1 edge contract (io.sources.edges_from_lineitem): a NULL
    l_quantity is a malformed edge and never reaches the graph family —
    unguarded, concat_ws silently emitted a bare `dst` token in the
    dst:weight adjacency grammar (r11 wave-4 finding)."""
    import pathlib
    import tempfile

    from mapreduce_sssp_spark.graph.reverse import adjacency_list
    from mapreduce_sssp_spark.io.sources import edges_from_lineitem

    li = spark.createDataFrame(
        [
            (1, 10, 1, 1, 5.0, 1.0, 0.0, 0.0, "N", "O", None),
            (1, 11, 2, 2, None, 1.0, 0.0, 0.0, "N", "O", None),
            (2, 12, 1, 1, 7.0, 1.0, 0.0, 0.0, "N", "O", None),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    with tempfile.TemporaryDirectory() as d:
        li.write.mode("overwrite").parquet(str(pathlib.Path(d) / "lineitem.parquet"))
        edges = edges_from_lineitem(spark, d)
        rows = edges.collect()
        assert len(rows) == 2  # the NULL-weight edge is dropped
        assert all(r.weight is not None for r in rows)
        adj = {r.node: r.adj for r in adjacency_list(edges).collect()}
        # no bare-dst token can exist: every entry carries a weight
        assert all(
            e.weight is not None for entries in adj.values() for e in entries
        )


def test_b1_edge_contract_drops_null_endpoints(spark):
    """r12 extension of the B1 contract: a NULL src or dst is a
    malformed edge endpoint (the engine analogue of the reference's
    Character.isDigit line guard) and never reaches the graph family —
    unguarded, NULL endpoints corrupted adjacency/compat grammar lines,
    shifted pagerank's node count N, and crashed the TSV roundtrip
    read-back (r12 NULL-node-id sweep)."""
    import pathlib
    import tempfile

    from mapreduce_sssp_spark.io.sources import edges_from_lineitem

    li = spark.createDataFrame(
        [
            (1, 10, 1, 1, 5.0, 1.0, 0.0, 0.0, "N", "O", None),
            (1, None, 2, 2, 3.0, 1.0, 0.0, 0.0, "N", "O", None),
            (2, 12, None, 1, 7.0, 1.0, 0.0, 0.0, "N", "O", None),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    with tempfile.TemporaryDirectory() as d:
        li.write.mode("overwrite").parquet(
            str(pathlib.Path(d) / "lineitem.parquet")
        )
        rows = edges_from_lineitem(spark, d).collect()
        assert len(rows) == 1  # both NULL-endpoint edges are dropped
        assert rows[0].src == 1 and rows[0].dst == 10


def test_cooccurrence_contract_drops_null_orderkey_basket(spark):
    """r12 NULL-node-id sweep: Spark's groupBy KEEPS a NULL order-key
    group, lumping every orphan part into one pseudo-basket that mints
    spurious co-occurrence pairs — while the DuckDB twins' a.o = b.o
    equi-join drops NULL keys. The incidence contract (o and p
    non-null) must make the engine drop them too."""
    import pathlib
    import tempfile

    from mapreduce_sssp_spark.operators import graph_queries as G

    li = spark.createDataFrame(
        [
            (1, 10, 1, 1, 5.0, 1.0, 0.0, 0.0, "N", "O", None),
            (1, 11, 1, 2, 5.0, 1.0, 0.0, 0.0, "N", "O", None),
            # two NULL-orderkey rows with distinct parts: an unguarded
            # groupBy would emit the spurious pair (20, 21)
            (None, 20, 1, 1, 5.0, 1.0, 0.0, 0.0, "N", "O", None),
            (None, 21, 1, 1, 5.0, 1.0, 0.0, 0.0, "N", "O", None),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    with tempfile.TemporaryDirectory() as d:
        li.write.mode("overwrite").parquet(
            str(pathlib.Path(d) / "lineitem.parquet")
        )
        edges = {
            (r.u, r.v)
            for r in G._part_cooccurrence_edges_plan(spark, d).collect()
        }
        assert edges == {(10, 11)}  # no (20, 21) pseudo-basket pair
