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
