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
    texts = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and more"),
        (3, ""),
        (4, "   "),
        (5, "one"),
        (6, "　unicode　spaced　tokens　here　now"),
        (7, "nbsp\xa0joined\xa0words stay one token mostly here"),
        (8, "zero​width​joined tokens appear here today ok"),
        (9, "tab\tand\x0bvertical\fand\r\ncrlf separated words here"),
        (10, "astral 𝄞 clef and emoji 🎼 mixed with ascii words"),
        (11, "digits 123 and 456 mixed 789 into text 012"),
        (12, "ALL CAPS TEXT WITH Mixed Case Words Here Today"),
        (13, "repeat repeat repeat repeat repeat repeat repeat repeat"),
        (14, "x" * 5000),
        (15, ("word " * 1000).strip()),
        (16, "punctuation, heavy; text: with. many! marks? everywhere..."),
        (17, "é accented ü tokens ñ with ç diacritics everywhere ok"),
        (18, "　　　"),
        (19, "trailing spaces here   "),
        (20, "a b c d e f g h i j k l m n o p q r s t"),
        (21, "the the the and and and of of of to to to"),
    ]
    rows = [
        (i, t, "en" if i % 3 else "de", f"src{i % 4}", len(t))
        for i, t in texts
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
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
    """Adversarial events: duplicate timestamps, single-event users and
    types, zero/negative/cancelling values, zero-variance groups,
    constant daily series, and large-but-legal magnitudes ($10M) — the
    structures that surfaced the r10 crash/divergence classes
    (int64/quantization overflow, n(n-1)=0 variance, zero-variance
    Pearson, the recursive twin dropping zero-mass states)."""
    import datetime as dt

    T0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def add(t, user, typ, val, props='{"k": 1}'):
        nonlocal eid
        rows.append((eid, t, user, typ, val, props))
        eid += 1

    for _ in range(6):
        add(T0 + dt.timedelta(minutes=10), 1, "view", 5.0)
    add(T0 + dt.timedelta(minutes=100), 2, "purchase", 0.0)
    add(T0 + dt.timedelta(minutes=200), 3, "view", 0.0)
    add(T0 + dt.timedelta(minutes=201), 3, "view", -5.0)
    add(T0 + dt.timedelta(minutes=202), 3, "purchase", 5.0)
    add(T0 + dt.timedelta(minutes=203), 3, "refund", -10.0)
    for i in range(10):
        add(T0 + dt.timedelta(minutes=400 + i), 6, "purchase", float(i))
    for i in range(10):
        add(T0 + dt.timedelta(minutes=500 + i), 7, "purchase", float(10 - i))
    for i in range(8):
        add(T0 + dt.timedelta(minutes=600 + 10 * i), 8, "error", 7.77)
    add(T0 + dt.timedelta(minutes=700), 9, "rare_type", 3.14)
    add(T0 + dt.timedelta(minutes=710), 9, "view", 1.0, None)
    add(T0 + dt.timedelta(minutes=720), 10, "purchase", 9_999_999.99)
    add(T0 + dt.timedelta(minutes=721), 10, "refund", -9_999_999.99)
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string",
    )
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
