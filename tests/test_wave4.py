"""Referees for the round-8 wave-4 operators: link-prediction scoring
against a pure-Python Adamic-Adar/Jaccard computation on a crafted
graph, and the naive-Bayes classifier against an independent
pure-Python reimplementation of the same quantized model."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from mapreduce_sssp_spark.operators import graph_queries as G
from mapreduce_sssp_spark.operators import text_analysis as T

SF = "/root/testdata/sf0.001"


def test_link_prediction_matches_pure_python(spark, monkeypatch):
    # Crafted graph: triangle fringe + shared-neighbor pairs, node ids
    # chosen so seeds (id % 100 == 0) exist: 0, 100, 200.
    edges = [
        (0, 1), (1, 100), (0, 2), (2, 100),      # 0~100 share {1, 2}
        (100, 3), (3, 200),                      # 100~200 share {3}
        (0, 200),                                # direct edge: excluded
        (4, 5),                                  # unrelated
        (0, 100),                                # direct edge 0-100!
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    monkeypatch.setattr(G, "edges_from_lineitem", lambda _s, _f: df)
    got = {
        (r.u, r.v): r for r in G.q_link_prediction_scores(spark, "x").collect()
    }
    # pure python reference
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    seeds = [n for n in adj if n % 100 == 0]
    want = {}
    for u in seeds:
        for v in adj:
            if v == u or v in adj[u]:
                continue
            cn = adj[u] & adj[v]
            if not cn:
                continue
            aa = sum(round(1e9 / math.log(len(adj[r]))) for r in cn)
            want[(u, v)] = (
                len(cn),
                len(adj[u]),
                len(adj[v]),
                len(cn) / (len(adj[u]) + len(adj[v]) - len(cn)),
                aa,
            )
    assert set(got) == set(want)
    for k, (cn, du, dv, jac, aa) in want.items():
        r = got[k]
        assert (r.common_neighbors, r.deg_u, r.deg_v) == (cn, du, dv), k
        assert abs(r.jaccard - jac) < 1e-15
        assert r.aa_e9 == aa
    # the direct edge 0-100 must NOT appear even though they share {1,2}
    assert (0, 100) not in got and (100, 0) not in got


def _nb_reference():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    rows = con.execute(
        "SELECT doc_id, lang, list_filter(string_split_regex(trim(text),"
        " '\\s+'), x -> x <> '') FROM documents"
    ).fetchall()
    train = [(d, l, t) for d, l, t in rows if d % T.NB_EVAL_MOD != 0 and t]
    ev = [(d, l, t) for d, l, t in rows if d % T.NB_EVAL_MOD == 0 and t]
    vocab = {tok for _, _, toks in train for tok in toks}
    v = len(vocab)
    n_docs = len(train)
    cls_tokens: dict = defaultdict(Counter)
    cls_docs: Counter = Counter()
    for _, lang, toks in train:
        cls_docs[lang] += 1
        cls_tokens[lang].update(toks)
    prior = {
        c: round(math.log(cls_docs[c] / n_docs) * 1e9) for c in cls_docs
    }
    n_c = {c: sum(cnt.values()) for c, cnt in cls_tokens.items()}
    logp0 = {
        c: round(math.log(1.0 / (n_c[c] + v)) * 1e9) for c in cls_docs
    }
    confusion: Counter = Counter()
    for _, lang, toks in ev:
        tfs = Counter(toks)
        best = None
        for c in sorted(cls_docs):
            score = prior[c] + sum(tfs.values()) * logp0[c]
            for tok, tf in tfs.items():
                ctc = cls_tokens[c].get(tok)
                if ctc:
                    lp = round(math.log((ctc + 1) / (n_c[c] + v)) * 1e9)
                    score += tf * (lp - logp0[c])
            if best is None or score > best[0]:
                best = (score, c)
        confusion[(lang, best[1])] += 1
    return dict(confusion)


def test_seasonal_decompose_matches_numpy(spark):
    import numpy as np

    from mapreduce_sssp_spark.operators.event_windows import (
        q_seasonal_decompose_dow,
    )

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    rows = con.execute(
        "SELECT event_type, CAST(ts AS DATE),"
        " SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))"
        " FROM events GROUP BY 1, 2"
    ).fetchall()
    by = defaultdict(dict)
    for et, day, cents in rows:
        by[et][day] = int(cents)
    got = {
        (r.event_type, r.day): r
        for r in q_seasonal_decompose_dow(spark, SF).collect()
    }
    import datetime

    n_checked = 0
    for et, series in by.items():
        days = sorted(series)
        lo, hi = days[0], days[-1]
        grid = [
            lo + datetime.timedelta(days=i)
            for i in range((hi - lo).days + 1)
        ]
        x = np.array([series.get(d, 0) for d in grid], dtype=np.int64)
        for i in range(3, len(grid) - 3):
            d = grid[i]
            sum7 = int(x[i - 3 : i + 4].sum())
            r = got[(et, d)]
            assert r.value_cents == int(x[i])
            assert abs(r.trend - sum7 / 7.0) < 1e-9
            # decomposition identity: value == trend + seasonal + resid
            assert abs(
                r.value_cents - (r.trend + r.seasonal + r.residual)
            ) < 1e-6
            assert r.dow == d.isoweekday()
            n_checked += 1
    assert n_checked == len(got) > 0
    # seasonal means must be centered: per type, the dow-weighted sum
    # of seasonal components over the checked days is ~0 by
    # construction of the detrended mean
    for et in by:
        res = [r.residual for (t, _), r in got.items() if t == et]
        seas = [r.seasonal for (t, _), r in got.items() if t == et]
        assert abs(sum(seas) + sum(res)) / max(len(res), 1) < 1e6  # sane


def test_embedding_label_outliers_matches_numpy(spark):
    import numpy as np

    from mapreduce_sssp_spark.operators.similarity import (
        OUTLIER_TOPK,
        q_embedding_label_outliers,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    rows = con.execute(
        "SELECT vec_id, label, embedding FROM embeddings"
    ).fetchall()
    by = defaultdict(list)
    for vid, lab, emb in rows:
        vq = np.round(np.array(emb, dtype=np.float64) * 1e6).astype(
            np.int64
        )
        by[lab].append((vid, vq))
    got = defaultdict(list)
    for r in q_embedding_label_outliers(spark, SF).collect():
        got[r.label].append((r.rn, r.vec_id, r.centroid_cosine))
    assert set(got) == set(by)
    for lab, vecs in by.items():
        cent = np.sum([v for _, v in vecs], axis=0).astype(np.float64)
        scored = []
        for vid, vq in vecs:
            v = vq.astype(np.float64)
            cos = float(
                v @ cent / (np.sqrt(v @ v) * np.sqrt(cent @ cent))
            )
            scored.append((cos, vid))
        scored.sort()
        want = scored[:OUTLIER_TOPK]
        have = sorted(got[lab])
        assert len(have) == min(OUTLIER_TOPK, len(vecs))
        for (rn, vid, cos), (wcos, wvid) in zip(have, want):
            assert vid == wvid, lab
            assert abs(cos - wcos) < 1e-9


def test_churn_labels_matches_pure_python(spark):
    import datetime

    from mapreduce_sssp_spark.operators.event_windows import (
        CHURN_HORIZON_DAYS,
        q_churn_labels,
    )

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    rows = con.execute(
        "SELECT DISTINCT user_id, CAST(ts AS DATE) FROM events"
    ).fetchall()
    by = defaultdict(list)
    max_day = max(d for _, d in rows)
    for u, d in rows:
        by[u].append(d)
    want = {}
    for u, days in by.items():
        days.sort()
        for i, d in enumerate(days):
            nxt = days[i + 1] if i + 1 < len(days) else None
            gap = (nxt - d).days if nxt else None
            if nxt and gap <= CHURN_HORIZON_DAYS:
                lab = "returned"
            elif nxt:
                lab = "churned"
            elif (max_day - d).days > CHURN_HORIZON_DAYS:
                lab = "churned"
            else:
                lab = "censored"
            want[(u, d)] = (gap, lab)
    got = {
        (r.user_id, r.day): (r.days_to_return, r.label)
        for r in q_churn_labels(spark, SF).collect()
    }
    assert got == want
    labels = {lab for _, lab in want.values()}
    assert "censored" in labels, "window edge must produce censored rows"


def test_bigram_entropy_matches_numpy(spark):
    import numpy as np

    from mapreduce_sssp_spark.operators.text_analysis import (
        q_bigram_entropy_by_source,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    rows = con.execute(
        "SELECT source, list_filter(string_split_regex(trim(text),"
        " '\\s+'), x -> x <> '') FROM documents"
    ).fetchall()
    bigrams = defaultdict(Counter)
    for src, toks in rows:
        for a, b in zip(toks, toks[1:]):
            bigrams[src][(a, b)] += 1
    got = {
        r.source: r for r in q_bigram_entropy_by_source(spark, SF).collect()
    }
    assert set(got) == set(bigrams)
    for src, cnt in bigrams.items():
        n = sum(cnt.values())
        ctx = Counter()
        for (a, _), c in cnt.items():
            ctx[a] += c
        h = sum(
            c * math.log(ctx[a] / c) for (a, _), c in cnt.items()
        ) / n
        r = got[src]
        assert r.n_bigrams == n
        # e6 per-term quantization error bound
        assert abs(r.h_cond_nats - h) < len(cnt) * 1e-6 / n + 1e-9
        assert r.h_cond_nats >= 0


def test_nb_classifier_matches_pure_python(spark):
    want = _nb_reference()
    got = {
        (r.lang, r.pred_lang): r.n_docs
        for r in T.q_nb_lang_classifier(spark, SF).collect()
    }
    assert got == want
    # the classifier must beat chance: diagonal mass > uniform
    total = sum(got.values())
    diag = sum(n for (a, p), n in got.items() if a == p)
    n_classes = len({a for a, _ in got} | {p for _, p in got})
    assert diag / total > 1.0 / n_classes
