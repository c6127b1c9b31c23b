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
