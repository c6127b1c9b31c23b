"""Build an adversarial sf directory for full-registry divergence sweeps.

Creates a complete table set under the target dir: crafted `documents`
(unicode whitespace, NBSP/ZWSP, vertical tab, CRLF, astral chars,
empty/whitespace-only docs, huge tokens, planted near/exact dups),
crafted `events` (duplicate timestamps, single-event users/types,
zero/negative/cancelling values, zero-variance groups, constant series,
$10M magnitudes), a degenerate-structure `lineitem` slice (single-line
orders, childless orders, duplicate (orderkey, linenumber) rows,
boundary discounts/quantities), and sf0.001 copies of everything else.

Usage:
    python tools/make_adversarial_sf.py [/tmp/sf_adversarial]
    python tools/check_oracle.py /tmp/sf_adversarial            # sweep

The r10 campaign over these corpora found ten real crash/divergence
classes (tokenizer \\s vs RE2, DuckDB unicode trim, byte-vs-codepoint
head reads, simhash empty docs, token-ratio and Welch/Pearson/Gini
degenerate denominators, moments/ANOVA quantization overflow, the
markov twin dropping zero-mass states) — all invisible on the ASCII,
well-populated generated testdata. Re-run after adding operators.
The riskiest queries are additionally pinned as pytest fixtures in
tests/test_adversarial_corpus.py; this script exists for FULL-registry
sweeps.
"""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

SRC = "/root/testdata/sf0.001"


def _flatten(spark_df, out_path: str) -> None:
    """Write a Spark DataFrame as ONE parquet file (check_oracle's
    DuckDB views read '{t}.parquet' as a single file, not a dir)."""
    tmp_dir = out_path + ".dir"
    spark_df.coalesce(1).write.mode("overwrite").parquet(tmp_dir)
    src = glob.glob(f"{tmp_dir}/*.parquet")[0]
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{src}')) TO '{out_path}'"
        " (FORMAT PARQUET)"
    )
    shutil.rmtree(tmp_dir)


def adversarial_documents(spark):
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
    return spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def adversarial_events(spark):
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
    for i in range(60):
        add(T0 + dt.timedelta(minutes=300, seconds=i), 4, "view", 1.0)
    for d in range(5):
        add(dt.datetime(2024, 1, 1 + d), 5, "signup", 10.0)
    for i in range(10):
        add(T0 + dt.timedelta(minutes=400 + i), 6, "purchase", float(i))
    for i in range(10):
        add(T0 + dt.timedelta(minutes=500 + i), 7, "purchase", float(10 - i))
    for i in range(8):
        add(T0 + dt.timedelta(minutes=600 + 10 * i), 8, "error", 7.77)
    add(T0 + dt.timedelta(minutes=700), 9, "rare_type", 3.14)
    add(T0 + dt.timedelta(minutes=710), 9, "view", 1.0, None)
    add(T0 + dt.timedelta(minutes=711), 9, "view", 1.0, "{}")
    add(T0 + dt.timedelta(minutes=720), 10, "purchase", 9_999_999.99)
    add(T0 + dt.timedelta(minutes=721), 10, "refund", -9_999_999.99)
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_adversarial"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "embeddings"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")

    con = duckdb.connect()
    # Degenerate lineitem: slice (single-line + childless orders) +
    # exact duplicate (orderkey, linenumber) rows + boundary rows.
    con.execute(
        f"""
COPY (
  WITH base AS (
    SELECT * FROM read_parquet('{SRC}/lineitem.parquet')
    WHERE l_orderkey % 7 = 0
  ),
  dupes AS (SELECT * FROM base WHERE l_orderkey % 49 = 0),
  bounds AS (
    SELECT * REPLACE (0.00 AS l_discount, 1.0 AS l_quantity)
    FROM base WHERE l_orderkey % 35 = 0
  )
  SELECT * FROM base
  UNION ALL SELECT * FROM dupes
  UNION ALL SELECT * FROM bounds
) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
"""
    )

    from mapreduce_sssp_spark.session import get_spark

    spark = get_spark(app_name="make-adversarial-sf")
    _flatten(adversarial_documents(spark), f"{out}/documents.parquet")
    _flatten(adversarial_events(spark), f"{out}/events.parquet")
    print(f"adversarial sf dir written: {out}")


if __name__ == "__main__":
    main()
