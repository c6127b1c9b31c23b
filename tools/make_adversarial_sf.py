"""Build an adversarial sf directory for full-registry divergence sweeps.

Creates a complete table set under the target dir: crafted `documents`
(unicode whitespace, NBSP/ZWSP, vertical tab, CRLF, astral chars,
empty/whitespace-only docs, huge tokens, planted near/exact dups),
crafted `events` (duplicate timestamps, single-event users/types,
zero/negative/cancelling values, zero-variance groups, constant series,
$10M magnitudes), a degenerate-structure `lineitem` slice (single-line
orders, childless orders, duplicate (orderkey, linenumber) rows,
boundary discounts/quantities, half-cent prices, negative return
amounts, a many-line hub order and a hub part), crafted `orders`
(duplicate order keys, zero/negative/half-cent/$10M totalprices, exact
price ties, orphan customer keys, hub customers, leap-day and
1999-boundary dates, duplicate timestamps), crafted `embeddings`
(zero vector, exact duplicates, negated and scaled copies, one-hot,
1e-7 near-ties, float32-overflow magnitudes, denormals, -0.0
components, singleton labels), and sf0.001 copies of everything else
(r11 campaign — the r10 sweep crafted only documents/events).

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
    # NULL cells (r11 wave 3): NULL text / lang / source / n_chars.
    rows.append((22, None, "en", "src0", None))
    rows.append((23, "null lang and source doc with words", None, None, 35))
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
    # NULL-cell rows (r11 wave 3): NULL value / type / user / ts — the
    # ordering-by-NULL and NULL-group-key classes.
    add(T0 + dt.timedelta(minutes=800), 11, "view", None)
    add(T0 + dt.timedelta(minutes=801), 11, None, 2.0)
    add(T0 + dt.timedelta(minutes=802), None, "view", 3.0)
    add(None, 12, "view", 4.0)
    # Non-finite rows (r12 wave 2): each sits in a group with finite
    # members, so drop-vs-poison-vs-crash are three distinguishable
    # outcomes (see tools docstring / SCALE.md non-finite campaign).
    add(T0 + dt.timedelta(minutes=810), 13, "view", float("nan"))
    add(T0 + dt.timedelta(minutes=811), 13, "view", 7.0)
    add(T0 + dt.timedelta(minutes=812), 14, "purchase", float("inf"))
    add(T0 + dt.timedelta(minutes=813), 14, "purchase", 9.0)
    add(T0 + dt.timedelta(minutes=814), 15, "click", float("-inf"))
    # NOTE (r12): the >=1000-near-limit-groups ANOVA battery (ADVICE
    # r11) lives in tests/test_anova_limits.py, NOT here — 1100 extra
    # event types turns every |types|^2 pair query (ks_test, welch,
    # mann-whitney) into a ~620k-pair run and stalls the full-registry
    # sweep for hours. The dedicated referee exercises the same
    # 2^63-sum rail engine-vs-DuckDB on its own corpus.
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )


def adversarial_orders(spark):
    """Crafted orders: key/price/date degeneracies the generated TPC-H
    slice never produces.  A base slice keeps join mass for the
    customer/nation queries; the injected rows are the hunt."""
    T = dt.datetime
    rows = []
    oid = 10_000_000  # far above sf0.001's key range

    def add(key, cust, status, price, date, prio):
        rows.append((key, cust, status, price, date, prio))

    # Duplicate o_orderkey (PK break): same key, different rows.
    add(oid + 1, 1, "O", 100.00, T(1997, 6, 1), "1-URGENT")
    add(oid + 1, 1, "F", 200.00, T(1997, 6, 2), "5-LOW")
    # Exact price ties across many orders: rank/percentile plateaus.
    for i in range(10):
        add(oid + 10 + i, 2, "O", 5000.00, T(1997, 7, 1 + i), "3-MEDIUM")
    # Zero / tiny / negative (credit) / huge totalprice.
    add(oid + 30, 3, "F", 0.00, T(1996, 2, 29), "2-HIGH")   # leap day
    add(oid + 31, 3, "F", 0.01, T(2000, 2, 29), "2-HIGH")   # leap day
    add(oid + 32, 3, "F", -500.25, T(1998, 12, 31), "4-NOT SPECIFIED")
    add(oid + 33, 3, "P", 9_999_999.99, T(1999, 1, 1), "1-URGENT")
    # Half-cent / .x5 boundaries (round() divergence class, probed r10
    # on part prices — 1bb0c16).
    add(oid + 40, 4, "O", 100.005, T(1998, 12, 31), "5-LOW")
    add(oid + 41, 4, "O", 0.005, T(1999, 1, 1), "5-LOW")
    add(oid + 42, 4, "O", 1234.565, T(1999, 1, 2), "5-LOW")
    # Hub customer: one customer with 40 orders, same date cluster.
    for i in range(40):
        add(oid + 100 + i, 5, "O", 10.00 + i, T(1997, 3, 15), "3-MEDIUM")
    # Single-order customers with identical timestamps (dupe-ts windows).
    for i in range(5):
        add(oid + 200 + i, 100 + i, "F", 777.77, T(1995, 1, 1), "2-HIGH")
    # Orphan o_custkey (no such customer): outer-join / anti-join paths.
    add(oid + 300, 99_999_999, "O", 314.15, T(1997, 9, 9), "1-URGENT")
    # Unseen status value: pivot/conditional robustness.
    add(oid + 301, 6, "X", 42.42, T(1997, 10, 10), "3-MEDIUM")
    # NULL-cell rows (r11 wave 4): NULL price / date / custkey /
    # priority — NULL window-order keys and NULL group keys.
    add(oid + 400, 7, "O", None, T(1997, 11, 1), "1-URGENT")
    add(oid + 401, 7, "O", 55.55, None, "2-HIGH")
    add(oid + 402, None, "F", 66.66, T(1997, 11, 3), "3-MEDIUM")
    add(oid + 403, 8, "P", 77.77, T(1997, 11, 4), None)
    # Non-finite prices (r12 wave 2): the cents-cast outage class.
    add(oid + 404, 9, "O", float("nan"), T(1997, 11, 5), "1-URGENT")
    add(oid + 405, 9, "O", float("inf"), T(1997, 11, 6), "2-HIGH")
    crafted = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp_ntz,"
        " o_orderpriority string",
    )
    base = spark.read.parquet(f"{SRC}/orders.parquet").filter(
        "o_orderkey % 3 = 0"
    )
    return base.unionByName(crafted.selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate", "o_orderpriority",
    ))


def adversarial_embeddings(spark):
    """Crafted embeddings: norm-zero / tie / float32-edge vectors.  All
    dim 64 (the generated dim); values chosen exactly representable in
    float32 so both engines read identical bits."""
    DIM = 64
    rows = []
    vid = 1_000_000

    def add(vec, label):
        nonlocal vid
        rows.append((vid, [float(x) for x in vec], label))
        vid += 1

    base_vec = [((i * 37) % 19 - 9) / 8.0 for i in range(DIM)]
    add([0.0] * DIM, 0)                       # zero vector: norm 0
    add(base_vec, 1)
    add(base_vec, 1)                          # exact duplicate (tie)
    add([-x for x in base_vec], 1)            # negated: cosine -1
    add([2.0 * x for x in base_vec], 1)       # scaled: cosine +1
    one_hot = [0.0] * DIM
    one_hot[7] = 1.0
    add(one_hot, 2)                           # one-hot
    near = list(base_vec)
    near[0] += 2.0 ** -23                     # 1-ulp-ish near-tie
    add(near, 2)
    add([1.0e19] * DIM, 3)                    # dot overflows float32
    add([1.0e-40] * DIM, 3)                   # float32 denormal
    add([-0.0] * DIM, 4)                      # sign-of-zero components
    add([1.0] * DIM, 5)                       # constant vector
    add([(-1.0) ** i for i in range(DIM)], 9)  # singleton label 9
    rows.append((vid, None, 6))               # NULL embedding (wave 3)
    rows.append((vid + 1, [1.0] * DIM, None))  # NULL label
    crafted = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    base = spark.read.parquet(f"{SRC}/embeddings.parquet").filter(
        "vec_id % 5 != 4"
    )
    return base.unionByName(crafted)


def adversarial_part(spark):
    """Crafted parts: unicode names (levenshtein/fuzzy chars-vs-bytes
    paths), duplicate keys, duplicate names, half-cent and zero/negative
    retail prices, zero/huge sizes."""
    rows = []
    pid = 10_000_000

    def add(key, name, brand, typ, size, price):
        rows.append((key, name, brand, typ, size, price))

    add(pid + 1, "café widget", "Brand#13", "ECONOMY", 5, 100.005)
    add(pid + 2, "cafe widget", "Brand#13", "ECONOMY", 5, 100.004)
    add(pid + 3, "naïve bölt", "Brand#5", "PROMO", 0, 0.005)
    add(pid + 4, "naive bolt", "Brand#5", "PROMO", 0, 0.004)
    add(pid + 5, "ウィジェット 大", "Brand#19", "STANDARD", 50, 1234.565)
    add(pid + 6, "ウィジェット 小", "Brand#19", "STANDARD", 1, 1234.564)
    # duplicate p_partkey, different rows (PK break)
    add(pid + 7, "dup key a", "Brand#1", "ECONOMY", 7, 77.77)
    add(pid + 7, "dup key b", "Brand#2", "PROMO", 8, 88.88)
    # duplicate names across keys (fuzzy self-match mass)
    for i in range(5):
        add(pid + 10 + i, "identical widget", "Brand#3", "ECONOMY", 10, 10.0)
    add(pid + 20, "", "Brand#4", "ECONOMY", 0, 0.0)          # empty name
    add(pid + 21, "x", "Brand#4", "ECONOMY", 2_000_000, 9_999_999.99)
    add(pid + 22, "negative price part", "Brand#6", "PROMO", 3, -12.34)
    # NULL cells (r11 wave 4)
    add(pid + 30, None, "Brand#7", "ECONOMY", 4, 44.44)
    add(pid + 31, "null price part", "Brand#7", "PROMO", 5, None)
    add(pid + 32, "null size part", "Brand#7", "STANDARD", None, 55.55)
    crafted = spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    base = spark.read.parquet(f"{SRC}/part.parquet")
    return base.unionByName(crafted)


def adversarial_customer(spark):
    """Crafted customers: duplicate keys, orphan nation keys, unseen
    segment, zero/negative/half-cent balances, unicode names."""
    rows = []
    cid = 10_000_000

    def add(key, name, nat, bal, seg):
        rows.append((key, name, nat, bal, seg))

    add(cid + 1, "dup key customer a", 0, 100.00, "MACHINERY")
    add(cid + 1, "dup key customer b", 1, -100.00, "HOUSEHOLD")
    add(cid + 2, "orphan nation", 9_999, 50.005, "BUILDING")
    add(cid + 3, "zérø bàlance 客户", 2, 0.0, "AUTOMOBILE")
    add(cid + 4, "deep debt", 3, -999_999.99, "FURNITURE")
    add(cid + 5, "unseen segment", 4, 777.77, "AEROSPACE")
    for i in range(5):
        add(cid + 10 + i, "tied balance", 5, 123.45, "MACHINERY")
    # NULL cells (r11 wave 4)
    add(cid + 20, "null balance", 6, None, "MACHINERY")
    add(cid + 21, "null segment", 7, 10.0, None)
    add(cid + 22, "null nation", None, 20.0, "BUILDING")
    crafted = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    )
    base = spark.read.parquet(f"{SRC}/customer.parquet")
    return base.unionByName(crafted)


def adversarial_supplier(spark):
    """Crafted suppliers: duplicate key, orphan nation, negative and
    tied balances (the table is 10 rows — supplier-keyed aggregates and
    broadcast joins see every degeneracy at once)."""
    rows = [
        (10_000_001, "dup supp a", 0, 11.11),
        (10_000_001, "dup supp b", 1, -11.11),
        (10_000_002, "orphan supp", 9_999, 0.005),
        (10_000_003, "tied supp x", 2, 500.00),
        (10_000_004, "tied supp y", 3, 500.00),
    ]
    crafted = spark.createDataFrame(
        rows,
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    base = spark.read.parquet(f"{SRC}/supplier.parquet")
    return base.unionByName(crafted)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_adversarial"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    # nation/region stay verbatim: 25/5-row dimensions whose exact
    # contents several queries treat as referential ground truth.
    for t in ("region", "nation"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")

    con = duckdb.connect()
    # Degenerate lineitem: slice (single-line + childless orders) +
    # exact duplicate (orderkey, linenumber) rows + boundary rows +
    # (r11) half-cent prices, negative return amounts, a 60-line hub
    # order and a hub part shared by every hub line.
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
  ),
  halfcent AS (
    SELECT * REPLACE (123.455 AS l_extendedprice, 0.05 AS l_discount)
    FROM base WHERE l_orderkey % 77 = 0
  ),
  negret AS (
    SELECT * REPLACE (-l_extendedprice AS l_extendedprice,
                      'R' AS l_returnflag)
    FROM base WHERE l_orderkey % 91 = 0
  ),
  hub AS (
    SELECT 20000001 AS l_orderkey, 42 AS l_partkey, 7 AS l_suppkey,
           CAST(i AS INT) AS l_linenumber, 5.0 AS l_quantity,
           1000.00 AS l_extendedprice, 0.04 AS l_discount,
           0.02 AS l_tax, 'N' AS l_returnflag, 'O' AS l_linestatus,
           TIMESTAMP '1997-05-05 00:00:00' AS l_shipdate
    FROM range(1, 61) r(i)
  ),
  -- NULL-cell rows (r11 wave 4): NULL quantity / price / discount /
  -- returnflag (NULL group key) / shipdate.
  nullcells AS (
    SELECT * FROM (VALUES
      (CAST(20000002 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT),
       CAST(1 AS INT), CAST(NULL AS DOUBLE), 500.00, 0.01, 0.02,
       'N', 'O', TIMESTAMP '1997-06-01 00:00:00'),
      (20000003, 2, 2, 1, 3.0, CAST(NULL AS DOUBLE), 0.01, 0.02,
       'A', 'F', TIMESTAMP '1997-06-02 00:00:00'),
      (20000004, 3, 3, 1, 4.0, 600.00, CAST(NULL AS DOUBLE), 0.02,
       'R', 'F', TIMESTAMP '1997-06-03 00:00:00'),
      (20000005, 4, 4, 1, 5.0, 700.00, 0.03, 0.02,
       CAST(NULL AS VARCHAR), 'O', TIMESTAMP '1997-06-04 00:00:00'),
      (20000006, 5, 5, 1, 6.0, 800.00, 0.04, 0.02,
       'N', 'O', CAST(NULL AS TIMESTAMP)),
      -- r12: PAIR-FORMING NULL-quantity rows. Row 20000002's NULL
      -- quantity sits in a singleton order, so it can never change a
      -- co-occurrence pair or a bipartite pair count — which is how
      -- the r11 ktruss/random_walks twin WHERE (absent from the
      -- engine's weight-free incidence) stayed green. These rows make
      -- the NULL-quantity cell LOAD-BEARING: dropping it kills the
      -- part pair (9101,9102) and drops bipartite (9101,9102)'s
      -- n_shared from 2 to 1.
      (20000007, 9101, 9101, 1, CAST(NULL AS DOUBLE), 100.00, 0.01,
       0.02, 'N', 'O', TIMESTAMP '1997-06-05 00:00:00'),
      (20000007, 9102, 9102, 2, 1.0, 100.00, 0.01, 0.02,
       'N', 'O', TIMESTAMP '1997-06-05 00:00:00'),
      (20000008, 9101, 9102, 1, 1.0, 100.00, 0.01, 0.02,
       'N', 'O', TIMESTAMP '1997-06-06 00:00:00'),
      (20000008, 9103, 9101, 2, 1.0, 100.00, 0.01, 0.02,
       'N', 'O', TIMESTAMP '1997-06-06 00:00:00'),
      (20000008, 9103, 9102, 3, 1.0, 100.00, 0.01, 0.02,
       'N', 'O', TIMESTAMP '1997-06-06 00:00:00'),
      -- r12 NULL-node-id wave (VERDICT #6): the graph family's analogue
      -- of the reference's Character.isDigit guard — a NULL suppkey or
      -- partkey is a malformed edge endpoint, a NULL orderkey is a
      -- malformed co-occurrence basket, a NULL linenumber is a
      -- malformed DAG position (and a NULLS FIRST/LAST ordering trap:
      -- Spark windows default NULLS FIRST, DuckDB NULLS LAST).
      (20000009, CAST(NULL AS BIGINT), 6, 1, 1.0, 100.00, 0.01, 0.02,
       'N', 'O', TIMESTAMP '1997-06-07 00:00:00'),
      (20000010, 7, CAST(NULL AS BIGINT), 1, 2.0, 100.00, 0.01, 0.02,
       'N', 'O', TIMESTAMP '1997-06-07 00:00:00'),
      (20000011, 8, 8, CAST(NULL AS INT), 3.0, 100.00, 0.01, 0.02,
       'N', 'O', TIMESTAMP '1997-06-07 00:00:00'),
      (20000011, 9, 8, 2, 3.5, 100.00, 0.01, 0.02,
       'N', 'O', TIMESTAMP '1997-06-07 00:00:00'),
      -- Two NULL-orderkey rows with DISTINCT parts: a group-by-order
      -- engine that keeps the NULL group would mint a spurious
      -- co-occurrence pair (9104,9105) that an equi-join twin drops.
      (CAST(NULL AS BIGINT), 9104, 9104, 1, 1.0, 100.00, 0.01, 0.02,
       'N', 'O', TIMESTAMP '1997-06-08 00:00:00'),
      (CAST(NULL AS BIGINT), 9105, 9105, 1, 1.0, 100.00, 0.01, 0.02,
       'N', 'O', TIMESTAMP '1997-06-08 00:00:00'),
      -- r12 wave 2: non-finite measures, each load-bearing next to a
      -- finite sibling in the same order/group (drop vs poison vs
      -- crash are distinguishable). NaN B1 weight also probes the
      -- dst:weight text grammar ('NaN' vs 'nan' float formatting).
      (30000001, 9201, 9201, 1, CAST('NaN' AS DOUBLE), 100.00, 0.01,
       0.02, 'N', 'O', TIMESTAMP '1997-07-01 00:00:00'),
      (30000001, 9202, 9202, 2, 2.0, 100.00, 0.01, 0.02,
       'N', 'O', TIMESTAMP '1997-07-01 00:00:00'),
      (30000002, 9203, 9203, 1, 1.0, CAST('Infinity' AS DOUBLE), 0.01,
       0.02, 'N', 'O', TIMESTAMP '1997-07-02 00:00:00'),
      (30000003, 9204, 9204, 1, 1.0, CAST('NaN' AS DOUBLE), 0.01, 0.02,
       'R', 'F', TIMESTAMP '1997-07-03 00:00:00'),
      (30000004, 9205, 9205, 1, CAST('-Infinity' AS DOUBLE), 100.00,
       CAST('NaN' AS DOUBLE), CAST('NaN' AS DOUBLE),
       'A', 'F', TIMESTAMP '1997-07-04 00:00:00')
    ) t(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
        l_shipdate)
  )
  SELECT * FROM base
  UNION ALL SELECT * FROM dupes
  UNION ALL SELECT * FROM bounds
  UNION ALL SELECT * FROM halfcent
  UNION ALL SELECT * FROM negret
  UNION ALL SELECT * FROM hub
  UNION ALL SELECT * FROM nullcells
) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
"""
    )

    from mapreduce_sssp_spark.session import get_spark

    spark = get_spark(app_name="make-adversarial-sf")
    _flatten(adversarial_documents(spark), f"{out}/documents.parquet")
    _flatten(adversarial_events(spark), f"{out}/events.parquet")
    _flatten(adversarial_orders(spark), f"{out}/orders.parquet")
    _flatten(adversarial_embeddings(spark), f"{out}/embeddings.parquet")
    _flatten(adversarial_part(spark), f"{out}/part.parquet")
    _flatten(adversarial_customer(spark), f"{out}/customer.parquet")
    _flatten(adversarial_supplier(spark), f"{out}/supplier.parquet")
    print(f"adversarial sf dir written: {out}")


if __name__ == "__main__":
    main()
