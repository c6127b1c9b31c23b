"""Finite-measure contract parity referee (r12).

The contract (mapreduce_sssp_spark/contracts.py) has THREE spellings
that must agree row-for-row or the engine and its DuckDB twin silently
diverge on dirty data:

* ``finite()``            — the Spark Column predicate,
* ``isfinite(col)``       — the DuckDB twin WHERE,
* ``finite_portable_sql`` — the shared-string spelling the TPC-H family
  runs VERBATIM on both engines.

The edge set covers the values where the engines' scalar semantics are
known to differ (``isnan(NULL)`` is false in Spark but NULL in DuckDB;
NaN compares as the largest value in both engines' orderings), plus
signed zero and near-limit magnitudes. A drift in ANY spelling shows up
as a keep-set mismatch here before it can ship as a red driver row.
"""

from __future__ import annotations

import math

import duckdb

from mapreduce_sssp_spark.contracts import (
    finite,
    finite_portable_sql,
    finite_sql,
)

EDGE_VALUES = [
    None,
    float("nan"),
    float("inf"),
    float("-inf"),
    0.0,
    -0.0,
    1.5,
    -1.5,
    1e308,
    -1e308,
    5e-324,  # smallest subnormal
]
EXPECT_KEPT = {4, 5, 6, 7, 8, 9, 10}  # indices of finite values


def _spark_table(spark):
    rows = [(i, v) for i, v in enumerate(EDGE_VALUES)]
    return spark.createDataFrame(rows, "i int, x double")


def _duck_rel(con):
    con.execute("CREATE OR REPLACE TABLE t (i INT, x DOUBLE)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [(i, v) for i, v in enumerate(EDGE_VALUES)],
    )


def test_finite_column_predicate(spark):
    kept = {
        r.i for r in _spark_table(spark).filter(finite("x")).collect()
    }
    assert kept == EXPECT_KEPT


def test_duckdb_isfinite_matches(spark):
    con = duckdb.connect()
    _duck_rel(con)
    kept = {
        r[0]
        for r in con.execute(
            f"SELECT i FROM t WHERE {finite_sql('x')}"
        ).fetchall()
    }
    assert kept == EXPECT_KEPT


def test_portable_spelling_agrees_in_both_engines(spark):
    pred = finite_portable_sql("x")
    df = _spark_table(spark)
    df.createOrReplaceTempView("contract_probe")
    spark_kept = {
        r.i
        for r in spark.sql(
            f"SELECT i FROM contract_probe WHERE {pred}"
        ).collect()
    }
    con = duckdb.connect()
    _duck_rel(con)
    duck_kept = {
        r[0] for r in con.execute(f"SELECT i FROM t WHERE {pred}").fetchall()
    }
    assert spark_kept == duck_kept == EXPECT_KEPT


def test_b1_contract_drops_nonfinite_weights(spark):
    """The B1 edge contract's r12 finite-weight leg: a NaN weight
    reaches the dst:weight text grammar and renders 'NaN' in Spark but
    'nan' in DuckDB's float formatting — byte-divergent compat lines
    (caught by the non-finite probe corpus on adjacency /
    compat_state_lines)."""
    import pathlib
    import tempfile

    from mapreduce_sssp_spark.io.sources import edges_from_lineitem

    li = spark.createDataFrame(
        [
            (1, 10, 1, 1, 5.0, 1.0, 0.0, 0.0, "N", "O", None),
            (1, 11, 2, 2, float("nan"), 1.0, 0.0, 0.0, "N", "O", None),
            (2, 12, 3, 1, float("inf"), 1.0, 0.0, 0.0, "N", "O", None),
            (2, 13, 4, 2, float("-inf"), 1.0, 0.0, 0.0, "N", "O", None),
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
        assert len(rows) == 1
        assert rows[0].src == 1 and math.isfinite(rows[0].weight)
