"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship SSSP fixpoint at sf0.001;
``queries()`` maps every implemented operator (SURVEY.md §2 + §7) to a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` holds the DuckDB
ANSI-SQL twin for each hash-checked query. Queries whose semantics are
not SQL-expressible on DuckDB 1.0 (the converged SSSP over a cyclic
graph) omit the oracle and are covered by pytest cross-checks instead
(tests/test_sssp.py: pure-Python Dijkstra).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapreduce_sssp_spark import queries_registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: converged single-source shortest paths over the
    FIXTURES.md B1 graph derived from sf0.001 lineitem."""
    return queries_registry.QUERIES["sssp"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(queries_registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(queries_registry.ORACLE)
