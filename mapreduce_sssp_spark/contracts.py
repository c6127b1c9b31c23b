"""Shared value-domain contracts.

The NULL campaign (SCALE.md r11-r12) established the required-column
contract: a NULL in a column a query READS is a malformed cell and the
row is dropped, with the DuckDB twin mirroring the WHERE. The r12
non-finite probe corpus (tools/make_nonfinite_probe.py) showed the
same classes of failure for NaN/±Infinity in double measure columns —
ANSI cast crashes (CAST(NaN AS BIGINT) raises in Spark, DuckDB's cast
raises too: a whole-job outage at 100 TB, not a wrong row) and silent
divergences (NaN orders LAST in Spark sorts but acts as a plain huge
value in DuckDB percentile/ntile interpolation).

The finite-measure contract is the symmetric extension: a non-finite
double in a READ measure column is malformed and the row is DROPPED.
Engine side uses :func:`finite`; twins use ``isfinite(col)`` (DuckDB:
NULL -> NULL -> dropped by WHERE, NaN/Inf -> false), so both engines
take identical branches. Apply to exactly the columns the query reads,
at the same site as the NULL rail it extends.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_INF = float("inf")


def finite(c: Column | str) -> Column:
    """Boolean Column: ``c`` is non-NULL, non-NaN, and non-infinite.

    Mirrors DuckDB's ``isfinite(c)`` under a WHERE: NULL input yields
    NULL (dropped), NaN/±Inf yield false. Spark has no ``isfinite``
    built-in; ``isnan`` plus an ``abs() != Inf`` compare is the
    JVM-side equivalent (both inside whole-stage codegen — no UDF).
    """
    col = F.col(c) if isinstance(c, str) else c
    return col.isNotNull() & ~F.isnan(col) & (F.abs(col) != F.lit(_INF))


def finite_sql(col: str) -> str:
    """The twin-side mirror of :func:`finite` for DuckDB WHERE clauses."""
    return f"isfinite({col})"


def finite_portable_sql(col: str) -> str:
    """Finite predicate for SHARED SQL strings (run verbatim on both
    Spark and DuckDB — the TPC-H family's device). Spark has no
    ``isfinite``, DuckDB has no problem with ``isnan`` — but
    ``isnan(NULL)`` is false in Spark and NULL in DuckDB, so the
    explicit ``IS NOT NULL`` leg keeps the engines on one branch."""
    return (
        f"{col} IS NOT NULL AND NOT isnan({col})"
        f" AND abs({col}) <> CAST('Infinity' AS DOUBLE)"
    )
