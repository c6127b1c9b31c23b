"""Central registry merging every operator module's queries()/oracle_sql()
entries. Import side-effect free; each module contributes QUERIES (name ->
(spark, sf_dir) -> DataFrame) and ORACLE (name -> DuckDB SQL twin).
"""

from __future__ import annotations

from .io import python_datasource, sinks
from .operators import (
    asof,
    dedup,
    event_windows,
    graph_queries,
    grouped_pandas,
    multimodal,
    pipeline,
    python_surface,
    relational,
    sampling,
    scale_patterns,
    similarity,
    text_analysis,
)
from .streaming import foreach_sink, joins, stateful

_MODULES = [
    graph_queries,
    relational,
    dedup,
    similarity,
    text_analysis,
    event_windows,
    multimodal,
    asof,
    stateful,
    joins,
    foreach_sink,
    sampling,
    scale_patterns,
    grouped_pandas,
    python_surface,
    pipeline,
    sinks,
    python_datasource,
]

QUERIES = {}
ORACLE = {}
for _m in _MODULES:
    for _k in _m.QUERIES:
        assert _k not in QUERIES, f"duplicate query name: {_k}"
    QUERIES.update(_m.QUERIES)
    ORACLE.update(_m.ORACLE)

# Every oracle must have a query.
assert set(ORACLE) <= set(QUERIES), set(ORACLE) - set(QUERIES)
