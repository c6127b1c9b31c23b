"""Shared tokenization / shingling expression fragments for the text
operators (dedup, text analysis).

Both engines must tokenize identically for the oracles to hash-match:

* Spark:  ``filter(split(trim(text), '\\s+'), x -> x != '')``
* DuckDB: ``list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')``

Shingles are word 3-grams joined with a single space, de-duplicated
(set semantics — Jaccard is over shingle *sets*).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Spark SQL expression fragments (JVM-side, codegen'd — no UDFs).
TOKENS_EXPR = "filter(split(trim(text), '\\\\s+'), x -> x != '')"

SHINGLES_EXPR = (
    "if(size(toks) >= 3,"
    " array_distinct(transform(sequence(0, size(toks) - 3),"
    "   i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))),"
    " cast(array() as array<string>))"
)

# DuckDB twins.
DUCK_TOKENS = "list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')"

# (doc_id, s) exploded distinct shingles; 1-based list indexing.
DUCK_SHINGLES_REL = f"""
WITH toks AS (
  SELECT doc_id, {DUCK_TOKENS} AS t FROM documents
)
SELECT DISTINCT doc_id, t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT)+1]
                        || ' ' || t[CAST(i AS INT)+2] AS s
FROM toks, range(1, 10000) r(i)
WHERE CAST(i AS INT) + 2 <= len(t)
"""


def with_shingles(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, sh: array<string> distinct 3-gram shingles)."""
    return docs.select(
        "doc_id",
        F.expr(TOKENS_EXPR).alias("toks"),
    ).select("doc_id", F.expr(SHINGLES_EXPR).alias("sh"))
