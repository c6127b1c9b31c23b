"""Shared tokenization / shingling expression fragments for the text
operators (dedup, text analysis).

Both engines must tokenize identically for the oracles to hash-match.
The token contract is: non-empty runs between ASCII whitespace
``[ \\t\\n\\x0B\\f\\r]`` — exactly Java's default (non-UNICODE) ``\\s``
class, which is what Spark's ``split(text, '\\s+')`` evaluates.

The DuckDB twin spells the class EXPLICITLY and uses no ``trim``:
RE2's ``\\s`` lacks ``\\x0B`` (vertical tab), and DuckDB's ``trim``
strips UNICODE spaces (U+3000 etc.) that Java ``\\s`` does not — with
``trim(text)`` on the oracle side, a CJK document with ideographic
spaces tokenized differently in the two engines (probed r10; ASCII
testdata masks it). ``trim`` is redundant under the empty-string
filter anyway (leading/trailing separators only ever produce ``''``
pieces), so the Spark side keeps its idiomatic spelling and the DuckDB
side matches it character-class-for-character-class. Parity pinned in
tests/test_text_io.py::test_tokenizer_unicode_whitespace_parity.

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

# DuckDB twins. Explicit ASCII class == Java \s; no trim (see module
# docstring — DuckDB trim strips unicode spaces Java \s does not).
DUCK_TOKENS = (
    "list_filter(string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+'),"
    " x -> x <> '')"
)

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

# Max document-frequency for a shingle to stay in the pair-generating
# inverted index. A shingle shared by d documents yields d^2 rows in a
# shingle-keyed self-join BEFORE any similarity threshold can filter —
# one boilerplate 3-gram ("all rights reserved") in a million documents
# is 10^12 join rows. Ubiquitous shingles also carry no near-dup signal
# (every Jaccard-0.8 pair shares many RARE shingles), so the standard
# max-df cut removes the quadratic heavy posting lists while barely
# moving the similarity values — the same frontier-gating insight as the
# reference's SSSP round pruning (SingleSourceSP.java:179: prune before
# the expensive shuffle), and the same device q_sparse_cosine_pairs
# already applies to term postings (SPARSE_COS_MAX_DF).
#
# At the test scales the cap never binds (max observed shingle df: 7 at
# sf0.01, 25 at sf0.1), so pruned results equal unpruned results there;
# at corpus scale it bounds every posting list — and therefore the join
# fan-out per shingle — by SHINGLE_MAX_DF^2 rows.
SHINGLE_MAX_DF = 400


def prune_hot_shingles(post: DataFrame, max_df: int = SHINGLE_MAX_DF) -> DataFrame:
    """(doc_id, s) postings -> the same postings minus shingles whose
    document frequency exceeds ``max_df``.

    Implemented as an ANTI join against the HOT set (df > max_df), not
    an inner join against the keep set (df <= max_df): the two are the
    same filter, but the keep set is nearly the whole vocabulary — the
    join must shuffle every posting to meet it — while the hot set is
    tiny whenever the cap is doing its job (empty at test scale, one
    row per boilerplate shingle at corpus scale), so AQE plans the anti
    join as a broadcast at runtime and the postings never shuffle for
    the prune. No hint, so a degenerate corpus where most shingles are
    hot still gets a shuffled anti join instead of a driver OOM. The df
    aggregate partial-combines map-side; the prune must sit BELOW any
    pair-generating self-join (pinned in tests/test_plans.py) for the
    d^2 bound to hold.
    """
    hot = (
        post.groupBy("s")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_df)
        .select("s")
    )
    return post.join(hot, "s", "left_anti").select("doc_id", "s")


# Drop-in pruned twin of DUCK_SHINGLES_REL (same columns). Evaluates the
# shingle CTE twice textually; DuckDB at oracle scale doesn't care.
DUCK_SHINGLES_PRUNED_REL = f"""
SELECT a.doc_id, a.s
FROM ({DUCK_SHINGLES_REL}) a
JOIN (SELECT s FROM ({DUCK_SHINGLES_REL}) GROUP BY s
      HAVING count(*) <= {SHINGLE_MAX_DF}) keepset USING (s)
"""


def with_shingles(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, sh: array<string> distinct 3-gram shingles).

    The repartition between the token projection and the shingle
    projection is load-bearing twice over: (1) it spreads the per-doc
    shingling across all cores even when the source is one small parquet
    split, and (2) it is an optimizer barrier — without it
    CollapseProject inlines the tokenize expression into every
    ``toks[i]`` reference inside the shingle transform (3x per shingle
    element) and filter-pushdown can drag the whole pipeline below the
    exchange into the single scan task. Measured 10-20x on sf0.1.
    """
    spark = docs.sparkSession
    n = spark.sparkContext.defaultParallelism
    toks = docs.select("doc_id", F.expr(TOKENS_EXPR).alias("toks")).repartition(n)
    return toks.select("doc_id", F.expr(SHINGLES_EXPR).alias("sh"))


def shingle_postings(docs: DataFrame) -> DataFrame:
    """documents -> exploded (doc_id, s) postings, one row per distinct
    shingle.

    Uses explode_OUTER + an explicit null-filter instead of plain explode:
    for a non-outer Generate, Catalyst's InferFiltersFromGenerate adds a
    ``size(sh) > 0 AND isnotnull(sh)`` filter which filter-pushdown then
    drags below the repartition barrier with the whole shingle pipeline
    inlined (tokenize re-evaluated 3x per element, single scan task) —
    a measured 30x slowdown. The outer generate admits no inferred
    filter, and the null-filter on the *generated* column cannot be
    pushed below the Generate.
    """
    sh = with_shingles(docs)
    return sh.select("doc_id", F.explode_outer("sh").alias("s")).filter(
        F.col("s").isNotNull()
    )
