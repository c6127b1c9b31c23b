"""UDTF / grouped-agg pandas UDAF / Arrow scalar UDF edge cases —
the escape-hatch surfaces must keep exact, engine-portable semantics."""

from __future__ import annotations

import pandas as pd

from mapreduce_sssp_spark.operators.python_surface import (
    q_arrow_udf_slug,
    q_udaf_median,
    q_udtf_sentences,
)


def _sentence_rows(spark, docs):
    from pyspark.sql.functions import udtf

    from mapreduce_sssp_spark.operators.python_surface import SentenceStats

    spark.udtf.register(
        "sentence_stats_t",
        udtf(SentenceStats, returnType="n_chars: bigint, n_words: bigint"),
    )
    spark.createDataFrame(docs, "doc_id long, text string").createOrReplaceTempView(
        "t_docs"
    )
    return sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT d.doc_id, s.n_chars, s.n_words"
            " FROM t_docs d, LATERAL sentence_stats_t(d.text) s"
        ).collect()
    )


def test_udtf_splits_and_filters_empty_sentences(spark):
    rows = _sentence_rows(
        spark,
        [
            (1, "One two. Three.  . "),  # trailing empties dropped
            (2, "a  b"),  # consecutive spaces -> empty token counted
            (3, None),  # null text -> no rows
            (4, ""),  # empty text -> no rows
        ],
    )
    # doc 1: "One two" (7 raw chars, 2 words), " Three" (6 raw, 1 word)
    # doc 2: "a  b" (4 chars; split(' ') -> ['a','','b'] = 3 tokens)
    assert rows == [(1, 6, 1), (1, 7, 2), (2, 4, 3)]


def test_udaf_median_even_and_odd_groups(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (1, 4.0), (2, 5.0), (2, 1.0), (2, 9.0)],
        "l_suppkey long, l_quantity double",
    )
    df.write.mode("overwrite").parquet("/tmp/udaf_median_test/lineitem.parquet")
    got = {
        r.l_suppkey: (r.median2_qty, r.n_items)
        for r in q_udaf_median(spark, "/tmp/udaf_median_test").collect()
    }
    # group 1: median(2,4)=3.0 -> 6; group 2: median=5 -> 10
    assert got == {1: (6, 2), 2: (10, 3)}


def test_arrow_slug_matches_builtin_regexp(spark, sf_dir):
    from pyspark.sql import functions as F

    from mapreduce_sssp_spark.io.sources import load_table

    got = q_arrow_udf_slug(spark, sf_dir)
    ref = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.expr(
            "trim(BOTH '-' FROM regexp_replace(lower(p_name), '[^a-z0-9]+', '-'))"
        ).alias("slug"),
    )
    assert got.exceptAll(ref).count() == 0 and ref.exceptAll(got).count() == 0


def test_udtf_query_entry_runs_on_testdata(spark, sf_dir):
    df = q_udtf_sentences(spark, sf_dir)
    pdf: pd.DataFrame = df.limit(50).toPandas()
    assert {"doc_id", "n_chars", "n_words"} == set(pdf.columns)
    assert (pdf["n_words"] >= 1).all()


def test_pyds_writer_two_phase_commit(spark, sf_dir):
    """The custom writer's staged files must all be renamed at commit
    (no _staged- leftovers) and the directory readable by the custom
    reader with exactly the written row count."""
    import os
    import tempfile

    from mapreduce_sssp_spark.io.python_datasource import (
        q_pyds_edges_writer_roundtrip,
    )

    n = q_pyds_edges_writer_roundtrip(spark, sf_dir).count()
    assert n == spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    path = os.path.join(
        tempfile.gettempdir(),
        "spark-graft-pyds-" + sf_dir.strip("/").replace("/", "_"),
        "edges_written",
    )
    names = os.listdir(path)
    assert names and all(f.startswith("part-") for f in names)
