"""Byte-compat formatters for the reference's text record grammars.

Only needed if output parity at the byte level is ever required; the
engine itself keeps everything as typed columns (SURVEY.md §1.3).

Grammars:
* node-state record ``nodeId<SP>distance|dst1:w1,dst2:w2,...|Y-or-N``
  (SingleSourceSP.java:114-121, comment at :140-145);
* final line ``queryNode<SP>nodeId<SP>minDist`` (SingleSourceSP.java:285-288);
* reversed adjacency ``nodeId<TAB>csv-of-neighbors`` (ReverseGraph.java:200).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sssp import SENTINEL


def _fmt_double(c: Column) -> Column:
    # Java Double.toString-ish: keep Spark's double->string cast, which
    # matches for the x.y values that occur here (e.g. "65535.0").
    return c.cast("string")


def format_state_line(state: DataFrame) -> DataFrame:
    """(node, dist, adj: array<struct<dst,weight>>, updated) -> text line."""
    adj_csv = F.array_join(
        F.transform(
            "adj",
            lambda x: F.concat_ws(":", x["dst"], _fmt_double(x["weight"])),
        ),
        ",",
    )
    line = F.concat_ws(
        "",
        F.col("node").cast("string"),
        F.lit(" "),
        _fmt_double(F.coalesce("dist", F.lit(SENTINEL))),
        F.lit("|"),
        adj_csv,
        F.lit("|"),
        F.when(F.col("updated"), "Y").otherwise("N"),
    )
    return state.select(line.alias("value"))


def format_final_line(result: DataFrame) -> DataFrame:
    """(source, node, dist) -> ``source node dist`` text line."""
    return result.select(
        F.concat_ws(
            " ",
            F.col("source").cast("string"),
            F.col("node").cast("string"),
            _fmt_double(F.col("dist")),
        ).alias("value")
    )


def format_reverse_line(rev: DataFrame) -> DataFrame:
    """(node, neighbors array) -> ``node<TAB>u1,u2,...`` text line."""
    return rev.select(
        F.concat_ws(
            "\t",
            F.col("node").cast("string"),
            F.array_join(F.transform("neighbors", lambda x: x.cast("string")), ","),
        ).alias("value")
    )
