"""Round-10 cross-engine parity referees: crafted fixtures for the
divergence classes probed this round (fractional round on doubles).
The tokenizer/trim and levenshtein pins live in test_text_io.py and
test_scale_patterns.py."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F


def test_price_round_device_agrees_on_half_boundaries(spark, tmp_path):
    """round(x, 1) diverges between engines on .x5 doubles (Spark
    HALF_UPs the shortest decimal string; DuckDB rounds the binary
    value). The scalar_string_math device routes through scale-0
    rounding of x*10, which is identical in both engines — pin it on
    exactly the boundary values the testdata lacks."""
    prices = [900.15, 900.25, 1.05, 0.05, 123.45, 900.1, 77.0]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(prices)],
        "p_partkey long, p_retailprice double",
    )
    got = {
        r.p_partkey: r.price_round
        for r in df.select(
            "p_partkey",
            (
                F.round(F.col("p_retailprice") * 10).cast("bigint") / 10.0
            ).alias("price_round"),
        ).collect()
    }
    con = duckdb.connect()
    for i, p in enumerate(prices):
        want = con.execute(
            "SELECT CAST(round(CAST(? AS DOUBLE) * 10) AS BIGINT) / 10.0",
            [p],
        ).fetchone()[0]
        assert got[i] == want, (p, got[i], want)
    # And the divergence this device avoids, pinned so a future engine
    # change resurfaces it: fractional round disagrees on 1.005.
    spark_r = (
        spark.createDataFrame([(1.005,)], "v double")
        .select(F.round("v", 2).alias("r"))
        .collect()[0]
        .r
    )
    duck_r = con.execute(
        "SELECT round(CAST(1.005 AS DOUBLE), 2)"
    ).fetchone()[0]
    assert spark_r == 1.01 and duck_r == 1.0
