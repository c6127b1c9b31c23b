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


def test_sqrt_bit_parity_and_benford_log_constants(spark):
    """Transcendental parity audit (r10): JVM Math and DuckDB libm
    disagree at the last ulp on ln/exp/pow for ~7-10% of random doubles
    (which is why every ln in an oracle-checked query follows the
    quantize-after ln-contract), but sqrt is IEEE-754 correctly-rounded
    and therefore bit-exact — the cosine/norm family
    (similarity._dot -> F.sqrt) relies on that. Pin sqrt over a dense
    sweep, and pin the nine Benford log10(1 + 1/d) constants the
    benford_digits oracle compares directly."""
    import duckdb

    from pyspark.sql import functions as F

    df = spark.range(50_000).selectExpr(
        "id", "abs(cast(xxhash64(id) as double)) / 9.3e13 AS m"
    )
    sp = df.select("id", F.sqrt("m").alias("s")).toPandas()
    con = duckdb.connect()
    con.register("sp", sp)
    inp = df.toPandas()
    con.register("inp", inp)
    n_diff = con.execute(
        "SELECT SUM(CASE WHEN sqrt(i.m) <> s.s THEN 1 ELSE 0 END) "
        "FROM inp i JOIN sp s USING (id)"
    ).fetchone()[0]
    assert n_diff == 0

    got = {
        r.d: r.v
        for r in spark.range(1, 10)
        .selectExpr("id AS d")
        .select(
            "d",
            F.log10(F.lit(1.0) + F.lit(1.0) / F.col("d").cast("double")).alias(
                "v"
            ),
        )
        .collect()
    }
    for d in range(1, 10):
        want = con.execute(
            "SELECT log10(1.0 + 1.0 / CAST(? AS DOUBLE))", [d]
        ).fetchone()[0]
        assert got[d] == want, (d, got[d], want)


def test_string_ordering_parity_beyond_bmp(spark):
    """Every row_number/min/max/ORDER BY tie-break on a string column
    assumes both engines compare strings identically. Spark's
    UTF8String compares UTF-8 BYTES (not Java UTF-16 code units), which
    is exactly DuckDB's comparator — so the parity extends beyond the
    BMP (astral chars sort after U+E000, unlike a UTF-16 code-unit
    comparison). Pin it, private-use and astral chars included."""
    import duckdb

    from pyspark.sql import functions as F

    vals = ["a", "Z", "z", "~", "é", "", "𝄞", "￮", "b", ""]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    sp_order = [r.s for r in df.orderBy("s").collect()]
    con = duckdb.connect()
    duck_order = [
        r[0]
        for r in con.execute(
            "SELECT s FROM (SELECT unnest(?) AS s) ORDER BY s", [vals]
        ).fetchall()
    ]
    assert sp_order == duck_order
    assert (
        df.agg(F.max("s")).collect()[0][0]
        == con.execute(
            "SELECT max(s) FROM (SELECT unnest(?) AS s)", [vals]
        ).fetchone()[0]
    )


def test_bench_record_repins_are_consistent():
    """BENCH_RECORD.json's _repins section is the audit trail for every
    record moved since the r8 pin (ADVICE r9). Keep it honest: every
    re-pinned query must still exist in records, its `to` value must
    equal the LIVE record (a later move must append a new entry, not
    silently overwrite), and from/to must differ."""
    import json
    import pathlib

    path = pathlib.Path(__file__).resolve().parents[1] / "BENCH_RECORD.json"
    data = json.loads(path.read_text())
    records = data["records"]
    repins = {
        k: v for k, v in data.get("_repins", {}).items() if isinstance(v, dict)
    }
    assert repins, "audit section missing"
    for name, entry in repins.items():
        assert name in records, name
        assert entry["from"] != entry["to"], name
        assert records[name] == entry["to"], (
            name,
            "live record moved without a fresh _repins entry",
            records[name],
            entry["to"],
        )
        assert entry.get("commit") and entry.get("source_round"), name


def test_welch_constant_large_groups_null_in_both_engines(spark, tmp_path):
    """r10 review reproduction: two event types each holding five
    identical $600,000.01 events. n*sxx == sx^2 exactly, but the double
    products disagree past 2^53, rounding se2 NEGATIVE — the unguarded
    engine emitted a bogus positive welch_df while the twin's
    sqrt(negative) RAISED. Both must now yield NULL t/df."""
    import datetime as dt

    import duckdb

    from mapreduce_sssp_spark import queries_registry as qr

    T0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(5):
        rows.append((i, T0 + dt.timedelta(minutes=i), 1, "alpha",
                     600000.01, "{}"))
        rows.append((10 + i, T0 + dt.timedelta(minutes=i), 2, "beta",
                     600000.01, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = qr.QUERIES["t_test_welch"](spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert got[0].t_stat is None and got[0].welch_df is None
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    want = con.execute(qr.ORACLE["t_test_welch"]).fetchall()
    assert len(want) == 1
    assert want[0][4] is None and want[0][5] is None
    spark.catalog.clearCache()
