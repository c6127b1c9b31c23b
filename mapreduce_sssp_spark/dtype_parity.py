"""Canonical dtype names shared by the Spark result schema and a DuckDB
oracle's Arrow schema, so cross-engine dtype drift is detectable even
when the fetched Python values compare equal.

Why this exists: the external correctness driver hashes result values
per-dtype, so DuckDB ``SUM(BIGINT)`` widening to HUGEINT (Arrow
decimal128(38,0)) fails the hash against Spark's BIGINT even though
``fetchall()`` erases both to Python int and every value matches — the
round-4 BPE false negative.  Comparing canonical dtypes per column turns
that driver-only failure class into a locally-caught one
(tools/check_oracle.py flags DTYPE-DRIFT; tests/test_dtype_parity.py
audits the whole registry).
"""

from __future__ import annotations

# Output-dtype whitelist (r11, closes the r4/r6/r10 dtype-hash incident
# class structurally): every registry query's OUTPUT columns must be one
# of these canonical dtypes.  The driver's value hash stringifies
# per-dtype, and anything outside this set has bitten at least once
# (decimal: r10 moments_value red row with bit-identical values; the
# list is the proven-portable survivor set — int32 driver-green since
# r2 across ~30 queries).  Wide decimals/arrays are fine INTERNALLY;
# cast to STRING at the output projection.  Enforced by
# tests/test_output_dtypes.py (registry sweep) and tools/check_oracle.py
# (per-run DTYPE-RISK flag).
OUTPUT_DTYPE_WHITELIST = frozenset(
    {"int64", "int32", "float64", "string", "bool", "date", "timestamp"}
)


def output_dtype_risks(sdf_schema) -> list[str]:
    """Columns of a Spark result schema whose canonical dtype is outside
    OUTPUT_DTYPE_WHITELIST — flagged even when values match the oracle,
    because dtype-hash divergence is load-order/fetch-path dependent and
    a green local compare does not imply a green driver hash."""
    return [
        f"{f.name}:{canon_spark_dtype(f.dataType)}"
        for f in sdf_schema
        if canon_spark_dtype(f.dataType) not in OUTPUT_DTYPE_WHITELIST
    ]


def canon_spark_dtype(dt) -> str:
    """Spark DataType -> canonical dtype string (shared vocabulary with
    canon_arrow_type)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.LongType):
        return "int64"
    if isinstance(dt, T.IntegerType):
        return "int32"
    if isinstance(dt, T.ShortType):
        return "int16"
    if isinstance(dt, T.ByteType):
        return "int8"
    if isinstance(dt, T.DoubleType):
        return "float64"
    if isinstance(dt, T.FloatType):
        return "float32"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp"
    if isinstance(dt, T.TimestampType):
        # Session-TZ-aware — distinct from naive on purpose: a TZ-aware
        # Spark column against a naive DuckDB TIMESTAMP is exactly the
        # drift class the driver hash can fail on (repo invariant:
        # event timestamps stay TIMESTAMP_NTZ end to end).
        return "timestamp_tz"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"array<{canon_spark_dtype(dt.elementType)}>"
    if isinstance(dt, T.StructType):
        inner = ",".join(
            f"{f.name}:{canon_spark_dtype(f.dataType)}" for f in dt.fields
        )
        return f"struct<{inner}>"
    if isinstance(dt, T.MapType):
        return (
            f"map<{canon_spark_dtype(dt.keyType)},"
            f"{canon_spark_dtype(dt.valueType)}>"
        )
    return str(dt)


def canon_arrow_type(t) -> str:
    """pyarrow DataType -> the same canonical strings as
    canon_spark_dtype.  DuckDB HUGEINT arrives as decimal128(38,0)."""
    import pyarrow as pa

    if pa.types.is_int64(t):
        return "int64"
    if pa.types.is_int32(t):
        return "int32"
    if pa.types.is_int16(t):
        return "int16"
    if pa.types.is_int8(t):
        return "int8"
    if pa.types.is_float64(t):
        return "float64"
    if pa.types.is_float32(t):
        return "float32"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp_tz" if t.tz is not None else "timestamp"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"array<{canon_arrow_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{t.field(i).name}:{canon_arrow_type(t.field(i).type)}"
            for i in range(t.num_fields)
        )
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return (
            f"map<{canon_arrow_type(t.key_type)},"
            f"{canon_arrow_type(t.item_type)}>"
        )
    return str(t)


def dtype_drift(sdf_schema, arrow_schema) -> list[str]:
    """Per-column canonical-dtype mismatches between a Spark result
    schema and a DuckDB oracle's Arrow schema (matched by column name —
    the driver's compare sorts columns by name, so order never
    matters)."""
    spark_types = {f.name: canon_spark_dtype(f.dataType) for f in sdf_schema}
    drifts = []
    for field in arrow_schema:
        st = spark_types.get(field.name)
        at = canon_arrow_type(field.type)
        if st is not None and st != at:
            drifts.append(f"{field.name}: spark={st} duck={at}")
    return drifts
