"""Oracle type-parity gate.

Round-1 lesson: the local oracle compare canonicalized Decimal→float,
so a DuckDB ``SUM(<integer>)`` returning HUGEINT/DECIMAL(38,0) passed
locally but broke the driver's stricter value hash ("123.0" vs "123").
This test closes that class of bug forever: for every registered query
with an oracle, the DuckDB Arrow schema of the oracle SQL must map to
exactly the same canonical type as the Spark DataFrame schema, column
by column.
"""

from __future__ import annotations

import pyarrow as pa
import pytest
from pyspark.sql import types as T

from data_pipeline_2025_spark import registry

from .oracle import duckdb_connect

SPECS = registry.load_all()
WITH_ORACLE = sorted(n for n, s in SPECS.items() if s.oracle is not None)


def canon_spark(dt: T.DataType) -> str:
    if isinstance(dt, T.LongType):
        return "bigint"
    if isinstance(dt, T.IntegerType):
        return "int"
    if isinstance(dt, (T.ShortType, T.ByteType)):
        return "smallint"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.TimestampType):
        return "timestamp"
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.ArrayType):
        return f"array<{canon_spark(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return f"map<{canon_spark(dt.keyType)},{canon_spark(dt.valueType)}>"
    if isinstance(dt, T.StructType):
        inner = ",".join(
            f"{f.name}:{canon_spark(f.dataType)}" for f in dt.fields
        )
        return f"struct<{inner}>"
    return dt.simpleString()


def canon_arrow(t: pa.DataType) -> str:
    if pa.types.is_int64(t) or pa.types.is_uint64(t):
        return "bigint"
    if pa.types.is_int32(t) or pa.types.is_uint32(t):
        return "int"
    if (
        pa.types.is_int16(t)
        or pa.types.is_int8(t)
        or pa.types.is_uint16(t)
        or pa.types.is_uint8(t)
    ):
        return "smallint"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"array<{canon_arrow(t.value_type)}>"
    if pa.types.is_map(t):
        return f"map<{canon_arrow(t.key_type)},{canon_arrow(t.item_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{t.field(i).name}:{canon_arrow(t.field(i).type)}"
            for i in range(t.num_fields)
        )
        return f"struct<{inner}>"
    return str(t)


@pytest.fixture(scope="module")
def duck(sf_smoke):
    con = duckdb_connect(sf_smoke)
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_schema_matches_spark(name, spark, sf_smoke, duck):
    spec = SPECS[name]
    spark_schema = spec.spark_fn(spark, sf_smoke).schema
    spark_types = {f.name: canon_spark(f.dataType) for f in spark_schema.fields}

    # LIMIT 0 wrap: type inference without materializing rows.
    arrow = duck.execute(
        f"SELECT * FROM ({spec.oracle}) _typecheck LIMIT 0"
    ).arrow()
    oracle_types = {
        f.name: canon_arrow(f.type) for f in arrow.schema
    }

    assert spark_types == oracle_types, (
        f"{name}: type drift between Spark result and DuckDB oracle\n"
        f"  spark : {spark_types}\n"
        f"  oracle: {oracle_types}\n"
        "Fix the ORACLE SQL (CAST to the Spark type) or cast the Spark "
        "column — the driver hashes stringified values, and a DuckDB "
        "HUGEINT/DECIMAL where Spark emits BIGINT breaks the hash."
    )
