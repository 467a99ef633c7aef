"""ClickHouse/ByteHouse DDL generation (SURVEY S16-S18).

Pure string builders mirroring the reference's target DDL:

- wide ``Nullable(String)`` table + system columns ``_id``, optional
  ``_source``, ``_timestamp`` with defaults (es/es_to_bytehouse.py:300-336,
  mongodb/mongodb_to_bytehouse.py:363-394);
- ``ENGINE = CnchMergeTree() ORDER BY tuple() UNIQUE KEY _id`` upsert
  contract (es/es_to_bytehouse.py:329-334);
- passthrough DDL copying source column types verbatim
  (clickhouse/clickhouse_to_bytehouse.py:240-262);
- idempotent ``ALTER TABLE ADD COLUMN`` (es/es_to_bytehouse.py:1020-1041);
- Spark-type → ClickHouse-type map for typed targets (an engine extension;
  the reference maps everything to String, §1.2).

These strings feed the JDBC sink's DDL path; generation itself needs no
server, so it's fully unit-tested.
"""

from __future__ import annotations

from pyspark.sql import types as T

SPARK_TO_CLICKHOUSE = {
    T.StringType(): "String",
    T.BooleanType(): "UInt8",
    T.ByteType(): "Int8",
    T.ShortType(): "Int16",
    T.IntegerType(): "Int32",
    T.LongType(): "Int64",
    T.FloatType(): "Float32",
    T.DoubleType(): "Float64",
    T.DateType(): "Date",
    T.TimestampType(): "DateTime64(3)",
    T.BinaryType(): "String",
}


def clickhouse_type(dtype: T.DataType, nullable: bool = True) -> str:
    """Map a Spark type to ClickHouse; complex types serialize to String
    (the reference's universal rule, README.md:109)."""
    base = SPARK_TO_CLICKHOUSE.get(dtype, "String")
    if isinstance(dtype, (T.ArrayType, T.MapType, T.StructType)):
        base = "String"  # JSON-serialized, like the reference
    if isinstance(dtype, T.DecimalType):
        base = f"Decimal({dtype.precision}, {dtype.scale})"
    return f"Nullable({base})" if nullable else base


def quote_ident(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def create_database_sql(database: str) -> str:
    """CREATE DATABASE IF NOT EXISTS (es/es_to_bytehouse.py:401-410)."""
    return f"CREATE DATABASE IF NOT EXISTS {quote_ident(database)}"


def create_wide_string_table_sql(
    database: str,
    table: str,
    fields: list[str],
    engine: str = "MergeTree",
    unique_key: str | None = "_id",
    store_source: bool = False,
) -> str:
    """The reference's target DDL shape (es/es_to_bytehouse.py:300-336):
    every data field Nullable(String); system columns typed; upsert key.

    ``engine``: "CnchMergeTree" for ByteHouse, "ReplacingMergeTree" is the
    open-source ClickHouse upsert analog (UNIQUE KEY is ByteHouse-only,
    so for plain ClickHouse we emit ReplacingMergeTree(_timestamp)).
    """
    cols = ["`_id` String"]
    if store_source:
        cols.append("`_source` String")
    cols += [f"{quote_ident(f)} Nullable(String)" for f in sorted(fields)]
    cols.append("`_timestamp` DateTime64(3) DEFAULT now64(3)")
    body = ",\n  ".join(cols)
    if engine == "CnchMergeTree" and unique_key:
        tail = f"ENGINE = CnchMergeTree() ORDER BY tuple() UNIQUE KEY {quote_ident(unique_key)}"
    elif unique_key:
        tail = (
            f"ENGINE = ReplacingMergeTree(`_timestamp`) ORDER BY {quote_ident(unique_key)}"
        )
    else:
        tail = f"ENGINE = {engine}() ORDER BY tuple()"
    return (
        f"CREATE TABLE IF NOT EXISTS {quote_ident(database)}.{quote_ident(table)} (\n"
        f"  {body}\n) {tail}"
    )


def create_typed_table_sql(
    database: str, table: str, schema: T.StructType, engine: str = "MergeTree"
) -> str:
    """Typed passthrough DDL (clickhouse/clickhouse_to_bytehouse.py:240-262
    copies DESCRIBE verbatim; here the Spark schema is the source of truth)."""
    cols = ",\n  ".join(
        f"{quote_ident(f.name)} {clickhouse_type(f.dataType, f.nullable)}"
        for f in schema.fields
    )
    return (
        f"CREATE TABLE IF NOT EXISTS {quote_ident(database)}.{quote_ident(table)} (\n"
        f"  {cols}\n) ENGINE = {engine}() ORDER BY tuple()"
    )


def add_columns_sql(database: str, table: str, new_fields: list[str]) -> list[str]:
    """Idempotent column adds (es/es_to_bytehouse.py:1020-1041) — one
    statement per column, IF NOT EXISTS instead of swallowing errors."""
    return [
        f"ALTER TABLE {quote_ident(database)}.{quote_ident(table)} "
        f"ADD COLUMN IF NOT EXISTS {quote_ident(f)} Nullable(String)"
        for f in sorted(new_fields)
    ]
