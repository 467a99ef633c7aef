"""Declared UDF surface (SURVEY §2.10).

The reference exposes no user-extension point; its nearest "UDFs" are
module functions (flatten_document, sanitize_table_name, fnmatch globs).
The engine's hot paths deliberately avoid Python UDFs — flattening is a
generated select, coercions are Column expressions — but SQL users still
need the reference's name/glob semantics callable from ``spark.sql``.
``register_engine_udfs`` publishes them:

- ``sanitize_field(name, dialect)`` / ``sanitize_table(name, dialect)`` —
  the exact reference naming rules (es/es_to_bytehouse.py:283-285,738-745;
  mongodb/mongodb_to_bytehouse.py:310-311).
- ``glob_match(name, patterns)`` — comma-separated fnmatch
  (clickhouse/clickhouse_to_bytehouse.py:83-98).
- ``is_system(name, dialect)`` — system-object filter.

These are driver/metadata-scale functions (catalog names, not data rows),
so plain Python UDFs are appropriate — they never sit in a 100 TB scan.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from es_to_clickhouse_spark.functions import (
    is_system_name,
    match_names,
    sanitize_field_name,
    sanitize_table_name,
)


def register_engine_udfs(spark: SparkSession) -> list[str]:
    """Register the engine's SQL-callable helpers; returns their names."""
    spark.udf.register(
        "sanitize_field",
        lambda name, dialect="es": sanitize_field_name(name or "", dialect or "es"),
        T.StringType(),
    )
    spark.udf.register(
        "sanitize_table",
        lambda name, dialect="es": sanitize_table_name(name or "", dialect or "es"),
        T.StringType(),
    )
    spark.udf.register(
        "glob_match",
        lambda name, patterns: bool(match_names([name or ""], patterns or "")),
        T.BooleanType(),
    )
    spark.udf.register(
        "is_system",
        lambda name, dialect="es": is_system_name(name or "", dialect or "es"),
        T.BooleanType(),
    )
    return ["sanitize_field", "sanitize_table", "glob_match", "is_system"]
