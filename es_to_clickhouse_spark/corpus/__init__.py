"""Query corpus: the `queries()` / `oracle_sql()` surface for the driver.

Each entry re-expresses one operator row from SURVEY §2 (names carry the
inventory IDs: s* scans, p* projections/filters, j* joins, a* aggregations,
w* windows, o* sorts/limits, st* set ops, f* scalar functions, t* streaming
semantics) plus the LLM-pipeline extensions (d* dedup, sim* similarity,
txt* text analysis, mm* multimodal).

Contract (from /root/repo/__spark_entry__.py): every Spark query and its
DuckDB oracle must produce identical column NAMES and values; the driver
hashes values order-insensitively after sorting columns by name. So:
- every computed column is aliased identically on both sides;
- timestamps are rendered to second-precision strings on both sides;
- doubles from aggregates are rounded on both sides;
- LIMIT queries carry a total order (unique tiebreak column).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, sql: str | None = None):
    """Register a corpus query; ``sql`` is the DuckDB oracle (None → the
    driver's weaker rows-only check, used for genuinely non-SQL ops)."""

    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a testbed table. The events table stores TIMESTAMP(NANOS),
    which Spark 4 rejects by default — read nanos as long and convert
    (floor-truncate to micros, matching DuckDB's ns→µs truncation)."""
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_all() -> None:
    """Import every corpus module (side effect: registration)."""
    from es_to_clickhouse_spark.corpus import (  # noqa: F401
        behavior,
        core,
        llm,
        mixing,
        pipeline,
        quality,
        relational,
        sketch,
        streaming,
        tpch,
    )


def all_queries():
    load_all()
    return dict(QUERIES)


def all_oracles():
    load_all()
    return dict(ORACLES)
