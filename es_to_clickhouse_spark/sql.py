"""SQL gateway: run ANSI SQL directly against the warehouse tables.

The engine's operators are DataFrame-first, but a reference user's existing
SQL should run as-is: ``register_views`` maps every parquet table under a
directory into the session catalog (temp views — metadata only, no data
movement), and ``run_sql`` executes a query through Catalyst with every
optimization (pushdown, pruning, join reordering, AQE) applied to the
declarative text.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from es_to_clickhouse_spark.corpus import t as _read_table


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> list[str]:
    """Create a temp view per ``<sf_dir>/<name>.parquet``; returns the view
    names. Views are lazy — a query touching one table scans one table."""
    names = []
    for f in sorted(os.listdir(sf_dir)):
        if not f.endswith(".parquet"):
            continue
        name = prefix + f[: -len(".parquet")]
        _read_table(spark, sf_dir, f[: -len(".parquet")]).createOrReplaceTempView(name)
        names.append(name)
    return names


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register the directory's tables and run one SQL query against them."""
    register_views(spark, sf_dir)
    return spark.sql(query)
