"""Source catalog: table listing + pattern filtering (SURVEY S4/S8/S13, P10/P11).

The reference lists ES indices (`GET /_cat/indices/{pattern}`,
es/es_to_bytehouse.py:239-258), ClickHouse tables (`SHOW TABLES`,
clickhouse/clickhouse_to_bytehouse.py:226-233) and Mongo collections
(`list_collection_names()`, mongodb/mongodb_to_bytehouse.py:297-304), then
filters system objects and applies comma-separated glob patterns.

Here a "catalog" is anything that can enumerate named tables; the parquet
testbed catalog lists ``*.parquet`` under a directory. The glob/system
filters are shared, pure functions so every source behaves identically.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from es_to_clickhouse_spark.functions import is_system_name, match_names


@dataclass
class TableInfo:
    name: str
    path: str


class ParquetCatalog:
    """Catalog over a directory of ``<table>.parquet`` files/dirs — the
    testbed stand-in for ES/CH/Mongo catalogs."""

    def __init__(self, spark: SparkSession, root: str, dialect: str = "es"):
        self.spark = spark
        self.root = root
        self.dialect = dialect

    def list_tables(self, pattern: str | None = None) -> list[TableInfo]:
        names = sorted(
            f[: -len(".parquet")]
            for f in os.listdir(self.root)
            if f.endswith(".parquet")
        )
        # system-object filter (es/es_to_bytehouse.py:250-253,
        # mongodb/mongodb_to_bytehouse.py:303-304)
        names = [n for n in names if not is_system_name(n, self.dialect)]
        if pattern and pattern not in ("*", ""):
            names = match_names(names, pattern)
        return [TableInfo(n, os.path.join(self.root, f"{n}.parquet")) for n in names]

    def read(self, name: str) -> DataFrame:
        """mergeSchema=true: source batches may evolve their schema
        mid-stream (SURVEY S18); the union-of-file-schemas read is the
        declared ∪ sampled schema union (es/es_to_bytehouse.py:762-771)."""
        return self.spark.read.option("mergeSchema", "true").parquet(
            os.path.join(self.root, f"{name}.parquet")
        )

    def row_count(self, name: str) -> int:
        """Source row total for progress/ETA (SURVEY A3)."""
        return self.read(name).count()


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Convenience: read every testbed table into a dict of DataFrames."""
    cat = ParquetCatalog(spark, sf_dir)
    return {t.name: spark.read.parquet(t.path) for t in cat.list_tables()}


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every testbed table as a temp view; returns names."""
    names = []
    for t in ParquetCatalog(spark, sf_dir).list_tables():
        spark.read.parquet(t.path).createOrReplaceTempView(t.name)
        names.append(t.name)
    return names
