"""Target writer: DDL, schema evolution, upsert materialization (SURVEY S14-S19).

The reference writes to ByteHouse via batched INSERTs into a wide
``Nullable(String)`` table with ``UNIQUE KEY _id`` upsert
(es/es_to_bytehouse.py:300-336, 675-736) and evolves the target with
``ALTER TABLE ADD COLUMN`` when new fields appear
(es/es_to_bytehouse.py:1020-1051).

Spark-first, the target is a warehouse table (parquet directory here; the
same interface backs a JDBC/ClickHouse writer):

- **Schema evolution** is a driver-side diff of ``df.schema`` vs the live
  target schema; new columns append naturally because reads go through
  ``mergeSchema`` — the parquet analog of ADD COLUMN, with no table rewrite
  (constant-time at 100 TB).
- **Upsert** (UNIQUE KEY _id) is materialized at read time as a
  last-write-wins window over ``_id`` — the Spark expression of
  CnchMergeTree's merge-on-read. Appends stay shuffle-free; the dedup cost
  is paid only by readers that need merged state, exactly like MergeTree.
- **Projection onto the live column set** (missing → NULL, extras kept via
  evolution) mirrors es/es_to_bytehouse.py:681-688.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ID_COL = "_id"
TS_COL = "_timestamp"
SOURCE_COL = "_source"


class WarehouseTarget:
    """A directory-of-parquet-tables target with evolution + upsert reads."""

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    # -- catalog / DDL ------------------------------------------------

    def table_path(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def table_exists(self, table: str) -> bool:
        p = self.table_path(table)
        return os.path.isdir(p) and (
            any(f.endswith(".parquet") for f in os.listdir(p))
            or os.path.exists(os.path.join(p, "_schema.json"))
        )

    def create_table(self, table: str, columns: list[str]) -> None:
        """CREATE TABLE analog (es/es_to_bytehouse.py:300-336): records the
        declared wide-String schema; data files carry it physically."""
        os.makedirs(self.table_path(table), exist_ok=True)
        self._write_schema(table, sorted(set(columns)))

    def live_columns(self, table: str) -> set[str]:
        """DESCRIBE-driven column cache analog (es/es_to_bytehouse.py:1008-1018)."""
        meta = os.path.join(self.table_path(table), "_schema.json")
        if os.path.exists(meta):
            with open(meta) as f:
                return set(json.load(f)["columns"])
        if self.table_exists(table):
            return set(self.read(table, dedup=False).columns)
        return set()

    def _write_schema(self, table: str, columns: list[str]) -> None:
        meta = os.path.join(self.table_path(table), "_schema.json")
        with open(meta, "w") as f:
            json.dump({"columns": sorted(columns)}, f)

    def add_new_columns(self, table: str, new_cols: set[str]) -> int:
        """ALTER TABLE ADD COLUMN analog, idempotent
        (es/es_to_bytehouse.py:1020-1041)."""
        live = self.live_columns(table)
        added = sorted(new_cols - live)
        if added:
            self._write_schema(table, sorted(live | new_cols))
        return len(added)

    # -- write path ---------------------------------------------------

    def append(self, table: str, df: DataFrame, add_system_cols: bool = True) -> None:
        """Append a micro-batch with pre-write schema evolution
        (replaces the reference's insert→fail→ALTER→retry loop at
        es/es_to_bytehouse.py:693-736 with a proactive diff)."""
        if add_system_cols and TS_COL not in df.columns:
            df = df.withColumn(TS_COL, F.current_timestamp())
        if not self.table_exists(table):
            self.create_table(table, df.columns)
        else:
            self.add_new_columns(table, set(df.columns))
        live = self.live_columns(table)
        # project onto the live column set: missing → NULL
        # (es/es_to_bytehouse.py:681-688)
        select = [
            (F.col(f"`{c}`") if c in df.columns else F.lit(None).cast("string")).alias(c)
            for c in sorted(live)
        ]
        df.select(*select).write.mode("append").option(
            "mergeSchema", "true"
        ).parquet(self.table_path(table))

    # -- read path ----------------------------------------------------

    def read(self, table: str, dedup: bool = True) -> DataFrame:
        """Read the target; ``dedup=True`` applies the UNIQUE KEY _id
        last-write-wins merge (es/es_to_bytehouse.py:329-334)."""
        df = self.spark.read.option("mergeSchema", "true").parquet(
            self.table_path(table)
        )
        if dedup and ID_COL in df.columns and TS_COL in df.columns:
            df = upsert_view(df, ID_COL, TS_COL)
        return df

    def max_of(self, table: str, column: str):
        """SELECT max(col) watermark seed (es/es_to_bytehouse.py:1115-1131),
        guarded by the NULL/empty filter (P9)."""
        df = self.read(table, dedup=False)
        if column not in df.columns:
            return None
        row = (
            df.where(F.col(column).isNotNull() & (F.col(column).cast("string") != ""))
            .agg(F.max(column).alias("m"))
            .collect()[0]
        )
        return row.m


def upsert_view(df: DataFrame, key: str = ID_COL, version: str = TS_COL) -> DataFrame:
    """Last-write-wins dedup by key: the Spark materialization of
    CnchMergeTree ``UNIQUE KEY _id`` upsert (es/es_to_bytehouse.py:334).

    One shuffle on the key; AQE handles skewed keys. Ties on the version
    column break deterministically (arbitrary but stable monotonic id) so
    re-runs yield identical results.
    """
    w = Window.partitionBy(key).orderBy(
        F.desc(version), F.desc(F.monotonically_increasing_id())
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
