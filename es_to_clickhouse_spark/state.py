"""Watermark / checkpoint state: the ``_sync_state`` table (SURVEY T2, §1.1).

The reference persists one append-only state table per pipeline and reads
the latest row per source table:

- ES schema: index_name, table_name, time_field, update_time_field,
  last_sync_time, last_update_time, last_sync_count, updated_at
  (es/es_to_bytehouse.py:412-432); read = ``ORDER BY updated_at DESC
  LIMIT 1`` per index (:434-452); write = append (:454-465).
- CH schema: table_name, last_sync_time, last_update_time, sync_count,
  sync_time (clickhouse/clickhouse_to_bytehouse.py:159-203); read = max().
- Mongo schema: table_name, last_sync_time, last_id, sync_count, sync_time
  (mongodb/mongodb_to_bytehouse.py:218-262).

Here the state lives as an append-only parquet table inside the target
warehouse — same queryability, and the append-only + latest-wins design
means state commits are cheap blind appends at any scale (no read-modify-
write). Latest-row reads use a window (`row_number() = 1`), the Spark
expression of the reference's ORDER BY … DESC LIMIT 1.

Watermarks are kept as *strings* in the table for reference parity
(lexicographic ISO compare — es/es_to_bytehouse.py:912,918) but the engine
compares typed values internally (SURVEY §7.4 risk 3).
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from es_to_clickhouse_spark import fsio

STATE_SCHEMA = T.StructType(
    [
        T.StructField("table_name", T.StringType()),
        T.StructField("source_name", T.StringType()),
        T.StructField("time_field", T.StringType()),
        T.StructField("update_time_field", T.StringType()),
        T.StructField("last_sync_time", T.StringType()),
        T.StructField("last_update_time", T.StringType()),
        T.StructField("last_id", T.StringType()),
        T.StructField("last_sync_count", T.LongType()),
        T.StructField("updated_at", T.TimestampType()),
    ]
)


@dataclass
class SyncState:
    table_name: str
    source_name: str | None = None
    time_field: str | None = None
    update_time_field: str | None = None
    last_sync_time: str | None = None
    last_update_time: str | None = None
    last_id: str | None = None
    last_sync_count: int = 0


class StateStore:
    """Append-only ``_sync_state`` parquet table under the warehouse root."""

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        # Hadoop-FS IO (fsio) so the warehouse root can be any URI
        # (file:// hdfs:// s3a://) — never driver-local os.* calls.
        self.path = fsio.join(warehouse, "_sync_state")
        fsio.mkdirs(spark, warehouse)

    def _exists(self) -> bool:
        return fsio.has_glob(self.spark, fsio.join(self.path, "*.parquet"))

    def read_all(self):
        if not self._exists():
            return self.spark.createDataFrame([], STATE_SCHEMA)
        return self.spark.read.schema(STATE_SCHEMA).parquet(self.path)

    def latest(self):
        """Latest state row per table (ORDER BY updated_at DESC LIMIT 1
        per key — es/es_to_bytehouse.py:437-440)."""
        w = Window.partitionBy("table_name").orderBy(F.desc("updated_at"))
        return (
            self.read_all()
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    def get(self, table_name: str) -> SyncState | None:
        rows = self.latest().where(F.col("table_name") == table_name).collect()
        if not rows:
            return None
        r = rows[0]
        return SyncState(
            table_name=r.table_name,
            source_name=r.source_name,
            time_field=r.time_field,
            update_time_field=r.update_time_field,
            last_sync_time=r.last_sync_time,
            last_update_time=r.last_update_time,
            last_id=r.last_id,
            last_sync_count=r.last_sync_count or 0,
        )

    def has_synced_before(self, table_name: str) -> bool:
        """Auto-mode probe (mongodb/mongodb_to_bytehouse.py:285-295)."""
        return (
            self.read_all().where(F.col("table_name") == table_name).limit(1).count()
            > 0
        )

    def commit(self, state: SyncState) -> None:
        """Append one watermark row (es/es_to_bytehouse.py:454-465). Blind
        append — no shuffle, no read — so commits stay O(1) at scale."""
        row = Row(
            table_name=state.table_name,
            source_name=state.source_name,
            time_field=state.time_field,
            update_time_field=state.update_time_field,
            last_sync_time=state.last_sync_time,
            last_update_time=state.last_update_time,
            last_id=state.last_id,
            last_sync_count=state.last_sync_count,
            updated_at=datetime.now(timezone.utc).replace(tzinfo=None),
        )
        df = self.spark.createDataFrame([row], STATE_SCHEMA).coalesce(1)
        # unique filename per commit via uuid inside a single-file append
        df.write.mode("append").parquet(self.path)

    def status(self, limit: int = 10):
        """`--mode status` inspection: most recent commits first
        (clickhouse/clickhouse_to_bytehouse.py:205-224)."""
        return self.read_all().orderBy(F.desc("updated_at")).limit(limit)


def new_run_id() -> str:
    return uuid.uuid4().hex[:12]
