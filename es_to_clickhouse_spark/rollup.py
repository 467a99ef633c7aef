"""Incremental rollup maintenance (continuous aggregates).

The reference replicates raw rows and leaves aggregation to the target
warehouse; at 100 TB the standard practice is a maintained ROLLUP table
(daily/hourly grains) refreshed per micro-batch — recomputing the whole
aggregate every round would re-scan the full history for data that
didn't change.

Shape (the TimescaleDB/Materialize "continuous aggregate" pattern,
re-expressed in Spark terms):

1. the new micro-batch aggregates to MERGEABLE partial state
   (sum/count/min/max — avg is derived sum/count at read time, never
   stored, because stored averages don't merge);
2. only the grain partitions the batch TOUCHES are read back, merged
   (union + re-aggregate), and rewritten via dynamic partition
   overwrite — untouched partitions are not read, not written, not
   listed;
3. the rollup table is Hive-partitioned on the leading grain column,
   so point/range queries prune to partitions and the overwrite is
   atomic per partition.

Delivery contract: merging the same batch twice double-counts (the
partials are additive), so the caller feeds EXACTLY-ONCE batches —
the engine's watermark predicates (incremental.py) provide precisely
that stream; for at-least-once sources, dedup first (sink.upsert_view).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from es_to_clickhouse_spark import fsio

#: partial-state suffixes a rollup row carries per value column
PARTIALS = ("sum", "cnt", "min", "max")


def batch_partials(
    batch: DataFrame, grain_cols: list[str], value_col: str
) -> DataFrame:
    """Aggregate a micro-batch to mergeable partial state per grain."""
    return batch.groupBy(*grain_cols).agg(
        F.sum(value_col).alias("v_sum"),
        F.count(value_col).alias("v_cnt"),
        F.min(value_col).alias("v_min"),
        F.max(value_col).alias("v_max"),
    )


def _merge(parts: DataFrame, grain_cols: list[str]) -> DataFrame:
    """Merge partial-state rows that share a grain (associative)."""
    return parts.groupBy(*grain_cols).agg(
        F.sum("v_sum").alias("v_sum"),
        F.sum("v_cnt").alias("v_cnt"),
        F.min("v_min").alias("v_min"),
        F.max("v_max").alias("v_max"),
    )


def refresh_rollup(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    grain_cols: list[str],
    value_col: str,
) -> int:
    """Merge one micro-batch into the rollup at ``path``; returns the
    number of grain partitions touched. Only touched partitions of the
    leading grain column are read (partition-pruned via an IN filter on
    driver-collected touched keys — bounded by the batch's distinct
    grains, not table size) and rewritten (dynamic partition
    overwrite)."""
    new = batch_partials(batch, grain_cols, value_col)
    lead = grain_cols[0]
    touched = [r[0] for r in new.select(lead).distinct().collect()]
    if not touched:
        return 0  # empty batch: write nothing (idle-round no-op)
    merged = new
    if fsio.exists(spark, path):
        # Hive partition-value inference may read the leading grain back
        # as date/int; cast to the batch's type so merges stay
        # schema-stable round after round. A NULL grain lands in (and
        # reads back from) the __HIVE_DEFAULT_PARTITION__ directory as
        # NULL — isin() never matches NULL, so it needs its own isNull
        # arm or the dynamic overwrite would replace that partition with
        # only the new batch's partials, losing prior state.
        non_null = [v for v in touched if v is not None]
        cond = (
            F.col(lead).isin(non_null) if non_null else F.lit(False)
        )
        if len(non_null) < len(touched):
            cond = cond | F.col(lead).isNull()
        old = (
            spark.read.parquet(path)
            .withColumn(lead, F.col(lead).cast(new.schema[lead].dataType))
            .where(cond)
        )
        merged = _merge(old.unionByName(new), grain_cols)
    # dynamic overwrite: ONLY the partitions present in `merged` are
    # replaced; every other partition's files are untouched
    (
        merged.repartition(*[F.col(c) for c in grain_cols])
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(lead)
        .parquet(path)
    )
    return len(touched)


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    """The query view over the rollup: derived avg alongside the raw
    mergeable state (avg computed at read time — stored averages can't
    merge)."""
    df = spark.read.parquet(path)
    return df.withColumn("v_avg", F.col("v_sum") / F.col("v_cnt"))
