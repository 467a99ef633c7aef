"""Time-series resampling and gap filling (hypertable-rollup family).

The reference moves event streams between stores but cannot answer "hourly
rollup with empty buckets materialized and values carried forward" — the
shape every monitoring/feature-pipeline consumer asks of an events table.
Expressed Spark-first:

- resample: date_trunc to the bucket + groupBy().agg() — one shuffle,
  map-side partial aggregation.
- gap_fill: per-key bucket spine via sequence()/explode (the spine is
  |keys| * |buckets| rows — generated, never shuffled), left join of the
  aggregated frame (same key partitioning reused), then forward fill with
  last(ignorenulls) over (key ORDER BY bucket). At 100 TB the window
  partitions by key, so state per task is one key's bucket range, not the
  table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def resample(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    aggs: Sequence[Column],
    bucket: str = "hour",
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """Aggregate rows into fixed time buckets per key (date_trunc granularity:
    'hour', 'day', 'week', ...)."""
    return (
        df.withColumn(bucket_col, F.date_trunc(bucket, F.col(ts_col)))
        .groupBy(*key_cols, bucket_col)
        .agg(*aggs)
    )


def gap_fill(
    bucketed: DataFrame,
    bucket_col: str,
    key_cols: Sequence[str],
    step: str = "1 hour",
    fill_zero: Sequence[str] = (),
    fill_forward: Sequence[str] = (),
) -> DataFrame:
    """Materialize missing buckets per key between each key's min and max
    bucket; ``fill_zero`` columns get 0 in gap rows (counts), ``fill_forward``
    columns carry the last non-null value (levels/gauges)."""
    keys = list(key_cols)
    spine = (
        bucketed.groupBy(*keys)
        .agg(F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi"))
        .select(
            *keys,
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.expr(f"interval {step}"))
            ).alias(bucket_col),
        )
    )
    out = spine.join(bucketed, on=[*keys, bucket_col], how="left")
    for c in fill_zero:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    if fill_forward:
        w = (
            Window.partitionBy(*keys)
            .orderBy(bucket_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for c in fill_forward:
            out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out
