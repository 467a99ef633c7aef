"""Globally-ordered computations without a single-partition window.

``Window.orderBy(...)`` with no partition key funnels the whole table
through ONE task — the canonical Spark scale-killer for running totals,
global ranks, and sequence packing. The operators here get identical
semantics from the two-phase shape every distributed engine uses:

1. ``repartitionByRange`` on the order columns (the same sampled range
   partitioning Spark's global ``orderBy`` uses) so partition *i* holds
   a contiguous key range below partition *i+1*;
2. a per-partition window (parallel across all partitions);
3. per-partition totals — at most ``numPartitions`` rows — collected to
   the driver and turned into prefix offsets added map-side.

Job 2 (the totals aggregate) shares job 1's shuffle files: both read
the same repartitioned RDD lineage, and Spark skips already-computed
shuffle map stages, so the data is shuffled once, not twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    val_col: str,
    out_col: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact cumulative sum of ``val_col`` over the GLOBAL order given by
    ``order_cols`` — parallel, never a one-partition window.

    ``order_cols`` must be a total order (include a unique tiebreak
    column): range partitioning may split equal keys across partition
    boundaries, and a non-total order would make "running" ambiguous
    there. NULLs in ``val_col`` contribute 0 and keep their row.
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    order = [F.col(c) for c in order_cols]
    part = (
        df.repartitionByRange(n, *order)
        .withColumn("_pid", F.spark_partition_id())
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    summed = part.withColumn(
        "_psum", F.sum(F.coalesce(F.col(val_col), F.lit(0))).over(w)
    )
    # per-partition totals: <= n rows to the driver; this job reuses the
    # shuffle files of the repartitionByRange above (same lineage), so
    # the source is scanned/shuffled once
    totals = {
        r["_pid"]: r["_t"]
        for r in part.groupBy("_pid")
        .agg(F.sum(F.coalesce(F.col(val_col), F.lit(0))).alias("_t"))
        .collect()
    }
    max_pid = max(totals, default=-1)
    offsets, acc = [], 0
    for pid in range(max_pid + 1):
        offsets.append(acc)
        acc += totals.get(pid, 0) or 0
    if not offsets:  # empty input: no rows will read the array anyway
        offsets = [0]
    # offset lookup as a literal array indexed by partition id — one
    # element per partition, evaluated map-side with zero extra shuffle
    arr = F.array(*[F.lit(o) for o in offsets])
    return (
        summed.withColumn(
            out_col, F.col("_psum") + F.element_at(arr, F.col("_pid") + 1)
        )
        .drop("_pid", "_psum")
    )
