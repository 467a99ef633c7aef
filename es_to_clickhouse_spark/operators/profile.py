"""Column profiling: null/distinct/min/max per column in ONE pass.

The data-quality step every ingestion pipeline runs before training: a
single full-scan aggregate computes every column's metrics together
(map-side combinable — the scan cost is paid once, not per column), then a
stack() projection reshapes the 1-row wide result to a row per column.
The reference has no profiling; its nearest analog is the sampled schema
scan (es/es_to_bytehouse.py:338-395), which reads 5,000 docs per index to
discover fields but records no statistics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column metrics: (column_name, n_nulls, n_distinct, min_s, max_s).

    min/max are rendered as strings so heterogeneous column types share
    one output schema (the profile of a 3000-column table is still one
    tiny frame).
    """
    aggs = []
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"_{c}_nulls"),
            F.countDistinct(c).alias(f"_{c}_distinct"),
            F.min(c).cast("string").alias(f"_{c}_min"),
            F.max(c).cast("string").alias(f"_{c}_max"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _{c}_nulls, _{c}_distinct, _{c}_min, _{c}_max" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) "
            "AS (column_name, n_nulls, n_distinct, min_s, max_s)"
        )
    )


def category_drift(
    df_a: DataFrame, df_b: DataFrame, col: str
) -> DataFrame:
    """KL divergence KL(P_a || P_b) over a categorical column — the
    distribution-drift check between two ingestion batches (or train vs
    serving data). Categories absent from either side are excluded (KL is
    undefined at q=0); the category count is reported so a disjoint-support
    drift is visible.

    Both frequency tables are tiny aggregates; totals come from a window
    over those aggregates (5-row frames — no second scan), and the final
    sum is a single-row reduce.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy()
    a = df_a.groupBy(col).agg(F.count(F.lit(1)).alias("_na"))
    a = a.withColumn("_pa", F.col("_na") / F.sum("_na").over(w))
    b = df_b.groupBy(col).agg(F.count(F.lit(1)).alias("_nb"))
    b = b.withColumn("_pb", F.col("_nb") / F.sum("_nb").over(w))
    joined = a.join(b, col)
    return joined.agg(
        F.count(F.lit(1)).alias("n_categories"),
        F.sum(F.col("_pa") * F.ln(F.col("_pa") / F.col("_pb"))).alias("kl"),
    )
