"""Range (point-in-interval) join — Spark has no native range-join
strategy, so ``p.t BETWEEN i.s AND i.e`` plans as a
BroadcastNestedLoopJoin (or a cartesian product): O(n*m) comparisons,
a non-starter at 100 TB.

This operator rewrites the range join as an EQUI-join Catalyst can hash:

1. pick a bucket width w on the ordering domain;
2. points get bucket floor(t/w); intervals explode to every bucket they
   overlap (``sequence(floor(s/w), floor(e/w))`` — pure JVM expression);
3. hash-join on the bucket key, then apply the exact BETWEEN as a
   residual filter.

Cost: one shuffle on the bucket key; the pair blowup is bounded by
interval_span/w per interval instead of |points|. Long intervals (span >
``long_threshold`` buckets) would explode too far, so they take a
separate path: broadcast (they're few, by assumption — the classic
skew split) or a hard runtime error when the caller guarantees none.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampNTZType


def _numeric(df: DataFrame, col: str) -> Column:
    """Monotonic double view of a temporal/numeric column (seconds for
    timestamps, days->seconds for dates), shared with operators/asof.py."""
    dt = df.schema[col].dataType
    if isinstance(dt, DateType):
        return F.datediff(F.col(col), F.lit("1970-01-01")).cast("double") * 86400.0
    if isinstance(dt, TimestampNTZType):
        return F.col(col).cast("timestamp").cast("double")
    return F.col(col).cast("double")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    width: float,
    long_threshold: int = 64,
    long_strategy: str = "broadcast",
) -> DataFrame:
    """Inner join every point row to every interval row with
    ``start <= point <= end`` (inclusive both ends).

    Parameters
    ----------
    width: bucket width in the ordering domain's numeric units (seconds
        for timestamp/date columns). Tune to the typical interval span:
        pairs examined per interval ~ span/width + 1.
    long_threshold: intervals spanning more than this many buckets leave
        the explode path.
    long_strategy: 'broadcast' joins long intervals via broadcast (valid
        when they are rare); 'error' raises at runtime if any exist
        (keeps the plan free of nested-loop joins when the caller knows
        the span bound).
    """
    pb = points.withColumn("_b", F.floor(_numeric(points, point_col) / width))
    ik = intervals.withColumn("_sb", F.floor(_numeric(intervals, start_col) / width)).withColumn(
        "_eb", F.floor(_numeric(intervals, end_col) / width)
    )
    span_ok = (F.col("_eb") - F.col("_sb")) < F.lit(long_threshold)

    between = (F.col(point_col) >= F.col(start_col)) & (
        F.col(point_col) <= F.col(end_col)
    )

    if long_strategy == "error":
        # assert_true is NULL on pass -> the filter keeps every row while
        # forcing the span check to stay in the physical plan
        short = ik.where(
            F.assert_true(
                span_ok, f"range_join: interval spans >= {long_threshold} buckets"
            ).isNull()
        )
        long_part = None
    else:
        short = ik.where(span_ok)
        long_part = ik.where(~span_ok)

    exploded = short.withColumn("_b", F.explode(F.sequence("_sb", "_eb")))
    out = pb.join(exploded, "_b").where(between).drop("_b", "_sb", "_eb")

    if long_part is not None:
        wide = pb.drop("_b").join(
            F.broadcast(long_part.drop("_sb", "_eb")), between
        )
        out = out.unionByName(wide)
    return out


def interval_coverage(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    granularity: str = "day",
    out_col: str = "n_covering",
    cuts: list[float] | None = None,
) -> DataFrame:
    """Count, for every point, how many intervals cover it — WITHOUT
    materializing point-interval pairs (range_join would produce
    O(sum of interval spans) rows before aggregating).

    Sweep-line as dataframes: every interval contributes +1 at its start
    boundary and -1 one granule after its end; aggregating deltas per
    boundary reduces the data to the boundary domain (bounded by the time
    domain, not the row count), a cumulative window over the boundaries
    yields the running coverage, and a global as-of join (operators/asof)
    assigns each point the coverage at the greatest boundary <= point.
    Points covered by zero intervals are dropped (inner-join semantics,
    matching SELECT ... JOIN ON p BETWEEN s AND e GROUP BY p).

    Interval ends are inclusive; boundaries are truncated to
    ``granularity``, so points are expected at that granularity too.

    ``cuts``: precomputed :func:`operators.asof.quantile_cuts` over the
    truncated point column, passed through to the global as-of join —
    without them every invocation pays one driver quantile job to
    sample cut points that are pure table statistics (any cut list is
    correct; placement only affects bucket balance). Callers that run
    repeatedly over the same point domain should compute once and
    cache, the same contract as ``asof_join(cuts=...)``.
    """
    from pyspark.sql.window import Window

    from es_to_clickhouse_spark.operators.asof import asof_join

    starts = intervals.select(
        F.date_trunc(granularity, F.col(start_col)).alias("_bd"),
        F.lit(1).alias("_delta"),
    )
    ends = intervals.select(
        F.date_trunc(
            granularity, F.col(end_col) + F.expr(f"INTERVAL 1 {granularity}")
        ).alias("_bd"),
        F.lit(-1).alias("_delta"),
    )
    deltas = starts.unionByName(ends).groupBy("_bd").agg(
        F.sum("_delta").alias("_d")
    )
    # the boundary domain is small (time-domain-bounded); the running sum
    # is a single-partition window over it, never over the interval rows
    run = deltas.select(
        "_bd",
        F.sum("_d")
        .over(Window.orderBy("_bd").rowsBetween(Window.unboundedPreceding, 0))
        .alias(out_col),
    )
    pts = points.withColumn("_bd", F.date_trunc(granularity, F.col(point_col)))
    looked = asof_join(
        pts, run, on="_bd", right_cols=[out_col], suffix="", cuts=cuts
    )
    return looked.where(F.col(out_col) > 0).drop("_bd")
