"""As-of join — a custom operator Spark lacks natively (SURVEY §2.3 note).

``asof_join(left, right, on, by)``: for each left row, attach the most
recent right row with ``right.on <= left.on`` (within the same ``by`` key).

Implementation is the union-and-window technique (no Python in the data
path):

1. tag both sides and union them on (by, on);
2. window ``last(right_cols, ignorenulls=True)`` ordered by (on, side)
   carries the latest right values forward onto each left row;
3. filter back to left rows.

With a ``by`` key the window partitions on it — one shuffle, the same
price as the sort-merge join Spark would plan for a plain equi-join, and
strictly better than the naive range-join (which explodes to O(n*m)
pairs before aggregation). Skewed by-keys are handled by AQE.

Without a ``by`` key a naive global window would run on a SINGLE
partition — a non-starter at 100 TB. Instead the union is range-bucketed
on quantile cut points of the ordering column (the same driver-side
sampling Spark's RangePartitioner does for a global sort), the window
runs per-bucket in parallel, and a tiny per-bucket "carry-in" table
(B rows, broadcast) supplies the last right values from earlier buckets
to left rows that precede every right row in their own bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampNTZType
from pyspark.sql.window import Window


def _ordering_key(df: DataFrame, on: str):
    """Monotonic numeric (double) view of the ordering column, used only
    for quantile cut points — buckets need order, not exact values."""
    dt = df.schema[on].dataType
    if isinstance(dt, DateType):
        return F.datediff(F.col(on), F.lit("1970-01-01")).cast("double")
    if isinstance(dt, TimestampNTZType):
        return F.col(on).cast("timestamp").cast("double")
    return F.col(on).cast("double")  # ints/floats/decimals/timestamps


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    strict: bool = False,
    num_buckets: int | None = None,
) -> DataFrame:
    """Backward as-of join.

    Parameters
    ----------
    on: ordering column (time), present in both sides.
    by: optional equality key.
    right_cols: right columns to carry (default: all but on/by).
    strict: if True, match ``right.on < left.on`` (exclusive).
    num_buckets: parallelism of the global (no ``by``) path; defaults to
        the cluster's default parallelism.
    """
    rcols = right_cols or [c for c in right.columns if c not in {on, by}]
    # side ordering: right rows sort BEFORE left rows at the same `on`
    # for inclusive (<=) semantics, AFTER for strict (<).
    right_tag, left_tag = (0, 1) if not strict else (1, 0)

    lefts = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(left_tag).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in rcols],
    )
    rights = right.select(
        *[
            (F.col(c) if c in {on, by} else F.lit(None).cast(left.schema[c].dataType))
            .alias(c)
            for c in left.columns
        ],
        F.lit(right_tag).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
    )
    unioned = lefts.unionByName(rights)

    if by is not None:
        w = (
            Window.partitionBy(by)
            .orderBy(F.col(on).asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = unioned.select(
            "*",
            *[
                F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
                for c in rcols
            ],
        )
        return carried.where(F.col("_side") == F.lit(left_tag)).drop(
            "_side", *[f"_r_{c}" for c in rcols]
        )

    return _global_asof(unioned, on, rcols, suffix, left_tag, num_buckets)


def _global_asof(
    unioned: DataFrame,
    on: str,
    rcols: list[str],
    suffix: str,
    left_tag: int,
    num_buckets: int | None,
) -> DataFrame:
    """Range-bucketed global as-of (no equality key).

    Cut points are exact-ish quantiles of `on` (one column-pruned pass,
    collected to the driver — bounded by num_buckets, never by data
    size). Bucket assignment is a pure function of the value, so ties in
    `on` always share a bucket and the strict/inclusive `_side`
    tie-break stays window-local.
    """
    spark = unioned.sparkSession
    n = num_buckets or max(spark.sparkContext.defaultParallelism, 4)
    keyed = unioned.withColumn("_k", _ordering_key(unioned, on))
    cuts = keyed.where(F.col("_k").isNotNull()).approxQuantile(
        "_k", [i / n for i in range(1, n)], 0.001
    )
    cuts = sorted(set(cuts))
    if cuts:
        arr = F.array(*[F.lit(float(c)) for c in cuts])
        bucket = F.size(F.filter(arr, lambda x: x <= F.col("_k")))
    else:  # constant / all-null ordering column: degenerate single bucket
        bucket = F.lit(0)
    b = keyed.withColumn("_bucket", bucket).drop("_k")

    w = (
        Window.partitionBy("_bucket")
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = b.select(
        "*",
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_w_{c}")
            for c in rcols
        ],
    )

    # Per-bucket last non-null right value (agg), then "last among all
    # PRIOR buckets" via a window over the B-row result. B = num_buckets,
    # so the single-partition window and the broadcast are both trivial.
    per_bucket = b.groupBy("_bucket").agg(
        *[
            F.max_by(
                F.col(f"_r_{c}"),
                F.when(
                    F.col(f"_r_{c}").isNotNull(),
                    F.struct(F.col(on), F.col("_side")),
                ),
            ).alias(f"_pb_{c}")
            for c in rcols
        ]
    )
    bw = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    carry = per_bucket.select(
        "_bucket",
        *[
            F.last(F.col(f"_pb_{c}"), ignorenulls=True).over(bw).alias(f"_ci_{c}")
            for c in rcols
        ],
    )

    out = carried.join(F.broadcast(carry), "_bucket", "left")
    keep = [c for c in unioned.columns if c != "_side" and not c.startswith("_r_")]
    return out.where(F.col("_side") == F.lit(left_tag)).select(
        *[F.col(c) for c in keep],
        *[
            F.coalesce(F.col(f"_w_{c}"), F.col(f"_ci_{c}")).alias(f"{c}{suffix}")
            for c in rcols
        ],
    )
