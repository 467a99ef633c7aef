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
    if by is not None:
        unioned = lefts.unionByName(rights)
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

    return _global_asof(lefts, rights, on, rcols, suffix, left_tag, num_buckets, left)


def _global_asof(
    lefts: DataFrame,
    rights: DataFrame,
    on: str,
    rcols: list[str],
    suffix: str,
    left_tag: int,
    num_buckets: int | None,
    cuts_source: DataFrame,
) -> DataFrame:
    """Range-bucketed global as-of (no equality key).

    Cut points are quantiles of `on` collected to the driver — bounded
    by num_buckets, never by data size. They are sampled from the LEFT
    side only: cut placement affects bucket balance, never correctness,
    and quantiling the left is a plain column-pruned scan while the
    union would recompute whatever upstream shuffle produced the right
    side. Bucket assignment is a pure function of the value, so ties in
    `on` always share a bucket and the strict/inclusive `_side`
    tie-break stays window-local.
    """
    spark = lefts.sparkSession
    n = num_buckets or max(spark.sparkContext.defaultParallelism, 4)
    # percentile_approx in a one-row aggregate (vectorized scan + codegen)
    # rather than DataFrame.approxQuantile, which detours through the
    # row-based RDD stats path — ~10x slower on wide scans.
    probs = F.array(*[F.lit(i / n) for i in range(1, n)])
    row = (
        cuts_source.select(_ordering_key(cuts_source, on).alias("_k"))
        .where(F.col("_k").isNotNull())
        .agg(F.percentile_approx("_k", probs, F.lit(1000)).alias("cuts"))
        .first()
    )
    cuts = sorted(set(row["cuts"] or []))

    def bucket_of(df: DataFrame):
        if not cuts:  # constant / all-null ordering column: single bucket
            return F.lit(0)
        arr = F.array(*[F.lit(float(c)) for c in cuts])
        k = _ordering_key(df, on)
        return F.size(F.filter(arr, lambda x: x <= k))

    unioned = lefts.unionByName(rights)
    b = unioned.withColumn("_bucket", bucket_of(unioned))

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

    # Carry-in = last right value of every PRIOR bucket. Aggregated from
    # the RIGHT side alone (left rows carry no right values), so this
    # branch shares the right side's upstream exchange with the union
    # branch instead of recomputing it; densified over the full bucket
    # domain 0..len(cuts) (driver-known) so left rows in buckets with no
    # right rows still find their carry row. The single-partition window
    # and the broadcast act on <= num_buckets+1 rows.
    rb = rights.withColumn("_bucket", bucket_of(rights))
    per_bucket = rb.groupBy("_bucket").agg(
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
    spine = spark.range(len(cuts) + 1).select(F.col("id").cast("int").alias("_bucket"))
    dense = spine.join(per_bucket.withColumn("_bucket", F.col("_bucket").cast("int")), "_bucket", "left")
    bw = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    carry = dense.select(
        "_bucket",
        *[
            F.last(F.col(f"_pb_{c}"), ignorenulls=True).over(bw).alias(f"_ci_{c}")
            for c in rcols
        ],
    )

    out = carried.join(
        F.broadcast(carry), carried["_bucket"].cast("int") == carry["_bucket"], "left"
    ).drop(carry["_bucket"])
    keep = [c for c in unioned.columns if c != "_side" and not c.startswith("_r_")]
    return out.where(F.col("_side") == F.lit(left_tag)).select(
        *[F.col(c) for c in keep],
        *[
            F.coalesce(F.col(f"_w_{c}"), F.col(f"_ci_{c}")).alias(f"{c}{suffix}")
            for c in rcols
        ],
    )
