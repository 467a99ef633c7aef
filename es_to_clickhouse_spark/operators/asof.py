"""As-of join — a custom operator Spark lacks natively (SURVEY §2.3 note).

``asof_join(left, right, on, by, direction)``: for each left row, attach

- ``backward`` (default): the most recent right row with ``right.on <=
  left.on``;
- ``forward``: the earliest right row with ``right.on >= left.on``;
- ``nearest``: whichever of the two is closer in ``on`` (ties -> backward,
  matching pandas ``merge_asof``).

Implementation is the union-and-window technique (no Python in the data
path):

1. tag both sides and union them on (by, on);
2. a running ``last(right_cols, ignorenulls=True)`` (and/or ``first`` over
   the following frame) ordered by (on, side) carries the adjacent right
   values onto each left row — both directions share ONE sort;
3. filter back to left rows.

With a ``by`` key the window partitions on it — one shuffle, the same
price as the sort-merge join Spark would plan for a plain equi-join, and
strictly better than the naive range-join (which explodes to O(n*m)
pairs before aggregation). Skewed by-keys are handled by AQE.

Without a ``by`` key a naive global window would run on a SINGLE
partition — a non-starter at 100 TB. Instead the union is range-bucketed
on quantile cut points of the ordering column (the same driver-side
sampling Spark's RangePartitioner does for a global sort), the window
runs per-bucket in parallel, and a tiny per-bucket "carry" table
(B rows, broadcast) supplies the last right values from earlier buckets
(and/or the first right values from later buckets, for forward/nearest)
to left rows whose own bucket has no right row on the needed side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, DateType, TimestampNTZType, TimestampType
from pyspark.sql.window import Window

from es_to_clickhouse_spark.functions import upper_bound_index_sql

_DIRECTIONS = ("backward", "forward", "nearest")


def _key_expr(dt: DataType, col: Column) -> Column:
    """Monotonic numeric (double) view of an ordering value, used for
    quantile cut points and nearest-distance tests — these need order and
    differences, not exact values."""
    if isinstance(dt, DateType):
        return F.datediff(col, F.lit("1970-01-01")).cast("double")
    if isinstance(dt, TimestampNTZType):
        return F.unix_micros(col.cast("timestamp")).cast("double")
    if isinstance(dt, TimestampType):
        # exact integer micros (< 2^53, no float rounding) — nearest's
        # distance tie-break must match an integer-arithmetic oracle
        return F.unix_micros(col).cast("double")
    return col.cast("double")  # ints/floats/decimals


def _ordering_key(df: DataFrame, on: str) -> Column:
    return _key_expr(df.schema[on].dataType, F.col(on))


#: logical-plan operators whose recompute costs a shuffle or a sort —
#: the signal that a twice-referenced subtree is worth materializing
_EXPENSIVE_NODES = ("Aggregate", "Join", "Window", "Sort")


def _expensive_subtree(df: DataFrame) -> bool:
    """True when recomputing ``df`` would redo a shuffle-bearing operator
    (aggregate/join/window/sort). Reads the ANALYZED logical plan, which
    PySpark materializes eagerly at DataFrame creation — so this is a
    string scan, not a new optimizer pass (optimizedPlan() here cost
    ~0.3 s per call on a bench query). Pure scan/filter/project subtrees
    return False — with column pruning and pushdown those recompute for
    less than the cost of writing their rows to the block store. The
    analyzed plan can contain operators the optimizer would collapse
    (e.g. a pruned-away join); that false positive only costs an
    unnecessary cache of a cheap subtree, never a wrong result."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:  # noqa: BLE001 — any introspection failure → don't cache
        return False
    return any(node in plan for node in _EXPENSIVE_NODES)


def _side_tags(direction: str, strict: bool) -> tuple[int, int]:
    """(right_tag, left_tag): ordering of the two sides at equal ``on``.

    backward inclusive / forward strict want right rows BEFORE left rows
    (so equal-`on` rights land inside / outside the frame respectively);
    backward strict / forward inclusive want the reverse. nearest uses the
    backward-inclusive layout: an equal-`on` right matches backward at
    distance 0 and wins regardless.
    """
    if direction == "forward":
        return (1, 0) if not strict else (0, 1)
    return (0, 1) if not strict else (1, 0)


def _choose_nearest(
    dt: DataType, left_on: Column, bw: dict, fw: dict, on: str, c: str
) -> Column:
    """Pick backward vs forward value for one carried column by distance."""
    lk = _key_expr(dt, left_on)
    bw_on, fw_on = bw[on], fw[on]
    use_bw = fw_on.isNull() | (
        bw_on.isNotNull() & ((lk - _key_expr(dt, bw_on)) <= (_key_expr(dt, fw_on) - lk))
    )
    return F.when(use_bw, bw[c]).otherwise(fw[c])


def quantile_cuts(
    df: DataFrame, on: str, num_buckets: int | None = None, accuracy: int = 1000
) -> list[float]:
    """Driver-side quantile cut points of ``on`` (the same sampling
    Spark's RangePartitioner does for a global sort) — exposed so callers
    can PRECOMPUTE and CACHE them across invocations of the global as-of:
    cut placement affects only bucket balance, never correctness, so
    slightly-stale cuts are always safe and save one job per call.

    percentile_approx in a one-row aggregate (vectorized scan + codegen)
    rather than DataFrame.approxQuantile, which detours through the
    row-based RDD stats path — ~10x slower on wide scans."""
    spark = df.sparkSession
    n = num_buckets or max(spark.sparkContext.defaultParallelism, 4)
    probs = F.array(*[F.lit(i / n) for i in range(1, n)])
    row = (
        df.select(_ordering_key(df, on).alias("_k"))
        .where(F.col("_k").isNotNull())
        .agg(F.percentile_approx("_k", probs, F.lit(accuracy)).alias("cuts"))
        .first()
    )
    return sorted(set(row["cuts"] or []))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    strict: bool = False,
    num_buckets: int | None = None,
    direction: str = "backward",
    cuts: list[float] | None = None,
    cache_right: bool | None = None,
) -> DataFrame:
    """As-of join (backward / forward / nearest).

    Parameters
    ----------
    on: ordering column (time), present in both sides.
    by: optional equality key.
    right_cols: right columns to carry (default: all but on/by).
    strict: if True, exclude equal ``on`` matches (ignored for nearest).
    num_buckets: parallelism of the global (no ``by``) path; defaults to
        the cluster's default parallelism.
    direction: 'backward' (right.on <= left.on), 'forward' (>=), or
        'nearest' (closer of the two; ties -> backward).
    cuts: precomputed :func:`quantile_cuts` for the global path (skips
        the per-call quantile job; any cut list is correct).
    cache_right: global path only — ``persist()`` the right side (lazy
        cache; this operator never unpersists — the caller owns the
        unpersist, or LRU eviction handles it). The right side feeds BOTH
        the union window and the per-bucket carry aggregate, and Spark
        does not share common subtrees across the two branches, so an
        EXPENSIVE right side (a join/aggregation subtree) is otherwise
        computed twice. Default ``None`` = AUTO: persist exactly when the
        right side's optimized plan contains a shuffle-bearing operator
        (aggregate/join/window/sort — :func:`_expensive_subtree`); pure
        scan/filter/project right sides skip the cache, because with
        pushdown and pruning they recompute for less than materializing
        (measured: ~0.1 s loss caching a 2.5k-row aggregate locally).
        Pass True/False to override the heuristic. Unlike a
        ``localCheckpoint``, a persist keeps full lineage, so lost cached
        blocks recompute instead of failing the job.
    """
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}")
    rcols = right_cols or [c for c in right.columns if c not in {on, by}]
    # nearest needs the matched right `on` for its distance test
    carry = rcols + ([on] if direction == "nearest" else [])
    right_tag, left_tag = _side_tags(direction, strict)
    on_dt = left.schema[on].dataType

    lefts = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(left_tag).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in carry],
    )
    rights = right.select(
        *[
            (F.col(c) if c in {on, by} else F.lit(None).cast(left.schema[c].dataType))
            .alias(c)
            for c in left.columns
        ],
        F.lit(right_tag).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in carry],
    )
    if by is None:
        if cache_right is None:
            cache_right = _expensive_subtree(right)
        return _global_asof(
            lefts, rights, on, rcols, carry, suffix, left_tag, num_buckets,
            left, direction, on_dt, cuts, cache_right,
        )

    base = Window.partitionBy(by).orderBy(F.col(on).asc(), F.col("_side").asc())
    w_bw = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fw = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    unioned = lefts.unionByName(rights)
    exprs = []
    if direction in ("backward", "nearest"):
        exprs += [
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w_bw).alias(f"_bw_{c}")
            for c in carry
        ]
    if direction in ("forward", "nearest"):
        exprs += [
            F.first(F.col(f"_r_{c}"), ignorenulls=True).over(w_fw).alias(f"_fw_{c}")
            for c in carry
        ]
    carried = unioned.select("*", *exprs)

    if direction == "backward":
        out_cols = {c: F.col(f"_bw_{c}") for c in rcols}
    elif direction == "forward":
        out_cols = {c: F.col(f"_fw_{c}") for c in rcols}
    else:
        bw = {c: F.col(f"_bw_{c}") for c in carry}
        fw = {c: F.col(f"_fw_{c}") for c in carry}
        out_cols = {
            c: _choose_nearest(on_dt, F.col(on), bw, fw, on, c) for c in rcols
        }
    keep = [c for c in left.columns]
    return carried.where(F.col("_side") == F.lit(left_tag)).select(
        *[F.col(c) for c in keep],
        *[out_cols[c].alias(f"{c}{suffix}") for c in rcols],
    )


def _global_asof(
    lefts: DataFrame,
    rights: DataFrame,
    on: str,
    rcols: list[str],
    carry: list[str],
    suffix: str,
    left_tag: int,
    num_buckets: int | None,
    cuts_source: DataFrame,
    direction: str,
    on_dt: DataType,
    cuts: list[float] | None = None,
    cache_right: bool = False,
) -> DataFrame:
    """Range-bucketed global as-of (no equality key).

    Cut points are quantiles of `on` collected to the driver — bounded
    by num_buckets, never by data size. Unless precomputed ``cuts`` are
    passed in, they are sampled from the LEFT side only: cut placement
    affects bucket balance, never correctness, and quantiling the left
    is a plain column-pruned scan while the union would recompute
    whatever upstream shuffle produced the right side. Bucket assignment
    is a pure function of the value, so ties in `on` always share a
    bucket and the `_side` tie-break stays window-local.
    """
    spark = lefts.sparkSession
    if cuts is None:
        cuts = quantile_cuts(cuts_source, on, num_buckets)
    else:
        cuts = sorted(set(float(c) for c in cuts))

    if cache_right:
        # The right side feeds BOTH the union (per-bucket window) and the
        # carry-table aggregate below; Spark does not share common
        # subtrees across the two branches, so an expensive right subtree
        # would run twice. persist(): both branches resolve to the same
        # InMemoryRelation, so the subtree computes once and the cached
        # rows serve the second branch. Opt-in because for cheap right
        # sides the caching overhead exceeds the saved recompute; callers
        # own the unpersist (or let LRU eviction handle it — the right
        # side is the small index side by assumption).
        rights = rights.persist()

    # collision-free temp name (ADVICE r14): a caller column literally
    # named `_ub_k` would be silently overwritten by the projected key
    # and dropped — suffix until free instead of corrupting it.
    ub_key = "_ub_k"
    taken = set(lefts.columns) | set(rights.columns)
    while ub_key in taken:
        ub_key += "_"
    ub_sql = upper_bound_index_sql(cuts, f"`{ub_key}`")

    def with_bucket(df: DataFrame) -> DataFrame:
        """Attach the upper-bound index of the ordering value in the
        sorted cut list as ``_bucket`` — the binary-search CASE-WHEN
        tree parsed from ONE SQL string
        (:func:`functions.upper_bound_index_sql`) over a projected
        numeric key column. The Column-built form spent ~0.6 s of
        driver-side py4j round-trips PER as-of join constructing the
        same tree (r14 profile: three bucketize sites x ~570 calls);
        the parsed tree is identical, so results and per-row cost are
        unchanged. The HOF form ``F.size(F.filter(arr, lambda x:
        x <= k))`` crashes Spark 4's Union.rewriteConstraints when this
        union sits under the carry-table join (regression test in
        tests/test_asof_ddl_sources.py)."""
        if not cuts:  # constant / all-null ordering column: single bucket
            return df.withColumn("_bucket", F.lit(0))
        return (
            df.withColumn(ub_key, _ordering_key(df, on))
            .withColumn("_bucket", F.expr(ub_sql))
            .drop(ub_key)
        )

    b = with_bucket(lefts).unionByName(with_bucket(rights))

    base = Window.partitionBy("_bucket").orderBy(
        F.col(on).asc(), F.col("_side").asc()
    )
    w_bw = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fw = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    exprs = []
    if direction in ("backward", "nearest"):
        exprs += [
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w_bw).alias(f"_wbw_{c}")
            for c in carry
        ]
    if direction in ("forward", "nearest"):
        exprs += [
            F.first(F.col(f"_r_{c}"), ignorenulls=True).over(w_fw).alias(f"_wfw_{c}")
            for c in carry
        ]
    carried = b.select("*", *exprs)

    # Per-bucket carry rows: last right value of every PRIOR bucket
    # (backward) and/or first right value of every LATER bucket (forward).
    # Aggregated from the RIGHT side alone, densified over the driver-known
    # bucket domain so left rows in right-empty buckets still find their
    # carry. The single-partition window and the broadcast act on
    # <= num_buckets+1 rows.
    rb = with_bucket(rights)
    aggs = []
    if direction in ("backward", "nearest"):
        aggs += [
            F.max_by(
                F.col(f"_r_{c}"),
                F.when(
                    F.col(f"_r_{c}").isNotNull(), F.struct(F.col(on), F.col("_side"))
                ),
            ).alias(f"_pbl_{c}")
            for c in carry
        ]
    if direction in ("forward", "nearest"):
        aggs += [
            F.min_by(
                F.col(f"_r_{c}"),
                F.when(
                    F.col(f"_r_{c}").isNotNull(), F.struct(F.col(on), F.col("_side"))
                ),
            ).alias(f"_pbf_{c}")
            for c in carry
        ]
    per_bucket = rb.groupBy("_bucket").agg(*aggs)
    spine = spark.range(len(cuts) + 1).select(F.col("id").cast("int").alias("_bucket"))
    dense = spine.join(
        per_bucket.withColumn("_bucket", F.col("_bucket").cast("int")), "_bucket", "left"
    )
    bw_frame = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    fw_frame = Window.orderBy("_bucket").rowsBetween(1, Window.unboundedFollowing)
    carry_exprs = ["_bucket"]
    if direction in ("backward", "nearest"):
        carry_exprs += [
            F.last(F.col(f"_pbl_{c}"), ignorenulls=True).over(bw_frame).alias(f"_cibw_{c}")
            for c in carry
        ]
    if direction in ("forward", "nearest"):
        carry_exprs += [
            F.first(F.col(f"_pbf_{c}"), ignorenulls=True).over(fw_frame).alias(f"_cifw_{c}")
            for c in carry
        ]
    carry_tbl = dense.select(*carry_exprs)

    out = carried.join(
        F.broadcast(carry_tbl),
        carried["_bucket"].cast("int") == carry_tbl["_bucket"],
        "left",
    ).drop(carry_tbl["_bucket"])
    keep = [
        c
        for c in lefts.columns
        if c != "_side" and not c.startswith("_r_")
    ]
    if direction == "backward":
        vals = {c: F.coalesce(F.col(f"_wbw_{c}"), F.col(f"_cibw_{c}")) for c in rcols}
    elif direction == "forward":
        vals = {c: F.coalesce(F.col(f"_wfw_{c}"), F.col(f"_cifw_{c}")) for c in rcols}
    else:
        bw = {c: F.coalesce(F.col(f"_wbw_{c}"), F.col(f"_cibw_{c}")) for c in carry}
        fw = {c: F.coalesce(F.col(f"_wfw_{c}"), F.col(f"_cifw_{c}")) for c in carry}
        vals = {c: _choose_nearest(on_dt, F.col(on), bw, fw, on, c) for c in rcols}
    return out.where(F.col("_side") == F.lit(left_tag)).select(
        *[F.col(c) for c in keep],
        *[vals[c].alias(f"{c}{suffix}") for c in rcols],
    )
