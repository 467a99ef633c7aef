"""Globally-ordered computations without a single-partition window.

``Window.orderBy(...)`` with no partition key funnels the whole table
through ONE task — the canonical Spark scale-killer for running totals,
global ranks, and sequence packing. The operators here get identical
semantics from the two-phase shape every distributed engine uses:

1. assign every row a **bucket id that is a pure function of its order
   key** (sampled split points collected once to the driver and baked
   into the plan as literals, binary-search CASE tree) so bucket *i*
   holds a contiguous key range below bucket *i+1*;
2. a per-bucket window (parallel across all buckets);
3. per-bucket totals — a map-side-combining aggregate producing at most
   ``num_buckets`` rows — collected to the driver and turned into
   prefix offsets added map-side.

Why NOT ``repartitionByRange`` + ``spark_partition_id()`` (the shape a
first draft used): the totals aggregate and the caller's eventual
action on the returned DataFrame are SEPARATE query executions, and
exchanges are not reused across executions — each one re-runs the
range shuffle, whose split points come from a fresh reservoir sample.
Two executions can therefore assign the same row DIFFERENT partition
ids, silently corrupting the running sums (or indexing past the offset
array). Freezing the split points on the driver and computing the
bucket id from row values makes every execution agree by construction
— no persist/checkpoint needed, recompute- and failure-safe at any
scale. As a bonus the totals job no longer needs the full-data
shuffle at all: it partial-aggregates straight off the source scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _key_struct(order_cols: list[str]) -> Column:
    return F.struct(*[F.col(c) for c in order_cols])


def _lit_struct(values, order_cols: list[str], dtypes: dict) -> Column:
    """A struct literal comparable to ``_key_struct`` — every field cast
    to the source column's exact type (a collected int may round-trip as
    a Python int and come back as a LongType literal against an
    IntegerType column; struct comparison wants matching field types)."""
    return F.struct(
        *[
            F.lit(v).cast(dtypes[c]).alias(c)
            for v, c in zip(values, order_cols)
        ]
    )


def _bucket_expr(
    order_cols: list[str], bounds: list[tuple], dtypes: dict
) -> Column:
    """Count of split points strictly below the row's key — the bucket
    index — as a binary-search tree of nested CASE WHENs over struct
    comparisons (lexicographic, same as ``orderBy`` on the columns).
    log2(len(bounds)) comparisons per row, all codegen'd JVM-side.

    Monotone by construction: key1 <= key2 implies bucket(key1) <=
    bucket(key2), which is the only property the prefix-offset math
    needs. Rows whose key contains a NULL compare as falsy against
    every bound and land in bucket 0 — consistent with Spark's
    ascending nulls-first sort (bounds never contain NULLs; the sampler
    drops them).
    """
    if not bounds:
        return F.lit(0)
    key = _key_struct(order_cols)

    def build(lo: int, hi: int) -> Column:
        # invariant: the answer lies in [lo, hi]
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(
            key > _lit_struct(bounds[mid], order_cols, dtypes),
            build(mid + 1, hi),
        ).otherwise(build(lo, mid))

    return build(0, len(bounds))


def _split_points(
    df: DataFrame, order_cols: list[str], n: int
) -> list[tuple]:
    """~``n - 1`` split points from a deterministic uniform sample of
    the order key, RangePartitioner-style but reproducible: rank rows
    by a hash of the key and take the smallest ``n * 20`` — a
    TakeOrderedAndProject job (per-task bounded heap, no full sort, no
    count() pre-pass), scanning only the order columns. Duplicate and
    NULL-bearing keys are dropped from the bounds; heavy skew therefore
    degrades parallelism (equal keys share a bucket — unavoidable under
    the total-order contract), never correctness."""
    k = max(n * 20, 100)
    sample = (
        df.select(*order_cols)
        .orderBy(F.hash(*[F.col(c) for c in order_cols]).asc(), *order_cols)
        .limit(k)
        .collect()
    )
    def _usable(v) -> bool:
        # exclude NULLs AND NaNs from bounds: Python's sorted() scrambles
        # on NaN (all comparisons False) which would break the bounds'
        # monotonicity. Row-side semantics stay correct without them:
        # NULL keys compare falsy against every bound -> bucket 0
        # (nulls-first), NaN keys compare greater than every bound
        # (Spark orders NaN last) -> last bucket.
        if v is None:
            return False
        return not (isinstance(v, float) and v != v)

    keys = sorted(
        {
            tuple(r[c] for c in order_cols)
            for r in sample
            if all(_usable(r[c]) for c in order_cols)
        }
    )
    if len(keys) <= 1:
        return []
    # n - 1 evenly spaced split points over the sorted sample
    step = len(keys) / n
    bounds, prev = [], None
    for i in range(1, n):
        cand = keys[min(int(step * i), len(keys) - 1)]
        if cand != prev:
            bounds.append(cand)
            prev = cand
    return bounds


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
    column): equal keys may straddle a bucket boundary only if the
    sample put a split point exactly between duplicates — the bucket
    expression sends ALL duplicates of a key to the same bucket (strict
    ``>`` against the bound), so a non-total order is still summed
    consistently within Spark's window tie semantics, but "running"
    would be ambiguous as ever. NULLs in ``val_col`` contribute 0 and
    keep their row.

    Deterministic across query executions: the bucket id of a row
    depends only on its key and the driver-frozen split points, so the
    totals job and the caller's later action agree on every row's
    bucket even though they are separate executions (see module
    docstring for why ``spark_partition_id`` after ``repartitionByRange``
    does NOT have that property).
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    # Materialize the input ONCE (r15, guide §5): three separate query
    # executions read `df` — the split-point sample, the per-bucket
    # totals collect, and the caller's eventual action — and exchanges
    # are not reused across executions, so an expensive upstream (pk1:
    # the full-corpus tokenize) ran once per execution. The checkpoint
    # rows are (order_cols, val_col)-sized — for a running sum that is
    # a few longs per row at any corpus size — so the storage cost is
    # trivial next to re-running the upstream twice. Lazy: the sample
    # job below is the first materializer.
    df = df.localCheckpoint(eager=False)
    bounds = _split_points(df, order_cols, n)
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    part = df.withColumn("_pid", _bucket_expr(order_cols, bounds, dtypes))
    order = [F.col(c) for c in order_cols]
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    summed = part.withColumn(
        "_psum", F.sum(F.coalesce(F.col(val_col), F.lit(0))).over(w)
    )
    # per-bucket totals: a map-side-combining aggregate straight off the
    # source scan (bucket count rows shuffled, not the data), collected
    # to the driver. Deterministic: _pid is a pure function of the row.
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
    # offset lookup as a literal array indexed by bucket id — one
    # element per bucket, evaluated map-side with zero extra shuffle
    arr = F.array(*[F.lit(o) for o in offsets])
    return (
        summed.withColumn(
            out_col, F.col("_psum") + F.element_at(arr, F.col("_pid") + 1)
        )
        .drop("_pid", "_psum")
    )


def merge_intervals(
    df: DataFrame,
    key_cols: list[str],
    start_col: str = "s",
    end_col: str = "e",
) -> DataFrame:
    """Merge overlapping/touching [start, end) intervals per key into
    maximal disjoint spans — the gaps-and-islands sweep: an interval
    opens a new island iff its start exceeds the running max end of
    every EARLIER interval (ordered by start, ties by end). Returns one
    row per merged span: (*key_cols, s, e, n_members).

    Two doc-keyed windows over ONE sort (prev-max-end, then the island
    running sum) — no self-join, no recursion; the classic O(n log n)
    sweep as a Catalyst plan. Used by d16's duplicated-span coverage;
    also the session-merge / calendar-overlap primitive."""
    w_prev = (
        Window.partitionBy(*key_cols)
        .orderBy(start_col, end_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(*key_cols)
        .orderBy(start_col, end_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sweep = df.withColumn("_prev_e", F.max(F.col(end_col)).over(w_prev))
    isl = sweep.withColumn(
        "_island",
        F.sum(
            F.when(
                F.col("_prev_e").isNull()
                | (F.col(start_col) > F.col("_prev_e")),
                1,
            ).otherwise(0)
        ).over(w_run),
    )
    return isl.groupBy(*key_cols, "_island").agg(
        F.min(start_col).alias(start_col),
        F.max(end_col).alias(end_col),
        F.count(F.lit(1)).alias("n_members"),
    ).drop("_island")
