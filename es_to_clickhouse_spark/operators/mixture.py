"""Deterministic source-mixture resampling (temperature sampling).

Training-data pipelines rebalance heterogeneous sources (web crawl vs
books vs code, or languages in a multilingual corpus) before training:
per-source sampling weights proportional to share^alpha with alpha < 1
flatten the source distribution (the multilingual "temperature" trick),
subject to a global token budget. The reference engine has no analog —
it moves documents verbatim — but any corpus it lands in a warehouse
eventually needs this step, so the engine provides it as a first-class
operator.

Everything here is a pure function of (data, alpha, budget_frac, salt):

- Per-source rates are computed in EXACT integer space (token sums are
  BIGINT; the sqrt weights are floored to parts-per-billion BIGINTs
  before normalizing) so that the only floating-point steps are single
  IEEE-754 operations (one sqrt, one divide, two multiplies) that every
  engine rounds identically — the rates agree bit-for-bit with a DuckDB
  replica of the same formula (oracle-checked in corpus/mixing.py).
- Row selection and replication key on md5 hashes (operators/sketch
  ``hash32``), so the SAME rows are kept/replicated on every engine,
  rerun, and reshard — reproducible mixture schedules, not Bernoulli
  noise.

At 100 TB: the rate table is one partial-aggregated pass over the weight
column (map-side combine down to ~n_sources rows), broadcast back; row
selection is a row-local predicate evaluated in the scan stage, and
replication fans out exactly ceil(rate) rows per input row — there is NO
shuffle on the data path at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from es_to_clickhouse_spark.operators.sketch import HASH_SPACE, hash32, hash_split


def temperature_rates(
    df: DataFrame,
    source_col: str,
    weight_col: str,
    alpha: float = 0.5,
    budget_frac: float = 1.0,
) -> DataFrame:
    """Per-source resampling rates for a temperature-flattened mixture.

    rate_s = budget * w_s / tok_s where w_s ∝ (tok_s / total)^alpha and
    budget = floor(budget_frac * total). rate < 1 means the source is
    over-represented at temperature alpha (downsample); rate > 1 means
    it is under-represented (upsample via :func:`epoch_replicate`).

    Returns a tiny DataFrame (one row per source): source_col, ``tok``
    (BIGINT weight total) and ``rate`` (double, uncapped).

    Determinism: token sums and the ppb-quantized weight normalizer are
    exact integers; the remaining float ops (sqrt — correctly rounded
    per IEEE-754, one divide, two multiplies, one final divide) are each
    single operations, so the result is bit-identical across engines
    evaluating the same formula shape.
    """
    tok = df.groupBy(source_col).agg(
        F.sum(F.col(weight_col)).cast("long").alias("tok")
    )
    tot = tok.agg(F.sum("tok").alias("all_tok"))
    w = tok.crossJoin(F.broadcast(tot))
    share = F.col("tok").cast("double") / F.col("all_tok").cast("double")
    wr = F.sqrt(share) if alpha == 0.5 else F.pow(share, F.lit(float(alpha)))
    w = w.withColumn("wr_ppb", F.floor(wr * F.lit(1e9)).cast("long"))
    norm = w.agg(F.sum("wr_ppb").alias("norm_ppb"))
    r = w.crossJoin(F.broadcast(norm))
    budget = F.floor(
        F.lit(float(budget_frac)) * F.col("all_tok").cast("double")
    ).cast("long")
    rate = (budget.cast("double") * F.col("wr_ppb").cast("double")) / (
        F.col("norm_ppb").cast("double") * F.col("tok").cast("double")
    )
    return r.select(source_col, "tok", rate.alias("rate"))


def mixture_sample(
    df: DataFrame,
    rates: DataFrame,
    source_col: str,
    key_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Downsample each source to min(rate, 1) by deterministic key hash.

    The rate table is broadcast (n_sources rows); the filter is a
    row-local predicate (hash32(key) < floor(rate * 2^32)) evaluated in
    the scan stage — no shuffle. Sources with rate >= 1 pass through
    unchanged (use :func:`epoch_replicate` to realize upsampling).
    """
    cut = F.floor(
        F.least(F.col("rate"), F.lit(1.0)) * F.lit(HASH_SPACE)
    ).cast("long")
    rr = rates.select(source_col, cut.alias("_cut"))
    j = df.join(F.broadcast(rr), source_col)
    return j.where(hash32(F.col(key_col), salt) < F.col("_cut")).drop("_cut")


def epoch_replicate(
    df: DataFrame,
    rates: DataFrame,
    source_col: str,
    key_col: str,
    salt: str = "mixup",
) -> DataFrame:
    """Realize fractional rates as deterministic replication ("epochs").

    Each row is emitted floor(rate) times in full epochs 0..floor(rate)-1,
    plus one extra copy (epoch = floor(rate)) iff a hash of
    (key, epoch) falls under the fractional remainder — the standard
    epoch-based upsampling schedule, made reproducible. rate < 1 reduces
    to plain downsampling (zero full epochs + fractional keep), so one
    operator realizes the whole mixture.

    Output carries an ``epoch`` column (BIGINT). Fan-out per input row is
    exactly ceil(rate) candidate rows — bounded by the replication the
    schedule itself demands, with no shuffle.
    """
    n_full = F.floor(F.col("rate")).cast("long")
    frac_cut = F.floor(
        (F.col("rate") - F.floor(F.col("rate"))) * F.lit(HASH_SPACE)
    ).cast("long")
    rr = rates.select(source_col, n_full.alias("_nf"), frac_cut.alias("_cut"))
    j = df.join(F.broadcast(rr), source_col)
    j = j.withColumn(
        "epoch", F.explode(F.sequence(F.lit(0).cast("long"), F.col("_nf")))
    )
    keyed = F.concat(
        F.col(key_col).cast("string"), F.lit("#"), F.col("epoch").cast("string")
    )
    return j.where(
        (F.col("epoch") < F.col("_nf")) | (hash32(keyed, salt) < F.col("_cut"))
    ).drop("_nf", "_cut")


def largest_remainder_allocation(
    weights: DataFrame,
    group_col: str,
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Integer token-budget apportionment by the largest-remainder
    (Hamilton) method: each group gets floor(budget * w_g / W) and the
    leftover budget - sum(floors) units go, one each, to the groups
    with the largest remainders (ties to the lowest group key). The
    allocation a mixing schedule actually EXECUTES must be integer —
    "13.7% of 2.1T tokens" is not a number a sampler can hit — and
    largest-remainder is the standard rule that keeps every group
    within one unit of its exact share while summing exactly to the
    budget.

    Pure integer arithmetic end to end (quota = budget*w div W,
    remainder = budget*w mod W), so the result is bit-identical on any
    engine and any rerun. The budget*weight product is computed in
    DECIMAL(38,0) — still exact integer math, but immune to int64
    wrap: with ppb weights (up to 1e9) a bigint product overflows past
    budget ~9.2e9 and, with ANSI off, wraps silently into negative
    quotas — i.e. exactly the advertised "13.7% of 2.1T tokens" domain
    (ADVICE r13). Two int64 operands can never overflow the decimal
    (max product 8.5e37 < 1e38); the int64 bound on each operand is
    asserted. All windows run over the WEIGHTS table — one row per
    group, never the data — so the cost is O(groups log groups)
    regardless of corpus size.

    Output: (group, weight, quota, extra, alloc) with sum(alloc) ==
    budget exactly."""
    from pyspark.sql.window import Window

    if not 0 <= budget < 2**63:
        raise ValueError(f"budget must fit int64, got {budget}")
    tot = weights.agg(F.sum(weight_col).alias("_W"))
    prod = f"(CAST({budget} AS DECIMAL(38,0)) * {weight_col})"
    base = weights.crossJoin(F.broadcast(tot)).select(
        F.col(group_col),
        F.col(weight_col),
        F.expr(f"{prod} div _W").alias("quota"),
        F.expr(f"{prod} % _W").alias("_rem"),
    )
    wq = Window.orderBy(F.col("_rem").desc(), F.col(group_col).asc())
    wall = Window.partitionBy()
    return (
        base.withColumn("_rk", F.row_number().over(wq))
        .withColumn("_left", F.lit(budget) - F.sum("quota").over(wall))
        .select(
            group_col,
            weight_col,
            "quota",
            F.when(F.col("_rk") <= F.col("_left"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("extra"),
        )
        .withColumn("alloc", F.col("quota") + F.col("extra"))
    )


def pareto_frontier_2d(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Rows on the 2-criteria Pareto frontier: keep a row unless some
    other row is STRICTLY better on both ``x_col`` and ``y_col``
    (integer columns). Curation pipelines use this to pick documents
    that trade off two quality axes (e.g. dedup-cleanliness vs length,
    quality score vs freshness) without collapsing them into one
    weighted scalar first.

    Scale shape — the naive formulation is an all-pairs dominance test
    (~N², or a single-partition global window, the Spark scale trap for
    ``ORDER BY`` with no ``PARTITION BY``). Here dominance is factored
    through the DISTINCT x values instead:

    1. ``max(y) per x`` — one map-side-combinable groupBy; the result
       has at most |distinct x| rows (bounded by the column's
       quantization, e.g. ppm scores → <= 1e6+1 rows, independent of N).
    2. suffix-max over x DESC on that SMALL frame — the only global
       window, over the bounded aggregate, never the data.
    3. broadcast the (x → best y at strictly greater x) map back; a row
       survives iff that threshold is NULL (no greater x exists) or
       <= its y. Row-local predicate, no data shuffle.

    Strictness on both axes means ties survive together (two rows with
    equal (x, y) are both on the frontier) — deterministic under
    resharding with no tiebreak needed."""
    per_x = df.groupBy(F.col(x_col).alias("_x")).agg(
        F.max(y_col).alias("_my")
    )
    # suffix-max of _my over strictly greater _x: integer RANGE frame
    # ending 1 before the current value excludes the current x group
    from pyspark.sql.window import Window

    w = (
        Window.orderBy(F.col("_x").desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    thresh = per_x.select(
        "_x", F.max("_my").over(w).alias("_dom_y")
    )
    return (
        df.join(
            F.broadcast(thresh), df[x_col] == thresh["_x"], "left"
        )
        .where(F.col("_dom_y").isNull() | (F.col("_dom_y") <= F.col(y_col)))
        .drop("_x", "_dom_y")
    )


def top_fraction_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    frac: float,
    tiebreak_col: str,
) -> DataFrame:
    """Keep the top ``frac`` of rows per group by ``order_col`` — the
    "top 20% quality per source" selection every curation pass runs
    before mixing. Exact and deterministic: the cut is
    ``rank <= ceil(frac * group_size)`` with rank ordered by
    (order_col DESC, tiebreak_col ASC), so reruns and reshards keep the
    SAME rows (never a float percent_rank, whose >=/&gt; boundary
    behavior differs between engines on ties).

    The cut itself is PURE INTEGER arithmetic: ``frac`` is first
    snapped to the nearest rational num/den with den <= 1e6
    (Fraction.limit_denominator — recovers the decimal the caller
    typed, e.g. 0.2 -> 1/5), then the predicate is
    ``rank <= (num * n + den - 1) div den``. Evaluating the documented
    ceil rule in float silently deviates on exactly-representable
    boundaries — frac=0.2, n=55 gives 0.2*55 = 11.000000000000002 in
    binary, so float-ceil keeps 12 rows where ceil(11) = 11 is the rule
    (ADVICE r13).

    One shuffle, partitioned by group: rank and group count share the
    same window partition, so the data moves once; groups process
    independently (no global sort), which is exactly the shape that
    scales — skewed sources are the usual caveat and they bound at the
    largest single group, same as any per-source statistic."""
    from fractions import Fraction

    from pyspark.sql.window import Window

    fr = Fraction(frac).limit_denominator(1_000_000)
    num, den = fr.numerator, fr.denominator
    wg = Window.partitionBy(group_col)
    wr = wg.orderBy(F.col(order_col).desc(), F.col(tiebreak_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(wr))
        .withColumn("_n", F.count(F.lit(1)).over(wg))
        .where(F.expr(f"_rk <= ({num}L * _n + {den - 1}) div {den}"))
        .drop("_rk", "_n")
    )


def cluster_safe_split(
    df: DataFrame,
    cluster_col: str,
    weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Train/val/test assignment keyed on a CLUSTER id, not the row id —
    the leakage guard for dedup-aware splits.

    Hashing the row key (``hash_split``) puts two near-identical
    documents on opposite sides of the train/test boundary whenever
    their ids hash differently — the held-out copy then "evaluates" the
    model on training data. Keying the same hash range on the duplicate-
    cluster id (content fingerprint, LSH cluster label, canonical doc of
    a near-dup group) makes split membership a pure function of the
    cluster, so a cluster's members land in ONE split by construction —
    under reshards, reruns, and incremental appends alike.

    Row-local (no shuffle): the cluster id is already a column, and the
    label is a hash of it. Pair with ``operators/dedup`` to derive the
    cluster column; any upstream choice of fingerprint granularity
    (exact md5, MinHash band, CC label) composes unchanged.
    """
    return df.withColumn(
        "split", hash_split(F.col(cluster_col), weights, salt=salt)
    )
