"""Deterministic approximate sketches: KMV distinct-count, hash sampling,
hash-range dataset splits.

The reference pipeline sizes syncs with exact counts; an analytics engine
at 100 TB also needs cheap cardinality estimates and *reproducible*
sampling (a training pipeline must be able to regenerate the exact same
train/val/test split years later). Spark's builtin approx_count_distinct
(HLL++) is fine operationally but not engine-reproducible, so it can't be
oracle-checked; these sketches are built on a uniform md5-derived 32-bit
hash that DuckDB computes bit-for-bit identically:

    Spark  conv(substring(md5(x), 1, 8), 16, 10)
    DuckDB ('0x' || substr(md5(x), 1, 8))::BIGINT

Scale design:
- KMV keeps only the k smallest distinct hash values per group. The
  distinct is a map-side-combinable hash aggregate; the k-smallest
  selection is TWO-LEVEL (k per (group, salt) slice, then k per group) so
  no single task ever sorts a whole group — a billion-distinct group
  reduces to fanout*k rows before the final selection.
- Sampling/splits are stateless row-local filters: no shuffle, pushed
  into the scan's projection, identical on every engine and every rerun.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

HASH_SPACE = float(1 << 32)


def hash32(col: Column, salt: str = "") -> Column:
    """Uniform hash in [0, 2^32) — first 8 hex chars of md5, engine-stable.

    ``salt`` decorrelates independent uses (a sample drawn with one salt
    is independent of a split drawn with another).
    """
    keyed = F.concat(F.lit(salt), col.cast("string")) if salt else col.cast("string")
    return F.conv(F.substring(F.md5(keyed), 1, 8), 16, 10).cast("long")


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    fanout: int = 8,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """KMV (k-minimum-values) distinct-count estimate per group.

    estimate = (k-1) * 2^32 / kth_smallest_hash, or the exact count when
    fewer than k distinct values exist. Standard error ~ 1/sqrt(k-2).
    Deterministic: same data -> same estimate, on Spark or DuckDB.
    """
    hashed = df.select(
        *group_cols, hash32(F.col(value_col)).alias("_hv")
    ).dropDuplicates([*group_cols, "_hv"])

    # Level 1: k smallest per (group, salt) slice — bounds every sort task
    # to its slice; level 2 then picks k from <= fanout*k survivors.
    salted = hashed.withColumn("_salt", F.col("_hv") % fanout)
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy("_hv")
    lvl1 = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )
    w2 = Window.partitionBy(*group_cols).orderBy("_hv")
    lvl2 = lvl1.withColumn("_rn", F.row_number().over(w2)).where(F.col("_rn") <= k)

    agg = lvl2.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n"), F.max("_hv").alias("_kth")
    )
    est = F.when(F.col("_n") < k, F.col("_n").cast("double")).otherwise(
        F.lit((k - 1) * HASH_SPACE) / F.col("_kth")
    )
    return agg.select(
        *group_cols, F.floor(est).cast("long").alias(out_col)
    )


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 8,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Deterministic HyperLogLog distinct-count estimate per group.

    Classic HLL (Flajolet et al. 2007) over the engine-stable 32-bit hash:
    register = top ``p`` hash bits, rho = leading-zero count of the low
    ``32-p`` bits + 1, estimate = alpha_m * m^2 / sum(2^-max_rho). Unlike
    Spark's builtin approx_count_distinct (HLL++, JVM-internal hashing)
    every arithmetic step here is chosen to be bit-reproducible on any
    engine:

    - bit_length via ``length(bin(w))`` (exact integer op, no float log2);
    - 2^-rho as ``1.0 / (1 << rho)`` (exact powers of two — their sum is
      EXACT in a double because all m <= 256 terms fit in 33 bits of
      significand span, so the register sum is order-independent);
    - alpha_m * m^2 pre-folded to one double literal (`ALPHA_MM`).

    No bias/linear-counting correction branch: it would need ln(), whose
    last-ulp behavior differs across libm implementations. Raw-HLL error
    (~1.04/sqrt(m) ≈ 6.5% at p=8) is documented instead of silently
    corrected. Two shuffles, both map-side combinable: (group, register)
    max, then per-group sum over <= m rows.
    """
    m = 1 << p
    low = 32 - p
    alpha_mm = 0.7213 / (1.0 + 1.079 / m) * m * m
    hv = hash32(F.col(value_col))
    w = hv.bitwiseAND((1 << low) - 1)
    rho = F.when(w == 0, F.lit(low + 1)).otherwise(
        F.lit(low + 1) - F.length(F.bin(w))
    )
    regs = (
        df.select(*group_cols, F.shiftright(hv, low).alias("_reg"), rho.alias("_rho"))
        .groupBy(*group_cols, "_reg")
        .agg(F.max("_rho").alias("_maxrho"))
    )
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.lit(1.0) / F.expr("shiftleft(1L, _maxrho)")).alias("_s"),
    )
    est = F.floor(
        F.lit(alpha_mm) / (F.col("_s") + (F.lit(float(m)) - F.col("_n")))
    )
    return agg.select(*group_cols, est.cast("long").alias(out_col))


def bottom_k_rows(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    k: int,
    salt: str = "qsk",
    fanout: int = 8,
) -> DataFrame:
    """The ``k`` rows with the smallest keyed hash per group, with the
    hash exposed as ``_qh`` — a deterministic uniform row sample whose
    defining property is MERGEABILITY: bottom-k of a union equals
    bottom-k of the per-part bottom-k's, exactly. That makes it the
    quantile partial for incremental rollups (rollup.py): estimates
    from the merged sample are bit-identical to a full recompute.

    Two-level selection like kmv_distinct — k per (group, hash-slice)
    first, then k of <= fanout*k survivors — so no task ever sorts a
    whole group. ``key_col`` should uniquely identify rows (it is the
    sampling unit and the tie-break)."""
    hashed = df.withColumn("_qh", hash32(F.col(key_col), salt))
    w1 = Window.partitionBy(*group_cols, F.col("_qh") % fanout).orderBy(
        "_qh", key_col
    )
    lvl1 = (
        hashed.withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
    w2 = Window.partitionBy(*group_cols).orderBy("_qh", key_col)
    return (
        lvl1.withColumn("_rn", F.row_number().over(w2))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int,
    salt: str = "wsmp",
    fanout: int = 8,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (top-n).

    A-ES (Efraimidis-Spirakis via exponential clocks): each row draws
    u = (hash+0.5)/2^32 from its key and scores -ln(u)/weight; the n
    smallest scores are the sample. Inclusion probability is proportional
    to weight; the draw is a pure function of (key, salt) so the sample is
    reproducible across runs and engines.

    Scale: the global top-n runs TWO-LEVEL like kmv_distinct — n per hash
    slice first, then n of <= fanout*n survivors — so no task ever sorts
    the full dataset.
    """
    u = (hash32(F.col(key_col), salt).cast("double") + F.lit(0.5)) / F.lit(HASH_SPACE)
    score = -F.ln(u) / F.col(weight_col)
    scored = df.withColumn("_score", score).withColumn(
        "_slice", hash32(F.col(key_col), salt + "2") % fanout
    )
    w1 = Window.partitionBy("_slice").orderBy("_score", key_col)
    lvl1 = (
        scored.withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= n)
        .drop("_rn", "_slice")
    )
    w2 = Window.partitionBy().orderBy("_score", key_col)
    return (
        lvl1.withColumn("_rn", F.row_number().over(w2))
        .where(F.col("_rn") <= n)
        .drop("_rn", "_score")
    )


def hash_sample(df: DataFrame, key_col: str, fraction: float, salt: str = "smp") -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose key hashes
    below fraction * 2^32. Reproducible across runs/engines (unlike
    df.sample), consistent for equal keys, and a pure row-local filter —
    no shuffle, evaluated inside the scan stage."""
    return df.where(hash32(F.col(key_col), salt) < int(fraction * HASH_SPACE))


def hash_split(
    key: Column, weights: dict[str, float], salt: str = "split"
) -> Column:
    """Assign each key a split label ('train'/'val'/'test', ...) by hash
    range. Weights must sum to ~1; boundaries are cumulative. The label is
    a pure function of the key, so membership is stable under reshards,
    reruns, and incremental appends — the property that matters for
    leakage-free train/test separation."""
    hv = hash32(key, salt)
    expr = None
    cum = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        cum += w
        cond = hv < int(cum * HASH_SPACE)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    return (F.lit(last) if expr is None else expr.otherwise(F.lit(last))).alias("split")


def stratified_sample(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    n_per_group: int,
    salt: str = "strat",
) -> DataFrame:
    """Deterministic fixed-size sample per stratum: the n rows with the
    smallest key hash in each group (hash order = uniform random order,
    but reproducible and append-stable for the retained set's prefix
    property). One shuffle on the group key; sampleBy() by contrast is
    probabilistic (binomial sizes) and non-reproducible across reruns."""
    w = Window.partitionBy(*group_cols).orderBy(
        hash32(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_per_group)
        .drop("_rn")
    )
