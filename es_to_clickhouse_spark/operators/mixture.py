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
