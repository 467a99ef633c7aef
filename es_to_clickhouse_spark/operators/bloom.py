"""Deterministic Bloom runtime filter — explicit semi-join pre-filtering.

The scale problem: ``big.join(small, key, "semi")`` shuffles EVERY big
row to the join even though almost none survive. Spark's own runtime
row-level filters cover only some plan shapes; this operator makes the
pattern explicit and engine-portable:

1. build a compact Bloom bitmap over the small side's keys (driver
   collects ``~m/62`` longs — a few KB for millions of keys);
2. bake the bitmap into the big side's plan as a LITERAL array tested
   map-side (``element_at`` + bit mask, pure codegen) — the filter
   evaluates INSIDE the scan stage, before any exchange, so the
   shuffle carries only candidates;
3. an exact semi-join on the survivors removes false positives.

False negatives are impossible (every inserted key sets its bits), so
step 3 restores EXACT semantics — the composition is equivalence-
preserving, which is what lets the corpus oracle check it against a
plain semi-join. The md5-derived hashes are the same engine-stable
family as operators/sketch.py, and the bitmap is OR-mergeable (union
of key sets = OR of bitmaps) like every partial in rollup.py.

Implementation note: words hold 62 bits, not 64. PySpark's
``F.shiftleft`` accepts only a literal shift amount, so the probe mask
is ``pow(2.0, bit)`` cast to long — exact for every power of two a
signed long can hold, which a 62-bit index guarantees (bit <= 61); the
2-bits-per-word waste costs nothing and keeps both sides identical,
JVM-side, and ANSI-overflow-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from es_to_clickhouse_spark.operators.sketch import hash32

#: bits per expected key (m = 8n -> ~5% fp at k=2; fp only costs work,
#: never correctness)
BITS_PER_KEY = 8
N_HASHES = 2
WORD_BITS = 62


def bloom_bitmap(
    small: DataFrame, key_col: str, m_bits: int | None = None
) -> tuple[list[int], int]:
    """Collect the Bloom bitmap of ``small[key_col]`` to the driver:
    returns (words, m_bits). One count job sizes m; one aggregate job
    (map-side combinable bit_or per word) builds it."""
    # NULL keys can never equi-match a semi-join; dropping them here
    # keeps the hash/word math total (md5(NULL) is NULL)
    small = small.where(F.col(key_col).isNotNull())
    if m_bits is None:
        n = small.select(key_col).distinct().count()
        m_bits = 64
        while m_bits < BITS_PER_KEY * max(n, 1):
            m_bits *= 2
    idx = [
        (hash32(F.col(key_col), f"bf{i}") % m_bits).alias(f"_i{i}")
        for i in range(N_HASHES)
    ]
    exploded = small.select(
        F.explode(F.array(*idx)).alias("_idx")
    ).select(
        (F.col("_idx") / WORD_BITS).cast("int").alias("_w"),
        (F.col("_idx") % WORD_BITS).cast("int").alias("_b"),
    )
    rows = (
        exploded.groupBy("_w")
        .agg(F.expr("bit_or(shiftleft(1L, _b))").alias("_bits"))
        .collect()
    )
    words = [0] * (m_bits // WORD_BITS + 1)
    for r in rows:
        words[r["_w"]] = r["_bits"]
    return words, m_bits


def bloom_might_contain(
    words: list[int], m_bits: int, key: Column
) -> Column:
    """Map-side membership test against the driver-built bitmap — a
    literal array probe, no join, no shuffle, stays in codegen. NULL
    keys probe NULL -> filtered out, matching semi-join semantics
    (NULL never equi-matches)."""
    arr = F.array(*[F.lit(w) for w in words])
    conds = []
    for i in range(N_HASHES):
        idx = hash32(key, f"bf{i}") % m_bits
        word = F.element_at(arr, (idx / WORD_BITS).cast("int") + 1)
        # exact power-of-two mask; bit <= 61 so the long cast is safe
        mask = F.pow(F.lit(2.0), (idx % WORD_BITS).cast("int")).cast("long")
        conds.append(word.bitwiseAND(mask) != 0)
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


#: largest key count worth a literal bitmap: 1M keys -> 8M bits -> ~1 MB
#: of longs in the plan. Past this the literal bloats every task's
#: serialized plan, so the pre-filter is skipped and the exact semi-join
#: (whose build side Spark will broadcast or shuffle as usual) stands
#: alone — same results, just without the scan-stage discard.
MAX_FILTER_KEYS = 1_000_000


def bloom_semi_join(
    big: DataFrame, small: DataFrame, key_col: str
) -> DataFrame:
    """``big SEMI JOIN small ON key_col`` with the Bloom pre-filter in
    the big side's scan stage. Exact — false positives die in the final
    semi-join; false negatives cannot exist. Small sides beyond
    ``MAX_FILTER_KEYS`` skip the bitmap (plan-size boundary, see above)
    and degrade gracefully to the plain semi-join."""
    n = small.where(F.col(key_col).isNotNull()).select(key_col).distinct().count()
    exact = small.select(key_col).distinct()
    if n > MAX_FILTER_KEYS:
        return big.join(exact, key_col, "semi")
    m_bits = 64
    while m_bits < BITS_PER_KEY * max(n, 1):
        m_bits *= 2
    words, m_bits = bloom_bitmap(small, key_col, m_bits)
    pre = big.where(bloom_might_contain(words, m_bits, F.col(key_col)))
    return pre.join(exact, key_col, "semi")
