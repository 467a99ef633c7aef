"""Mixture-resampling queries: temperature sampling over the documents
corpus (operators/mixture.py), oracle-checked bit-for-bit against a
DuckDB replica of the same exact-integer rate formula.

The `lang` column is the mixture key on purpose: the testbed's language
distribution is skewed (en ~44%, fr ~13%), so alpha = 0.5 at a
full-size budget yields rate < 1 for en (downsample) and rate > 1 for
the tail languages (upsample) — both arms of the operator execute.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from es_to_clickhouse_spark.corpus import query, t
from es_to_clickhouse_spark.operators.mixture import (
    epoch_replicate,
    mixture_sample,
    temperature_rates,
)

#: DuckDB replica of temperature_rates(documents, "lang", "n_chars",
#: alpha=0.5, budget_frac=1.0) — identical op shapes: exact BIGINT token
#: sums, ppb-floored sqrt weights, single-rounded float steps.
_RATES_CTE = """
tok AS (SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS tok
        FROM documents GROUP BY lang),
tot AS (SELECT CAST(SUM(tok) AS BIGINT) AS all_tok FROM tok),
w AS (SELECT lang, tok, all_tok,
             CAST(FLOOR(SQRT(CAST(tok AS DOUBLE) / CAST(all_tok AS DOUBLE))
                        * 1e9) AS BIGINT) AS wr_ppb
      FROM tok, tot),
n AS (SELECT CAST(SUM(wr_ppb) AS BIGINT) AS norm_ppb FROM w),
r AS (SELECT lang,
             (CAST(CAST(FLOOR(CAST(1.0 AS DOUBLE) * CAST(all_tok AS DOUBLE))
                        AS BIGINT) AS DOUBLE)
              * CAST(wr_ppb AS DOUBLE))
             / (CAST(norm_ppb AS DOUBLE) * CAST(tok AS DOUBLE)) AS rate
      FROM w, n)
"""

_H32 = "('0x'||substr(md5({x}),1,8))::BIGINT"


@query(
    "mix1_temperature_mixture",
    f"""
    WITH {_RATES_CTE}
    SELECT d.lang, COUNT(*) AS n_docs,
           CAST(SUM(d.n_chars) AS BIGINT) AS chars_kept,
           CAST(FLOOR(LEAST(MIN(r.rate), 1.0) * 1e6) AS BIGINT) AS rate_ppm
    FROM documents d JOIN r ON d.lang = r.lang
    WHERE {_H32.format(x="'mix'||CAST(d.doc_id AS VARCHAR)")}
          < CAST(FLOOR(LEAST(r.rate, 1.0) * 4294967296.0) AS BIGINT)
    GROUP BY d.lang
    """,
)
def mix1_temperature_mixture(spark, sf_dir):
    """Temperature-flattened mixture (alpha=0.5, full budget): rates per
    language from one tiny aggregate, broadcast back, rows kept by a
    deterministic row-local hash cut — the downsampling half of the
    schedule (over-represented languages shrink; rate>=1 passes through).
    No shuffle touches the document rows."""
    d = t(spark, sf_dir, "documents")
    rates = temperature_rates(d, "lang", "n_chars", alpha=0.5, budget_frac=1.0)
    kept = mixture_sample(d, rates, "lang", "doc_id", salt="mix")
    summ = kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("chars_kept"),
    )
    return summ.join(F.broadcast(rates), "lang").select(
        "lang",
        "n_docs",
        "chars_kept",
        F.floor(F.least(F.col("rate"), F.lit(1.0)) * F.lit(1e6))
        .cast("long")
        .alias("rate_ppm"),
    )


@query(
    "mix2_epoch_upsample",
    f"""
    WITH {_RATES_CTE},
    -- UNION ALL instead of one filtered unnest: DuckDB's binder ICEs on a
    -- WHERE over an unnest alias combined with any other column, so the
    -- full epochs (unfiltered unnest of 0..floor(rate)-1) and the
    -- hash-gated fractional copy (no unnest at all) are separate branches.
    sel AS (
      SELECT d.lang, d.n_chars, r.rate,
             unnest(generate_series(0, CAST(FLOOR(r.rate) AS BIGINT) - 1))
               AS epoch
      FROM documents d JOIN r ON d.lang = r.lang
      UNION ALL
      SELECT d.lang, d.n_chars, r.rate,
             CAST(FLOOR(r.rate) AS BIGINT) AS epoch
      FROM documents d JOIN r ON d.lang = r.lang
      WHERE {_H32.format(
          x="'mixup'||CAST(d.doc_id AS VARCHAR)||'#'"
            "||CAST(CAST(FLOOR(r.rate) AS BIGINT) AS VARCHAR)"
      )}
            < CAST(FLOOR((r.rate - FLOOR(r.rate)) * 4294967296.0) AS BIGINT)
    )
    SELECT lang, COUNT(*) AS docs_emitted,
           CAST(SUM(n_chars) AS BIGINT) AS chars_emitted,
           CAST(FLOOR(MIN(rate)) AS BIGINT) AS full_epochs
    FROM sel GROUP BY lang
    """,
)
def mix2_epoch_upsample(spark, sf_dir):
    """The full mixture schedule realized as deterministic epoch
    replication: floor(rate) full copies per document plus a
    hash-gated fractional copy — under-represented languages are
    upsampled >1x, over-represented ones reduce to a fractional keep.
    Fan-out is exactly ceil(rate) per row; the rate table is broadcast;
    no shuffle on the document rows."""
    d = t(spark, sf_dir, "documents")
    rates = temperature_rates(d, "lang", "n_chars", alpha=0.5, budget_frac=1.0)
    rep = epoch_replicate(d, rates, "lang", "doc_id", salt="mixup")
    summ = rep.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs_emitted"),
        F.sum("n_chars").alias("chars_emitted"),
    )
    return summ.join(F.broadcast(rates), "lang").select(
        "lang",
        "docs_emitted",
        "chars_emitted",
        F.floor(F.col("rate")).cast("long").alias("full_epochs"),
    )
