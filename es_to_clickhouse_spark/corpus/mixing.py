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
from pyspark.sql.window import Window

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


@query(
    "cur1_curation_funnel",
    f"""
    WITH ded AS (
      SELECT * FROM (
        SELECT d.*, min(doc_id) OVER (PARTITION BY md5(text)) AS keep
        FROM documents d
      ) WHERE doc_id = keep
    ), qual AS (
      SELECT * FROM ded
      WHERE len(list_filter(string_split(text, ' '), x -> x != '')) >= 10
        AND n_chars >= 50
    ),
    tok AS (SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS tok
            FROM qual GROUP BY lang),
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
          FROM w, n),
    mixed AS (
      SELECT q.lang FROM qual q JOIN r ON q.lang = r.lang
      WHERE {_H32.format(x="'cur'||CAST(q.doc_id AS VARCHAR)")}
            < CAST(FLOOR(LEAST(r.rate, 1.0) * 4294967296.0) AS BIGINT)
    ),
    base AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_raw
             FROM documents GROUP BY lang),
    dc AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_dedup
           FROM ded GROUP BY lang),
    qc AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_quality
           FROM qual GROUP BY lang),
    mc AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_mixed
           FROM mixed GROUP BY lang)
    SELECT base.lang, n_raw,
           CAST(coalesce(dc.n_dedup, 0) AS BIGINT) AS n_dedup,
           CAST(coalesce(qc.n_quality, 0) AS BIGINT) AS n_quality,
           CAST(coalesce(mc.n_mixed, 0) AS BIGINT) AS n_mixed
    FROM base LEFT JOIN dc USING (lang) LEFT JOIN qc USING (lang)
    LEFT JOIN mc USING (lang)
    """,
)
def cur1_curation_funnel(spark, sf_dir):
    """The end-to-end curation pass, composed: exact dedup (min doc_id
    per text fingerprint) → quality gate (>= 10 tokens, >= 50 chars) →
    temperature-mixture downsample (operators/mixture.py, alpha 0.5) —
    reported as the per-language survival funnel a pipeline owner
    watches. One query proves the stages COMPOSE: the mixture rates are
    computed over the deduped+filtered corpus (not raw), exactly as a
    real pass would, and every stage reuses the already-verified
    operator (d1's window dedup, txt2's gate shape, mix1's exact-integer
    rate replica). Scale: the dedup window keys the only wide shuffle;
    rates are a broadcast; the hash-cut filter is row-local."""
    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text"))
    ded = (
        d.withColumn("keep", F.min("doc_id").over(w))
        .where(F.col("doc_id") == F.col("keep"))
        .drop("keep")
    )
    from es_to_clickhouse_spark.operators.text import tokens

    qual = ded.where(
        (F.size(tokens(F.col("text"))) >= 10) & (F.col("n_chars") >= 50)
    )
    rates = temperature_rates(qual, "lang", "n_chars", alpha=0.5)
    mixed = mixture_sample(qual, rates, "lang", "doc_id", salt="cur")

    def cnt(frame, name):
        return frame.groupBy("lang").agg(F.count(F.lit(1)).alias(name))

    out = (
        cnt(d, "n_raw")
        .join(cnt(ded, "n_dedup"), "lang", "left")
        .join(cnt(qual, "n_quality"), "lang", "left")
        .join(cnt(mixed, "n_mixed"), "lang", "left")
    )
    return out.select(
        "lang",
        "n_raw",
        F.coalesce("n_dedup", F.lit(0)).alias("n_dedup"),
        F.coalesce("n_quality", F.lit(0)).alias("n_quality"),
        F.coalesce("n_mixed", F.lit(0)).alias("n_mixed"),
    )


@query(
    "mix4_budget_allocation",
    f"""
    WITH {_RATES_CTE},
    b AS (SELECT all_tok // 2 AS budget FROM tot),
    tw AS (SELECT CAST(SUM(wr_ppb) AS BIGINT) AS wsum FROM w),
    base AS (
      SELECT w.lang, w.wr_ppb,
             (b.budget * w.wr_ppb) // tw.wsum AS quota,
             (b.budget * w.wr_ppb) % tw.wsum AS rem,
             b.budget AS budget
      FROM w, tw, b
    ), rr AS (
      SELECT *,
             row_number() OVER (ORDER BY rem DESC, lang ASC) AS rk,
             sum(quota) OVER () AS qsum
      FROM base
    )
    SELECT lang,
           CAST(wr_ppb AS BIGINT) AS weight_ppb,
           CAST(quota AS BIGINT) AS quota,
           CAST(CASE WHEN rk <= budget - qsum THEN 1 ELSE 0 END AS BIGINT)
             AS extra,
           CAST(quota + CASE WHEN rk <= budget - qsum THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM rr
    """,
)
def mix4_budget_allocation(spark, sf_dir):
    """Integer token-budget apportionment (largest-remainder /
    Hamilton): the temperature weights (mix1's exact ppb-floored sqrt
    shares) realized as INTEGER char allocations against a budget of
    half the corpus — the number a sampler can actually execute, with
    sum(alloc) == budget exactly and every language within one unit of
    its exact share. Built on
    :func:`operators.mixture.largest_remainder_allocation`: pure
    integer quota/remainder math (bit-identical on any engine and any
    rerun); every window runs over the per-language weight table (one
    row per language), never the corpus. The budget and weight table
    are the only driver scalars — both bounded by |languages|."""
    from es_to_clickhouse_spark.operators.mixture import (
        largest_remainder_allocation,
    )

    d = t(spark, sf_dir, "documents")
    tok = d.groupBy("lang").agg(F.sum("n_chars").cast("long").alias("tok"))
    all_tok = int(
        tok.agg(F.sum("tok").cast("long").alias("s")).first()["s"]
    )
    weights = tok.select(
        "lang",
        F.floor(
            F.sqrt(F.col("tok").cast("double") / F.lit(float(all_tok)))
            * F.lit(1e9)
        )
        .cast("long")
        .alias("weight_ppb"),
    )
    alloc = largest_remainder_allocation(
        weights, "lang", "weight_ppb", all_tok // 2
    )
    return alloc.select(
        "lang",
        "weight_ppb",
        F.col("quota").cast("long").alias("quota"),
        F.col("extra").cast("long").alias("extra"),
        F.col("alloc").cast("long").alias("alloc"),
    )


@query(
    "cur2_pareto_frontier",
    """
    WITH q AS (
      SELECT doc_id, lang, n_chars,
             (1000000 * len(list_distinct(toks))) // len(toks) AS ttr_ppm
      FROM (SELECT *, list_filter(string_split(text, ' '), x -> x != '')
                      AS toks
            FROM documents)
      WHERE len(toks) > 0
    ), px AS (
      SELECT ttr_ppm AS x, max(n_chars) AS my FROM q GROUP BY 1
    ), th AS (
      SELECT x, max(my) OVER (ORDER BY x DESC
                              RANGE BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING) AS dom
      FROM px
    )
    SELECT q.doc_id, q.lang, q.ttr_ppm, q.n_chars
    FROM q JOIN th ON th.x = q.ttr_ppm
    WHERE dom IS NULL OR dom <= q.n_chars
    """,
)
def cur2_pareto_frontier(spark, sf_dir):
    """Two-criteria curation frontier: the documents no other document
    strictly beats on BOTH lexical richness (type/token ratio, exact
    integer ppm) and length — the selection a curation pass makes when
    two quality axes should not be collapsed into one weighted scalar.
    Built on :func:`operators.mixture.pareto_frontier_2d`: dominance is
    factored through the DISTINCT ttr values (bounded by the ppm
    quantization, never by corpus size), so the big table sees ONE
    map-side-combinable groupBy and a broadcast-join row-local filter —
    no all-pairs stage, no single-partition global window over data."""
    from es_to_clickhouse_spark.operators.mixture import pareto_frontier_2d
    from es_to_clickhouse_spark.operators.text import tokens

    d = t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    q = d.select(
        "doc_id",
        "lang",
        "n_chars",
        (F.lit(1000000).cast("bigint")
         * F.size(F.array_distinct(toks))).alias("_num"),
        F.size(toks).alias("_den"),
    ).where(F.col("_den") > 0)
    q = q.select(
        "doc_id",
        "lang",
        F.expr("_num div _den").alias("ttr_ppm"),
        "n_chars",
    )
    return pareto_frontier_2d(q, "ttr_ppm", "n_chars").select(
        "doc_id", "lang", "ttr_ppm", "n_chars"
    )


@query(
    "cur3_source_top_fraction",
    """
    WITH q AS (
      SELECT source,
             (1000000 * len(list_distinct(toks))) // len(toks) AS ttr_ppm,
             doc_id, n_chars
      FROM (SELECT *, list_filter(string_split(text, ' '), x -> x != '')
                      AS toks
            FROM documents)
      WHERE len(toks) > 0
    ), r AS (
      SELECT *,
             row_number() OVER (PARTITION BY source
                                ORDER BY ttr_ppm DESC, doc_id ASC) AS rk,
             count(*) OVER (PARTITION BY source) AS n
      FROM q
    ), kept AS (
      -- pure-integer ceil(n/5): the float 0.2*n deviates on
      -- exactly-representable boundaries (0.2*55 = 11.000000000000002)
      SELECT * FROM r WHERE rk <= (1 * n + 4) // 5
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(min(ttr_ppm) AS BIGINT) AS cutoff_ttr_ppm,
           CAST(sum(n_chars) AS BIGINT) AS kept_chars
    FROM kept GROUP BY source
    """,
)
def cur3_source_top_fraction(spark, sf_dir):
    """Keep the top 20% of documents per source by lexical richness —
    the standard per-domain quality cut a curation pass runs before
    mixing (quality scores are only comparable WITHIN a source, so the
    cut must be per-group, not global). Built on
    :func:`operators.mixture.top_fraction_per_group`: the cut is the
    exact integer rule rank <= ceil(frac * group_size), evaluated in
    PURE integer arithmetic (frac snapped to 1/5; rk <= (n+4) div 5 —
    the float form keeps a 12th row at n=55, ADVICE r13), with a
    deterministic (score DESC, doc_id ASC) tiebreak — never a float
    percent_rank, whose tie behavior differs between engines. One
    shuffle partitioned by source; groups rank independently (no
    global sort). Reported as the per-source survival profile with the
    effective score cutoff."""
    from es_to_clickhouse_spark.operators.mixture import (
        top_fraction_per_group,
    )
    from es_to_clickhouse_spark.operators.text import tokens

    d = t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    q = d.select(
        "source",
        "doc_id",
        "n_chars",
        (F.lit(1000000).cast("bigint")
         * F.size(F.array_distinct(toks))).alias("_num"),
        F.size(toks).alias("_den"),
    ).where(F.col("_den") > 0)
    q = q.select(
        "source",
        "doc_id",
        "n_chars",
        F.expr("_num div _den").alias("ttr_ppm"),
    )
    kept = top_fraction_per_group(q, "source", "ttr_ppm", 0.2, "doc_id")
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("ttr_ppm").cast("bigint").alias("cutoff_ttr_ppm"),
        F.sum("n_chars").cast("bigint").alias("kept_chars"),
    )


_HS = 2**32
_SP_TRAIN = int(0.8 * _HS)
_SP_VAL = int((0.8 + 0.1) * _HS)


@query(
    "mix3_leakage_safe_split",
    f"""
    WITH fp AS (
      SELECT doc_id,
             md5(substr(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), 1, 40))
               AS fingerprint
      FROM documents
    ), lab AS (
      SELECT fingerprint,
             CASE WHEN hd < {_SP_TRAIN} THEN 'train'
                  WHEN hd < {_SP_VAL} THEN 'val'
                  ELSE 'test' END AS doc_split,
             CASE WHEN hc < {_SP_TRAIN} THEN 'train'
                  WHEN hc < {_SP_VAL} THEN 'val'
                  ELSE 'test' END AS cl_split
      FROM (SELECT fingerprint,
                   {_H32.format(x="'split'||CAST(doc_id AS VARCHAR)")} AS hd,
                   {_H32.format(x="'split'||fingerprint")} AS hc
            FROM fp)
    ), m AS (
      SELECT 'doc_hash' AS method, doc_split AS split, fingerprint FROM lab
      UNION ALL
      SELECT 'cluster_hash' AS method, cl_split AS split, fingerprint FROM lab
    ), per_fp AS (
      SELECT method, fingerprint,
             count(*) FILTER (split = 'train') AS nt,
             count(*) FILTER (split = 'val') AS nv,
             count(*) FILTER (split = 'test') AS ns,
             count(*) AS n,
             count(DISTINCT split) AS nsp
      FROM m GROUP BY method, fingerprint
    )
    SELECT method,
           CAST(sum(nt) AS BIGINT) AS n_train,
           CAST(sum(nv) AS BIGINT) AS n_val,
           CAST(sum(ns) AS BIGINT) AS n_test,
           count(*) FILTER (n > 1 AND nsp > 1) AS leaked_clusters
    FROM per_fp GROUP BY method
    """,
)
def mix3_leakage_safe_split(spark, sf_dir):
    """Leakage guard for train/val/test splits: the SAME 0.8/0.1/0.1 hash
    range keyed two ways — on doc_id (the naive split) and on a duplicate-
    cluster key (operators/mixture.cluster_safe_split). The cluster key is
    a prefix fingerprint (md5 of the first 40 normalized chars — the
    boilerplate-prefix near-dup surrogate; any granularity composes: exact
    md5, MinHash band, CC label). Output contrasts per-split doc counts
    AND the leak metric: multi-doc clusters that straddle a split
    boundary. Doc-keyed splitting leaks (a duplicate pair whose ids hash
    apart puts training text in the eval set); cluster-keyed is leak-free
    BY CONSTRUCTION — the query measures both rather than asserting.
    Plan: both labels are row-local hashes (no shuffle to assign), then
    ONE uniform-key shuffle per method on the 128-bit fingerprint for the
    per-cluster straddle check and a 2-row re-agg — the md5 key keeps it
    skew-proof at 100 TB."""
    from es_to_clickhouse_spark.operators.mixture import cluster_safe_split
    from es_to_clickhouse_spark.operators.sketch import hash_split

    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.substring(norm, 1, 40)).alias("fingerprint")
    )
    doc = d.select(
        F.lit("doc_hash").alias("method"),
        hash_split(F.col("doc_id"), w, salt="split"),
        "fingerprint",
    )
    clu = cluster_safe_split(d, "fingerprint", w, salt="split").select(
        F.lit("cluster_hash").alias("method"), "split", "fingerprint"
    )
    m = doc.unionByName(clu)
    per_fp = m.groupBy("method", "fingerprint").agg(
        F.count(F.when(F.col("split") == "train", 1)).alias("nt"),
        F.count(F.when(F.col("split") == "val", 1)).alias("nv"),
        F.count(F.when(F.col("split") == "test", 1)).alias("ns"),
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("split").alias("nsp"),
    )
    return per_fp.groupBy("method").agg(
        F.sum("nt").alias("n_train"),
        F.sum("nv").alias("n_val"),
        F.sum("ns").alias("n_test"),
        F.count(
            F.when((F.col("n") > 1) & (F.col("nsp") > 1), 1)
        ).alias("leaked_clusters"),
    )
