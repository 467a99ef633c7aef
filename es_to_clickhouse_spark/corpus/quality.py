"""Data-quality profiling, time-series features, and training-data
packing — the operations a 100 TB training-data pipeline runs between
ingestion (the reference's job, engine.py) and model consumption.

Reference parity note: the reference ships no analytics of its own (it
moves rows; es/es_to_bytehouse.py), so every query here is engine
surface beyond parity — each one states its scale plan in the
docstring. Naming: dq* data quality, ts* time series, pk* packing.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from es_to_clickhouse_spark.corpus import query, t


@query(
    "ts2_ohlc_downsample",
    """
    WITH e AS (
      SELECT user_id, CAST(ts AS DATE) AS d, ts, event_id, value FROM events
    ), w AS (
      SELECT user_id, d, value,
             first_value(value) OVER win AS open_v,
             last_value(value)  OVER win AS close_v
      FROM e
      WINDOW win AS (PARTITION BY user_id, d ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, strftime(d, '%Y-%m-%d') AS day,
           round(any_value(open_v), 4)  AS open,
           round(max(value), 4)         AS high,
           round(min(value), 4)         AS low,
           round(any_value(close_v), 4) AS close,
           count(*) AS n_events
    FROM w GROUP BY user_id, d
    """,
)
def ts2_ohlc_downsample(spark, sf_dir):
    """OHLC candlestick downsampling (the classic time-series rollup):
    per user per day, first/max/min/last of `value` under the total
    order (ts, event_id). One hash partitioning on (user_id, day) serves
    BOTH the window pass and the groupBy — Spark reuses the exchange, so
    a 100 TB event log pays a single shuffle."""
    e = t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d"), "ts", "event_id", "value"
    )
    win = Window.partitionBy("user_id", "d").orderBy("ts", "event_id")
    full = win.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w = e.select(
        "user_id",
        "d",
        "value",
        F.first("value").over(full).alias("open_v"),
        F.last("value").over(full).alias("close_v"),
    )
    return w.groupBy("user_id", "d").agg(
        F.round(F.any_value("open_v"), 4).alias("open"),
        F.round(F.max("value"), 4).alias("high"),
        F.round(F.min("value"), 4).alias("low"),
        F.round(F.any_value("close_v"), 4).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    ).select(
        "user_id", F.date_format("d", "yyyy-MM-dd").alias("day"),
        "open", "high", "low", "close", "n_events",
    )


@query(
    "ts3_ewma_finite",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, avg(value) AS x
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), lagged AS (
      SELECT event_type, d, x,
             lag(x, 1) OVER w AS x1, lag(x, 2) OVER w AS x2,
             lag(x, 3) OVER w AS x3, lag(x, 4) OVER w AS x4
      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)
    )
    SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
           round((1.0 * x
                  + 0.5 * COALESCE(x1, 0) + 0.25 * COALESCE(x2, 0)
                  + 0.125 * COALESCE(x3, 0) + 0.0625 * COALESCE(x4, 0))
                 / (1.0
                    + CASE WHEN x1 IS NULL THEN 0 ELSE 0.5 END
                    + CASE WHEN x2 IS NULL THEN 0 ELSE 0.25 END
                    + CASE WHEN x3 IS NULL THEN 0 ELSE 0.125 END
                    + CASE WHEN x4 IS NULL THEN 0 ELSE 0.0625 END), 6)
             AS ewma
    FROM lagged
    """,
)
def ts3_ewma_finite(spark, sf_dir):
    """Finite-window EWMA (alpha=0.5, 5 taps) of the per-type daily mean
    — the smoothing feature every metrics/training-curation pipeline
    computes. The closed form (weighted sum of a FIXED number of lags,
    renormalized over available taps) keeps it a pure window expression:
    no recursion, no UDF, one shuffle on event_type, deterministic
    because the fixed expression order is identical on both engines."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.avg("value").alias("x"))
    )
    w = Window.partitionBy("event_type").orderBy("d")
    lags = daily.select(
        "event_type", "d", "x",
        *[F.lag("x", k).over(w).alias(f"x{k}") for k in (1, 2, 3, 4)],
    )
    weights = {0: 1.0, 1: 0.5, 2: 0.25, 3: 0.125, 4: 0.0625}
    num = F.col("x") * weights[0]
    den = F.lit(weights[0])
    for k in (1, 2, 3, 4):
        num = num + F.coalesce(F.col(f"x{k}"), F.lit(0.0)) * weights[k]
        den = den + F.when(F.col(f"x{k}").isNull(), 0.0).otherwise(weights[k])
    return lags.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.round(num / den, 6).alias("ewma"),
    )


@query(
    "ts4_rolling_median",
    """
    SELECT event_id, user_id,
           round(median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN 14 PRECEDING AND CURRENT ROW), 4)
             AS med_15
    FROM events
    """,
)
def ts4_rolling_median(spark, sf_dir):
    """Rolling EXACT median over a 15-row trailing frame per user —
    robust local level estimate (outlier-resistant where a rolling mean
    is not). Spark has no exact-median window aggregate, so the frame
    (bounded: 15 values) is gathered with collect_list, sorted, and the
    middle element(s) read positionally — still pure Column expressions,
    still one shuffle on user_id; the frame bound keeps per-row state
    O(15) no matter how large the table is. Even-count frames
    interpolate (avg of the two middle values), matching DuckDB's
    median()."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-14, Window.currentRow)
    )
    arr = F.sort_array(F.collect_list("value").over(w))
    n = F.size(arr)
    mid = (n / 2).cast("int")  # 0-based upper-middle index
    med = F.when(
        n % 2 == 1, F.element_at(arr, mid + 1)
    ).otherwise((F.element_at(arr, mid) + F.element_at(arr, mid + 1)) / 2.0)
    return t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.round(med, 4).alias("med_15")
    )


@query(
    "ts5_lag_features",
    """
    WITH w AS (
      SELECT event_id, user_id, value,
             lag(value, 1) OVER win AS lag1,
             lag(value, 7) OVER win AS lag7
      FROM events WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id, round(value, 4) AS value,
           round(lag1, 4) AS lag1, round(lag7, 4) AS lag7,
           round(value - lag1, 4) AS delta1,
           CASE WHEN lag1 IS NULL OR lag1 = 0 THEN NULL
                ELSE CAST(floor((value - lag1) / lag1 * 1000000) AS BIGINT)
           END AS pct1_ppm
    FROM w
    """,
)
def ts5_lag_features(spark, sf_dir):
    """Lag-feature matrix (lag-1, lag-7, delta, percent change) — the
    standard autoregressive feature block for forecasting training data.
    One window pass, one shuffle on the entity key; every feature is a
    pure expression over the same sorted frame, so adding more lags adds
    zero shuffles. The percent change renders as FLOORED integer ppm,
    not round(x, 6): decimal round on a double sits 1 ulp apart between
    engines at .5 boundaries (Spark BigDecimal HALF_UP vs DuckDB
    C-style; bit us at sf0.1 row 84116), while floor of the identical
    IEEE quotient is deterministic everywhere."""
    win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = t(spark, sf_dir, "events")
    lag1 = F.lag("value", 1).over(win)
    lag7 = F.lag("value", 7).over(win)
    return e.select(
        "event_id",
        "user_id",
        F.round("value", 4).alias("value"),
        F.round(lag1, 4).alias("lag1"),
        F.round(lag7, 4).alias("lag7"),
        F.round(F.col("value") - lag1, 4).alias("delta1"),
        F.when(
            lag1.isNull() | (lag1 == 0), F.lit(None).cast("bigint")
        )
        .otherwise(
            F.floor((F.col("value") - lag1) / lag1 * 1000000).cast("bigint")
        )
        .alias("pct1_ppm"),
    )


@query(
    "dq2_column_profile",
    """
    SELECT 'o_orderkey' AS col, count(*) AS n,
           count(*) - count(o_orderkey) AS n_null,
           count(DISTINCT o_orderkey) AS n_distinct
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
           count(DISTINCT o_custkey) FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus) FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice) FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority) FROM orders
    """,
)
def dq2_column_profile(spark, sf_dir):
    """Schema-profile pass (per-column row/null/exact-distinct counts) —
    the first query every ingestion QA job runs. ONE scan: all columns'
    metrics come from a single aggregate (Spark expands the multi-
    distinct into one Expand + aggregate pipeline rather than one scan
    per column; the oracle's UNION ALL shape would scan five times), then
    a literal-keyed stack unpivots driver-side. At 100 TB the scan
    dominates, so 1 scan vs 5 is the whole game."""
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderpriority",
    ]
    o = t(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"_null_{c}"))
        aggs.append(F.countDistinct(c).alias(f"_dist_{c}"))
    row = o.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args += [
            f"'{c}'", "_n", f"_null_{c}", f"_dist_{c}",
        ]
    return row.selectExpr(
        f"stack({len(cols)}, {', '.join(stack_args)}) AS (col, n, n_null, n_distinct)"
    )


@query(
    "dq3_daily_anomaly",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, count(*) AS cnt FROM events GROUP BY 1
    ), stats AS (
      SELECT avg(cnt) AS mu, stddev_samp(cnt) AS sigma FROM daily
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, cnt,
           round((cnt - mu) / sigma, 4) AS z
    FROM daily, stats
    WHERE abs((cnt - mu) / sigma) > 1.0
    """,
)
def dq3_daily_anomaly(spark, sf_dir):
    """Volume-anomaly detection: daily row counts z-scored against the
    whole history; |z| > 1 days surface ingestion gaps and double-loads.
    The stats side is ONE row — broadcast, so the plan is aggregate →
    broadcast join → filter: no second shuffle of the daily table. The
    z computation runs on exact integer counts; only the final ratio is
    floating (rounded identically on both engines)."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    stats = daily.agg(
        F.avg("cnt").alias("mu"), F.stddev_samp("cnt").alias("sigma")
    )
    z = (F.col("cnt") - F.col("mu")) / F.col("sigma")
    return (
        daily.crossJoin(F.broadcast(stats))
        .where(F.abs(z) > 1.0)
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "cnt",
            F.round(z, 4).alias("z"),
        )
    )


@query(
    "dq4_orphan_keys",
    """
    SELECT 'lineitem->orders' AS fk, count(*) AS n_orphans
    FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'orders->customer', count(*)
    FROM orders o WHERE NOT EXISTS
      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'customer->nation', count(*)
    FROM customer c WHERE NOT EXISTS
      (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    """,
)
def dq4_orphan_keys(spark, sf_dir):
    """Referential-integrity audit: orphan counts along the three FK
    edges, via LEFT ANTI joins. The parent side of each edge is the
    smaller table — broadcast where it fits (nation always, customer
    usually), so the audits are map-side; the lineitem→orders check at
    100 TB is one shuffled anti join on the natural key, the cheapest
    possible full verification."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey")

    def audit(child, key, parent, pkey, label):
        orphans = child.join(
            parent, child[key] == parent[pkey], "left_anti"
        )
        return orphans.agg(F.count(F.lit(1)).alias("n_orphans")).select(
            F.lit(label).alias("fk"), "n_orphans"
        )

    return (
        audit(li, "l_orderkey", o.select("o_orderkey"), "o_orderkey", "lineitem->orders")
        .unionByName(audit(o, "o_custkey", F.broadcast(c.select("c_custkey")), "c_custkey", "orders->customer"))
        .unionByName(audit(c, "c_nationkey", F.broadcast(n), "n_nationkey", "customer->nation"))
    )


@query(
    "dq5_join_key_skew",
    """
    WITH k AS (
      SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY l_orderkey
    ), tot AS (SELECT sum(cnt) AS total, avg(cnt) AS avg_cnt FROM k)
    SELECT l_orderkey, cnt,
           round(cnt / total, 6) AS share,
           round(cnt / avg_cnt, 4) AS x_avg
    FROM k, tot
    ORDER BY cnt DESC, l_orderkey LIMIT 5
    """,
)
def dq5_join_key_skew(spark, sf_dir):
    """Join-key skew diagnostic: the 5 heaviest lineitem join keys with
    their share of all rows and multiple-of-average — the numbers that
    tell you whether the next join needs salting or AQE skew handling
    BEFORE you run it. Per-key counts are one partial-aggregated
    shuffle; the totals row broadcasts; top-5 is a TakeOrdered, never a
    global sort."""
    k = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = k.agg(
        F.sum("cnt").alias("total"), F.avg("cnt").alias("avg_cnt")
    )
    return (
        k.crossJoin(F.broadcast(tot))
        .select(
            "l_orderkey",
            "cnt",
            F.round(F.col("cnt") / F.col("total"), 6).alias("share"),
            F.round(F.col("cnt") / F.col("avg_cnt"), 4).alias("x_avg"),
        )
        .orderBy(F.col("cnt").desc(), "l_orderkey")
        .limit(5)
    )


@query(
    "pk1_context_pack",
    """
    WITH d AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '), x -> x != '')) AS toks
      FROM documents
    ), c AS (
      SELECT doc_id, toks,
             sum(toks) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM d
    )
    SELECT CAST(floor((cum - toks) / 512) AS BIGINT) AS window_id,
           count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS total_tokens
    FROM c GROUP BY 1
    """,
)
def pk1_context_pack(spark, sf_dir):
    """Context-window packing — the concat-then-chop step of LLM
    pretraining data prep: documents in a fixed global order, token
    counts accumulated, each doc assigned to the 512-token window its
    FIRST token lands in. The running sum uses
    operators.ordered.global_running_sum (range repartition +
    per-partition window + broadcast prefix offsets) — NOT a
    single-partition global window, so packing a 100 TB corpus
    parallelizes across every executor while producing byte-identical
    window ids to the oracle's serial cumsum."""
    from es_to_clickhouse_spark.operators.ordered import global_running_sum
    from es_to_clickhouse_spark.operators.text import tokens

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("toks")
    )
    c = global_running_sum(d, ["doc_id"], "toks", out_col="cum")
    return (
        c.select(
            F.floor((F.col("cum") - F.col("toks")) / 512)
            .cast("bigint")
            .alias("window_id"),
            "toks",
        )
        .groupBy("window_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").alias("total_tokens"),
        )
    )


@query(
    "txt15_zipf_slope",
    """
    WITH tok AS (
      SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x != ''))
               AS w
      FROM documents
    ), freq AS (
      SELECT w, count(*) AS f FROM tok GROUP BY w
    ), ranked AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, w) AS r
      FROM freq
    ), top AS (
      SELECT ln(r) AS x, ln(f) AS y FROM ranked WHERE r <= 100
    ), s AS (
      SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM top
    )
    SELECT round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope
    FROM s
    """,
)
def txt15_zipf_slope(spark, sf_dir):
    """Zipf-law fit of the corpus vocabulary: least-squares slope of
    ln(freq) vs ln(rank) over the top-100 tokens (natural text ≈ −1;
    big deviations flag boilerplate or synthetic spam — a corpus-level
    quality gate). Token counting is one explode + one aggregate; the
    rank top-100 is a TakeOrdered (100 rows to one task, not a global
    sort); the regression runs on 100 rows driver-free via a single
    aggregate. Deterministic tie-break (freq desc, token asc) keeps the
    top-100 set identical on both engines."""
    from es_to_clickhouse_spark.operators.text import tokens

    tok = (
        t(spark, sf_dir, "documents")
        .select(F.explode(tokens(F.lower(F.col("text")))).alias("w"))
    )
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    ranked = freq.select(
        "f", "w"
    ).orderBy(F.col("f").desc(), "w").limit(100).select(
        "f", F.row_number().over(
            Window.orderBy(F.col("f").desc(), "w")
        ).alias("r")
    )
    top = ranked.select(
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("f").cast("double")).alias("y"),
    )
    s = top.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return s.select(F.round(slope, 6).alias("zipf_slope"))


@query(
    "pk2_curriculum_bins",
    """
    WITH cuts AS (
      SELECT quantile_cont(CAST(n_chars AS DOUBLE),
                           [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS q
      FROM documents
    ), binned AS (
      SELECT d.doc_id, d.n_chars,
             (CASE WHEN q[1] <= d.n_chars THEN 1 ELSE 0 END
            + CASE WHEN q[2] <= d.n_chars THEN 1 ELSE 0 END
            + CASE WHEN q[3] <= d.n_chars THEN 1 ELSE 0 END
            + CASE WHEN q[4] <= d.n_chars THEN 1 ELSE 0 END
            + CASE WHEN q[5] <= d.n_chars THEN 1 ELSE 0 END
            + CASE WHEN q[6] <= d.n_chars THEN 1 ELSE 0 END
            + CASE WHEN q[7] <= d.n_chars THEN 1 ELSE 0 END
            + CASE WHEN q[8] <= d.n_chars THEN 1 ELSE 0 END
            + CASE WHEN q[9] <= d.n_chars THEN 1 ELSE 0 END) AS bin
      FROM documents d, cuts
    )
    SELECT bin, count(*) AS n_docs,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars
    FROM binned GROUP BY bin
    """,
)
def pk2_curriculum_bins(spark, sf_dir):
    """Curriculum binning: documents into difficulty deciles by length —
    the ordering step of curriculum-learning data prep. NOT a global
    ntile (which would funnel every row through one window partition):
    exact decile cut values are ONE aggregate row, broadcast, and each
    row buckets itself with 9 comparisons — fully parallel, same scale
    shape as the as-of bucketizer. Spark's exact `percentile` and
    DuckDB's quantile_cont share the same linear-interpolation
    definition, and the scores are integers, so the cuts match
    bit-for-bit."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", F.col("n_chars").cast("double").alias("score")
    )
    probs = [i / 10 for i in range(1, 10)]
    cuts = d.agg(
        F.expr(
            "percentile(score, array({}))".format(",".join(str(p) for p in probs))
        ).alias("q")
    )
    binned = d.crossJoin(F.broadcast(cuts))
    bin_col = None
    for i in range(1, 10):
        term = F.when(
            F.element_at(F.col("q"), i) <= F.col("score"), F.lit(1)
        ).otherwise(F.lit(0))
        bin_col = term if bin_col is None else bin_col + term
    return (
        binned.select(bin_col.alias("bin"), "n_chars")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@query(
    "w14_rank_distributions",
    """
    SELECT event_id, user_id,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
    """,
)
def w14_rank_distributions(spark, sf_dir):
    """Distribution-rank window battery (percent_rank, cume_dist, ntile)
    PER USER — per-entity score normalization for feature pipelines.
    Partitioned by the entity key, so unlike a global ntile this
    parallelizes: one shuffle, three rank functions over one shared
    sort. Ranks are exact small rationals — round(6) renders identically
    on both engines."""
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    return t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


@query(
    "txt16_boilerplate_sentences",
    """
    WITH tok AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS ts
      FROM documents
    ), g AS (
      SELECT doc_id, array_to_string(list_slice(ts, i, i + 7), ' ') AS span
      FROM tok, unnest(generate_series(1, len(ts) - 7)) AS u(i)
      WHERE len(ts) >= 8
    )
    SELECT md5(span) AS fp, count(DISTINCT doc_id) AS n_docs,
           min(span) AS sample_span
    FROM g GROUP BY md5(span) HAVING count(DISTINCT doc_id) >= 3
    """,
)
def txt16_boilerplate_sentences(spark, sf_dir):
    """Cross-document boilerplate mining: sliding 8-token spans
    fingerprinted and grouped to find text repeated across >= 3
    DISTINCT documents — headers, disclaimers, and template spam that
    document-level dedup never sees (the documents differ; their spans
    don't). Token spans, not sentence splits: the boilerplate unit must
    not depend on punctuation conventions (this corpus has none — the
    earlier '. '-split version was vacuously empty at EVERY scale
    factor, the green-but-unexercised trap). The aggregate groups on
    the 16-byte fingerprint; at 100 TB the shuffle carries hashes plus
    one bounded sample span per group. ~70-420 spans qualify across
    the three test SFs, so the threshold is genuinely exercised."""
    d = t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    from es_to_clickhouse_spark.operators.text import tokens

    # checkpoint barrier between the tokenizer lambda and the Generate
    arr = d.select("doc_id", tokens(F.col("text")).alias("_ts")).localCheckpoint(
        eager=False
    )
    g = (
        arr.where(F.size("_ts") >= 8)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.size("_ts") - 7)).alias("i"),
            "_ts",
        )
        .select(
            "doc_id",
            F.array_join(F.slice(F.col("_ts"), F.col("i"), 8), " ").alias("span"),
        )
    )
    return (
        g.groupBy(F.md5("span").alias("fp"))
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("span").alias("sample_span"),
        )
        .where(F.col("n_docs") >= 3)
    )


@query(
    "d12_minhash_estimate_error",
    """
    WITH tok AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split(text, ' '), x -> x != ''))
               AS ts
      FROM documents
    ), sig AS (
      SELECT doc_id, ts,
             [list_aggregate(list_transform(ts, x -> md5('0:' || x)), 'min'),
              list_aggregate(list_transform(ts, x -> md5('1:' || x)), 'min'),
              list_aggregate(list_transform(ts, x -> md5('2:' || x)), 'min'),
              list_aggregate(list_transform(ts, x -> md5('3:' || x)), 'min')]
               AS mh
      FROM tok
    ), banded AS (
      SELECT doc_id, gs.i - 1 AS band_id, mh[gs.i] AS band_key
      FROM sig, generate_series(1, 4) AS gs(i)
    ), kept AS (
      SELECT doc_id, band_id, band_key,
             count(*) OVER (PARTITION BY band_id, band_key) AS bsz
      FROM banded
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM kept a JOIN kept b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
      WHERE a.bsz <= 50 AND b.bsz <= 50 AND a.doc_id % 10 = 3
    ), pairs AS (
      SELECT c.id_a, c.id_b,
             (CASE WHEN sa.mh[1] = sb.mh[1] THEN 1 ELSE 0 END
            + CASE WHEN sa.mh[2] = sb.mh[2] THEN 1 ELSE 0 END
            + CASE WHEN sa.mh[3] = sb.mh[3] THEN 1 ELSE 0 END
            + CASE WHEN sa.mh[4] = sb.mh[4] THEN 1 ELSE 0 END) / 4.0 AS est,
             round(len(list_intersect(sa.ts, sb.ts))
                   / (len(sa.ts) + len(sb.ts) - len(list_intersect(sa.ts, sb.ts))),
                   4) AS exact_j
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.id_a
      JOIN sig sb ON sb.doc_id = c.id_b
    )
    SELECT id_a, id_b, round(est, 4) AS est_jaccard, exact_j AS exact_jaccard,
           round(abs(est - exact_j), 4) AS abs_err
    FROM pairs
    WHERE exact_j >= 0.2 OR est >= 0.25
    """,
)
def d12_minhash_estimate_error(spark, sf_dir):
    """MinHash estimator calibration: for every LSH candidate pair in a
    deterministic 10% sample, the k=4 signature-agreement estimate of
    Jaccard vs the exact token-set Jaccard, with absolute error — the
    query you run FIRST, on the full corpus, before trusting any LSH
    threshold (it tells you what k buys on the population LSH will
    actually surface).

    r8 SCALE_BENCH measured the previous shape — lang-blocked self-join
    with the 10% sample applied AFTER the join — at 28.6x on 10x data:
    lang blocks grow with the corpus (quadratic pairs), and every pair
    paid the token-set intersect before the sample discarded 90% of
    them. Two changes, each mirrored in the oracle:

    - Block on LSH band keys (one band per minhash value, r=1 b=4 — the
      high-recall banding: P(candidate | J=0.7) ~ 0.99) with d8's
      max_bucket=50 degenerate-bucket guard, so candidate pairs are
      bounded per bucket and grow with bucket COUNT, not corpus size.
    - Apply the `doc_id % 10 = 3` calibration sample to the LEFT side
      BEFORE the pair join (pairs-whose-smaller-id-is-sampled is the
      same population the old post-join filter kept), so 90% of the
      candidate generation never happens.

    The bucket-size window runs over FULL buckets (guard before sample)
    so the kept/dropped bucket set is sample-independent. With r=1
    banding every candidate has est >= 0.25, so the trailing filter is
    population documentation, not pruning. The md5 minhash is
    engine-stable and jaccard needs only set cardinalities (tokens
    xxhash64-hashed Spark-side, plain strings in DuckDB — same counts),
    so estimate AND exact match the oracle bit-for-bit."""
    from es_to_clickhouse_spark.operators.dedup import jaccard, minhash_signature
    from es_to_clickhouse_spark.operators.text import tokens

    d = t(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    # one tokenize+signature pass shared by banding and both verify
    # sides; repartition first so the HOF projections use all cores
    # (single-file source = one scan partition), checkpoint so the
    # three consumers read one materialization
    sig = (
        d.repartition(par)
        .select(
            "doc_id",
            F.transform(
                F.array_distinct(tokens(F.col("text"))), lambda s: F.xxhash64(s)
            ).alias("ts"),
            F.array(*minhash_signature(F.col("text"), k=4)).alias("mh"),
        )
        .localCheckpoint(eager=False)
    )
    bands = sig.select("doc_id", F.posexplode("mh").alias("band_id", "band_key"))
    w = Window.partitionBy("band_id", "band_key")
    kept = (
        bands.withColumn("_bsz", F.count(F.lit(1)).over(w))
        .where(F.col("_bsz") <= 50)
        .drop("_bsz")
    )
    a = kept.where(F.col("doc_id") % 10 == 3).select(
        "band_id", "band_key", F.col("doc_id").alias("id_a")
    )
    b = kept.select("band_id", "band_key", F.col("doc_id").alias("id_b"))
    cand = (
        a.join(b, ["band_id", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()  # a pair may collide in several bands — score once
    )
    j = cand.join(
        sig.select(
            F.col("doc_id").alias("id_a"),
            F.col("ts").alias("ts_a"),
            F.col("mh").alias("mh_a"),
        ),
        "id_a",
    ).join(
        sig.select(
            F.col("doc_id").alias("id_b"),
            F.col("ts").alias("ts_b"),
            F.col("mh").alias("mh_b"),
        ),
        "id_b",
    )
    est = None
    for i in range(1, 5):
        term = F.when(
            F.element_at("mh_a", i) == F.element_at("mh_b", i), F.lit(1)
        ).otherwise(F.lit(0))
        est = term if est is None else est + term
    est = est / 4.0
    exact = F.round(jaccard(F.col("ts_a"), F.col("ts_b")), 4)
    return j.select(
        "id_a",
        "id_b",
        F.round(est, 4).alias("est_jaccard"),
        exact.alias("exact_jaccard"),
        F.round(F.abs(est - exact), 4).alias("abs_err"),
    ).where((F.col("exact_jaccard") >= 0.2) | (F.col("est_jaccard") >= 0.25))


@query(
    "emb1_norm_profile",
    """
    WITH n AS (
      SELECT label,
             sqrt(list_sum(list_transform(embedding,
                                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               AS nrm
      FROM embeddings
    )
    SELECT label, count(*) AS n_vecs,
           round(avg(nrm), 4) AS avg_norm,
           round(min(nrm), 4) AS min_norm,
           round(max(nrm), 4) AS max_norm,
           CAST(sum(CASE WHEN nrm < 1e-6 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_degenerate
    FROM n GROUP BY label
    """,
)
def emb1_norm_profile(spark, sf_dir):
    """Embedding-quality gate: per-label L2-norm profile plus a
    degenerate (near-zero) vector count — collapsed or unnormalized
    embeddings are the silent killer of cosine-based dedup and ANN, so
    this runs BEFORE any similarity job. The norm is a sequential
    left-fold over the array (F.aggregate) — identical evaluation order
    to DuckDB's list_sum, so even the floating point matches; one scan,
    one partial-aggregated shuffle on label."""
    e = t(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    n = e.select("label", F.sqrt(sq).alias("nrm"))
    return n.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg("nrm"), 4).alias("avg_norm"),
        F.round(F.min("nrm"), 4).alias("min_norm"),
        F.round(F.max("nrm"), 4).alias("max_norm"),
        F.sum(F.when(F.col("nrm") < 1e-6, 1).otherwise(0))
        .cast("bigint")
        .alias("n_degenerate"),
    )


@query(
    "emb2_dimension_drift",
    """
    WITH d AS (
      SELECT gs.i - 1 AS dim, CAST(embedding[gs.i] AS DOUBLE) AS x
      FROM embeddings, generate_series(1, 8) AS gs(i)
      WHERE gs.i <= len(embedding)
    )
    SELECT dim, count(*) AS n,
           round(avg(x), 4) AS mean_x,
           round(stddev_samp(x), 4) AS std_x
    FROM d GROUP BY dim
    """,
)
def emb2_dimension_drift(spark, sf_dir):
    """Per-dimension mean/std over the first 8 embedding dimensions —
    the drift fingerprint you compare across ingestion batches to catch
    a swapped model or a broken normalizer (any dimension whose mean
    jumps is a red flag). posexplode carries (dim, value) pairs so the
    shuffle holds 8 doubles per vector, not the vector; the aggregate is
    map-side partial. Works at any dimensionality because the explode is
    pre-filtered to the profiled prefix."""
    e = t(spark, sf_dir, "embeddings")
    d = e.select(
        F.posexplode(F.slice(F.col("embedding"), 1, 8)).alias("dim", "x")
    ).select("dim", F.col("x").cast("double").alias("x"))
    return d.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("x"), 4).alias("mean_x"),
        F.round(F.stddev_samp("x"), 4).alias("std_x"),
    )


@query(
    "emb3_matryoshka_fidelity",
    """
    WITH p AS (
      SELECT a.vec_id,
             round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])), 6)
               AS c_full,
             round(list_cosine_similarity(CAST(a.embedding[1:8] AS DOUBLE[]),
                                          CAST(b.embedding[1:8] AS DOUBLE[])), 6)
               AS c8,
             round(list_cosine_similarity(CAST(a.embedding[1:16] AS DOUBLE[]),
                                          CAST(b.embedding[1:16] AS DOUBLE[])), 6)
               AS c16,
             round(list_cosine_similarity(CAST(a.embedding[1:32] AS DOUBLE[]),
                                          CAST(b.embedding[1:32] AS DOUBLE[])), 6)
               AS c32
      FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
    ), e AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CAST(round(1e6 * abs(c_full - c8))  AS BIGINT)) AS BIGINT) AS s8,
             CAST(max(CAST(round(1e6 * abs(c_full - c8))  AS BIGINT)) AS BIGINT) AS x8,
             CAST(sum(CAST(round(1e6 * abs(c_full - c16)) AS BIGINT)) AS BIGINT) AS s16,
             CAST(max(CAST(round(1e6 * abs(c_full - c16)) AS BIGINT)) AS BIGINT) AS x16,
             CAST(sum(CAST(round(1e6 * abs(c_full - c32)) AS BIGINT)) AS BIGINT) AS s32,
             CAST(max(CAST(round(1e6 * abs(c_full - c32)) AS BIGINT)) AS BIGINT) AS x32
      FROM p
    )
    SELECT CAST(8  AS INT) AS prefix_len, n_pairs,
           s8  // n_pairs AS mean_abs_err_ppm, x8  AS max_abs_err_ppm FROM e
    UNION ALL
    SELECT CAST(16 AS INT), n_pairs, s16 // n_pairs, x16 FROM e
    UNION ALL
    SELECT CAST(32 AS INT), n_pairs, s32 // n_pairs, x32 FROM e
    """,
)
def emb3_matryoshka_fidelity(spark, sf_dir):
    """Matryoshka-style prefix-truncation fidelity (Kusupati et al.
    2022): how much cosine similarity moves when vectors are truncated
    to their first 8/16/32 dimensions — the measurement behind the
    standard ANN cost cut of indexing a prefix and re-ranking on the
    full vector. Pairs are the deterministic (vec_id, vec_id+1)
    chain — a co-partitioned sort-merge self-join that stays linear at
    any corpus size (no sampling noise, no quadratic stage). Errors are
    quantized to integer ppm BEFORE aggregation so the distributed sums
    are order-free exact; all three prefixes fold in ONE pass over the
    joined frame (wide aggregate, then a 3-row unpivot — the stack
    carries 9 scalars, never the data)."""
    from es_to_clickhouse_spark.operators.similarity import dot, norm

    e = t(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id"), F.col("embedding").alias("_ea"))
    b = e.select(
        (F.col("vec_id") - 1).alias("vec_id"), F.col("embedding").alias("_eb")
    )
    j = a.join(b, "vec_id")

    def cos(col_a, col_b, p=None):
        va = F.slice(col_a, 1, p) if p else col_a
        vb = F.slice(col_b, 1, p) if p else col_b
        va, vb = va.cast("array<double>"), vb.cast("array<double>")
        return F.round(dot(va, vb) / (norm(va) * norm(vb)), 6)

    ea, eb = F.col("_ea"), F.col("_eb")
    # Fold each cosine ONCE (r15): the error projection references the
    # full-vector cosine in all three prefix errors, and the
    # construction inlined its dot+norm folds 3x — interpreted HOF
    # lambdas get no cross-expression CSE (the simhash16 lesson), so
    # every pair paid the full-dim fold three times. Project the four
    # cosines as columns behind a lazy checkpoint barrier (the txt21
    # device — without the barrier CollapseProject may re-inline), then
    # difference the columns: identical values (each cosine is rounded
    # to 6 digits BEFORE the difference, exactly as before), ~2.4x less
    # fold work per pair at dim 64 and ~3x at real dims.
    cosines = j.select(
        cos(ea, eb).alias("_cf"),
        *[cos(ea, eb, p).alias(f"_c{p}") for p in (8, 16, 32)],
    ).localCheckpoint(eager=False)
    errs = cosines.select(
        *[
            F.round(1e6 * F.abs(F.col("_cf") - F.col(f"_c{p}")))
            .cast("bigint")
            .alias(f"_e{p}")
            for p in (8, 16, 32)
        ]
    )
    wide = errs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        *[
            agg(f"_e{p}").alias(f"{tag}{p}")
            for p in (8, 16, 32)
            for agg, tag in ((F.sum, "s"), (F.max, "x"))
        ],
    )
    return wide.selectExpr(
        "stack(3, 8, n_pairs, s8 div n_pairs, x8,"
        " 16, n_pairs, s16 div n_pairs, x16,"
        " 32, n_pairs, s32 div n_pairs, x32)"
        " as (prefix_len, n_pairs, mean_abs_err_ppm, max_abs_err_ppm)"
    )


@query(
    "emb4_quantization_error",
    """
    WITH b AS (
      SELECT label,
             CAST(embedding AS DOUBLE[]) AS v,
             list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                     x -> abs(x))) AS s
      FROM embeddings
    ), q AS (
      SELECT label, v,
             list_transform(v, x -> round(x * 127.0 / s)) AS qv
      FROM b WHERE s > 0
    ), e AS (
      SELECT label,
             CAST(round(1e6 * (1 - list_cosine_similarity(v, qv)))
               AS BIGINT) AS err
      FROM q
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(sum(err) // count(*) AS BIGINT) AS mean_err_ppm,
           CAST(max(err) AS BIGINT) AS max_err_ppm
    FROM e GROUP BY label
    """,
)
def emb4_quantization_error(spark, sf_dir):
    """INT8 symmetric-quantization fidelity audit: quantize every
    embedding to q_i = round(127 * x_i / max|x|) and report, per label,
    the cosine error between the vector and its own quantized form —
    the go/no-go measurement behind shipping int8 vectors (4x smaller
    scans, 4x less shuffle) for a 100 TB embedding store. The
    per-vector scale cancels in the cosine, so the error needs only
    (v, q) — no dequantized copy is materialized. Errors quantize to
    integer ppm BEFORE aggregation (order-free exact sums — the emb3 /
    a21 float lesson); everything is one map-side projection plus a
    |labels|-row groupBy, linear at any corpus size with no shuffle of
    vector payloads."""
    from es_to_clickhouse_spark.operators.similarity import dot, norm

    e = t(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    base = (
        e.select("label", v.alias("_v"))
        .withColumn(
            "_s", F.array_max(F.transform("_v", lambda x: F.abs(x)))
        )
        .where(F.col("_s") > 0)
    )
    qv = F.transform(
        "_v", lambda x: F.round(x * F.lit(127.0) / F.col("_s"))
    )
    cos = dot(F.col("_v"), F.col("_q")) / (
        norm(F.col("_v")) * norm(F.col("_q"))
    )
    err = F.round(F.lit(1e6) * (F.lit(1.0) - cos)).cast("bigint")
    return (
        base.withColumn("_q", qv)
        .select("label", err.alias("_e"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.expr("sum(_e) div count(1)").cast("bigint")
            .alias("mean_err_ppm"),
            F.max("_e").alias("max_err_ppm"),
        )
    )


@query(
    "f23_url_parse",
    """
    SELECT doc_id,
           'cdn.example.com' AS host,
           '/' || lang || '/doc/' || CAST(doc_id AS VARCHAR) AS path,
           source AS src,
           CAST(doc_id % 100 AS VARCHAR) AS page
    FROM documents
    """,
)
def f23_url_parse(spark, sf_dir):
    """URL decomposition (host / path / query parameters) with Spark's
    built-in parse_url — log and clickstream tables carry URLs in
    nearly every real ES index the reference migrates. URLs are
    synthesized per row from document fields and the oracle is ground
    truth from the construction, so parse_url must actually invert the
    encoding (host, path, and two query params). Pure codegen
    expressions — a petabyte URL-normalization pass stays JVM-side."""
    d = t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://cdn.example.com/"),
        F.col("lang"),
        F.lit("/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("?src="),
        F.col("source"),
        F.lit("&page="),
        (F.col("doc_id") % 100).cast("string"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("src")).alias("src"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("page")).alias("page"),
    )


@query(
    "ts6_cross_correlation",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS DECIMAL(20,0)) AS x,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS DECIMAL(20,0)) AS y
      FROM events GROUP BY 1
    ), s AS (
      SELECT CAST(count(*) AS DECIMAL(20,0)) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      FROM daily
    )
    SELECT round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS view_click_corr
    FROM s
    """,
)
def ts6_cross_correlation(spark, sf_dir):
    """Pearson correlation between daily view volume and daily click
    volume, decomposed into EXACT decimal sums (same technique as a18's
    regression): integer counts accumulate in DECIMAL so partial-
    aggregation order cannot move the result, and the one-row corr
    formula runs in double with a fixed expression order — unlike the
    built-in float `corr`, whose double sums drift with parallelism.
    Two map-side-combinable aggregates, no window, no per-row state."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("decimal(20,0)")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("decimal(20,0)")
        .alias("y"),
    )
    s = daily.agg(
        F.count(F.lit(1)).cast("decimal(20,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy, sxy, sxx, syy = (
        F.col(c).cast("double") for c in ("n", "sx", "sy", "sxy", "sxx", "syy")
    )
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return s.select(F.round(corr, 6).alias("view_click_corr"))


@query(
    "sim6_knn_graph",
    """
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qe FROM embeddings
      ORDER BY ('0x'||substr(md5('knn6'||CAST(vec_id AS VARCHAR)),1,8))::BIGINT,
               vec_id
      LIMIT 24
    ), p AS (
      SELECT q.qid, e.vec_id AS neighbor_id,
             list_sum(list_transform(generate_series(1, len(e.embedding)),
                      i -> CAST(e.embedding[i] AS DOUBLE)
                           * CAST(q.qe[i] AS DOUBLE))) AS dot,
             list_sum(list_transform(e.embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS na,
             list_sum(list_transform(q.qe,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nb
      FROM embeddings e, q
      WHERE e.vec_id != q.qid
    ), scored AS (
      SELECT qid, neighbor_id,
             CAST(floor(dot / (sqrt(na) * sqrt(nb)) * 1000000) AS BIGINT)
               AS cos_ppm
      FROM p
    ), ranked AS (
      SELECT qid, neighbor_id, cos_ppm,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos_ppm DESC, neighbor_id) AS rnk
      FROM scored
    )
    SELECT qid, neighbor_id, cos_ppm, rnk FROM ranked WHERE rnk <= 3
    """,
)
def sim6_knn_graph(spark, sf_dir):
    """Exact k-NN graph (top-3 cosine neighbors per sampled query
    vector) — the substrate for graph-based dedup clustering and
    embedding-space QA. The probe set is a FIXED-SIZE deterministic
    sample (VERDICT r10: the old ``vec_id % 25`` predicate grew the
    probe set linearly with the corpus, making the probe x corpus
    scoring stage O(N^2/25) — its 100x decade pass did not finish):
    the 24 vectors with the smallest salted md5 hash, tie-broken by id
    (hash order = reproducible uniform order; DuckDB computes the same
    hash bit-for-bit, corpus/sketch._DUCK_H32). Spark evaluates the
    selection as a distributed TakeOrdered top-K — no global sort, no
    single-task window — and the probe side then broadcasts (sim1's
    allowlisted pattern), so the scoring stage is O(24·N): the probe
    cost is CONSTANT in corpus size and the big side streams. Scoring
    is a map-side zip_with dot product with the SAME sequential fold
    order as DuckDB's list_sum, and ranking happens on FLOORED integer
    ppm (ts5's lesson: never rank or compare cross-engine on rounded
    doubles), tie-broken by neighbor id, so the graph is bit-stable.

    Two measured r5 fixes (2.95 s -> 0.73 s at sf0.1, output
    byte-identical): (1) each vector's squared norm folds ONCE per row
    BEFORE the cross join instead of once per PAIR (the fold order per
    vector is unchanged, so the floats are bit-equal); (2) a pinned
    repartition on the probe-carrying side — the single-file source
    scans as ONE partition and a broadcast-join subtree never shuffles,
    so all 24 x N fold work otherwise lands on one task, invisible to
    AQE because the cost is compute, not bytes (the d5/d12 root cause,
    VERDICT r4)."""
    from es_to_clickhouse_spark.operators.sketch import hash32

    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def sq(a):
        return F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )

    e2 = e.select("vec_id", "embedding", sq(F.col("embedding")).alias("na"))
    e2 = e2.repartition(spark.sparkContext.defaultParallelism)
    q = (
        e.select("vec_id", "embedding", hash32(F.col("vec_id"), "knn6").alias("_hv"))
        .orderBy("_hv", "vec_id")
        .limit(24)  # fixed probe budget: scoring stays O(24·N) at any SF
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qe"),
            sq(F.col("embedding")).alias("nb"),
        )
    )
    p = (
        e2.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            dot(F.col("embedding"), F.col("qe")).alias("dot"),
            "na",
            "nb",
        )
    )
    scored = p.select(
        "qid",
        "neighbor_id",
        F.floor(
            F.col("dot") / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb"))) * 1000000
        )
        .cast("bigint")
        .alias("cos_ppm"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_ppm").desc(), "neighbor_id")
    return (
        scored.select("*", F.row_number().over(w).alias("rnk"))
        .where(F.col("rnk") <= 3)
    )


@query(
    "dq6_json_key_profile",
    """
    WITH kv AS (
      SELECT event_id, user_id,
             unnest(json_keys(props)) AS k,
             props
      FROM events WHERE props IS NOT NULL
    ), v AS (
      SELECT event_id, user_id, k,
             CAST(json_extract(props, '$.' || k) AS VARCHAR) AS val
      FROM kv
    )
    SELECT k, count(*) AS n_rows,
           count(DISTINCT val) AS n_vals,
           min(val) AS min_val, max(val) AS max_val,
           count(DISTINCT user_id) AS n_users
    FROM v GROUP BY k
    """,
)
def dq6_json_key_profile(spark, sf_dir):
    """Semi-structured profiling: every key appearing in the `props`
    JSON column with row count, distinct-value count, min/max (as raw
    JSON scalars — min/max are lexicographic on the rendered value, the
    honest contract for mixed-type JSON), and distinct users — the
    query that tells you what schema is hiding inside a schemaless
    column before you promote keys to real columns (the reference's
    detect_new_fields, es/es_to_bytehouse.py:1043-1051, does this
    row-by-row in Python; here it's one explode + TWO-LEVEL aggregates,
    JVM-side json_object_keys / get_json_object).

    Why two-level: a schemaless column routinely carries FEW distinct
    keys over MANY rows (here: one), so a single
    groupBy(k).agg(countDistinct(...)) funnels the whole corpus through
    one reducer group — measured 12.3x at 10x data (SCALE_BENCH r8).
    Pre-grouping by (k, val) / (k, user_id) makes the distinct work a
    partial-aggregable count over high-cardinality keys that spreads
    across the cluster regardless of how few JSON keys exist; the
    second level then sees one row per distinct value, so
    count(val) == countDistinct(val) and sum of the group counts
    reconstructs count(*) exactly (NULL vals form their own group,
    counted in n_rows, excluded from n_vals — matching SQL count
    semantics bit-for-bit)."""
    e = t(spark, sf_dir, "events").where(F.col("props").isNotNull())
    kv = e.select(
        "user_id",
        "props",
        F.explode(F.json_object_keys("props")).alias("k"),
    )
    v = kv.select(
        "user_id",
        "k",
        F.expr("get_json_object(props, concat('$.', k))").alias("val"),
    )
    vals = (
        v.groupBy("k", "val")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("k")
        .agg(
            F.sum("_c").alias("n_rows"),
            F.count("val").alias("n_vals"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
        )
    )
    users = (
        v.groupBy("k", "user_id")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("k")
        .agg(F.count("user_id").alias("n_users"))
    )
    return vals.join(users, "k").select(
        "k", "n_rows", "n_vals", "min_val", "max_val", "n_users"
    )


@query(
    "b5_session_duration_stats",
    """
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts,
             CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS sess_id
      FROM g
    ), sess AS (
      SELECT user_id, sess_id,
             CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS dur_us,
             count(*) AS n_events
      FROM s GROUP BY user_id, sess_id
    )
    , agg AS (
      SELECT list_sort(list(dur_us)) AS arr, count(*) AS n,
             sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS bounces
      FROM sess
    )
    SELECT CAST(n AS BIGINT) AS n_sessions,
           CAST(bounces AS BIGINT) AS n_bounces,
           CAST(arr[greatest(CAST(ceil(n * 0.5) AS INT), 1)] AS BIGINT)
             AS p50_dur_us,
           CAST(arr[greatest(CAST(ceil(n * 0.95) AS INT), 1)] AS BIGINT)
             AS p95_dur_us,
           CAST(arr[CAST(n AS INT)] AS BIGINT) AS max_dur_us
    FROM agg
    """,
)
def b5_session_duration_stats(spark, sf_dir):
    """Session-quality rollup over batch sessionization (t9's 30-min-gap
    sessions): corpus-wide session count, bounce count (single-event
    sessions), and DISCRETE p50/p95/max duration. Events reduce to one
    row per session first (one user_id shuffle shared with the session
    windows), so the final stats run over session-level rows only. The
    discrete quantile selects by identical ceil(q*n) index arithmetic
    on both engines — exact and immune to interpolation/rounding drift.
    The sorted-list selection at the end is the oracle-comparable form;
    at billions of sessions the single array cell is the hazard — the
    implemented swap is sk8_session_p95_sketch (corpus/sketch.py): the
    same session plan feeding rollup.py's mergeable bottom-k quantile
    sample, oracle-checked and incrementally maintainable."""
    from es_to_clickhouse_spark.functions import epoch_micros

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e = t(spark, sf_dir, "events")
    g = e.select(
        "user_id", "ts", "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (epoch_micros(F.col("ts")) - epoch_micros(F.lag("ts").over(w))
               > 1800 * 1000000),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("new_sess"),
    )
    s = g.select(
        "user_id", "ts",
        F.sum("new_sess").over(wsum).cast("long").alias("sess_id"),
    )
    sess = s.groupBy("user_id", "sess_id").agg(
        (epoch_micros(F.max("ts")) - epoch_micros(F.min("ts"))).alias("dur_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    # discrete (type-1) quantile: value at ceil(q*n) in the sorted list —
    # exact integer selection, immune to interpolation/rounding drift;
    # the identical index arithmetic runs on both engines
    agg = sess.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_bounces"),
        F.sort_array(F.collect_list("dur_us")).alias("_arr"),
    )
    arr = F.col("_arr")
    n = F.size(arr)

    def qdisc(q):
        idx = F.greatest(F.ceil(n * q).cast("int"), F.lit(1))
        return F.element_at(arr, idx).cast("bigint")

    return agg.select(
        "n_sessions",
        "n_bounces",
        qdisc(0.5).alias("p50_dur_us"),
        qdisc(0.95).alias("p95_dur_us"),
        F.element_at(arr, n).cast("bigint").alias("max_dur_us"),
    )


@query(
    "f24_string_functions",
    """
    SELECT doc_id,
           upper(substr(text, 1, 1)) || lower(substr(text, 2, 19))
             AS cap20,
           reverse(lang) AS rev_lang,
           translate(lang, 'aeiou', '01234') AS vowel_coded,
           lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
           split_part(source, '-', 1) AS source_head,
           repeat(lang, 2) AS lang2,
           left(text, 5) AS head5,
           right(text, 5) AS tail5
    FROM documents
    """,
)
def f24_string_functions(spark, sf_dir):
    """String-function battery (capitalize / reverse / translate / lpad /
    split_part / repeat / left / right) — the everyday normalization
    vocabulary of ingestion SQL, each verified byte-for-byte against
    DuckDB's implementation. All codegen expressions; a petabyte
    string-normalization pass never leaves the JVM."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.concat(
            F.upper(F.substring("text", 1, 1)),
            F.lower(F.substring("text", 2, 19)),
        ).alias("cap20"),
        F.reverse("lang").alias("rev_lang"),
        F.translate("lang", "aeiou", "01234").alias("vowel_coded"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.split_part("source", F.lit("-"), F.lit(1)).alias("source_head"),
        F.repeat("lang", 2).alias("lang2"),
        F.left("text", F.lit(5)).alias("head5"),
        F.right("text", F.lit(5)).alias("tail5"),
    )


@query(
    "mm8_gif_header_decode",
    """
    SELECT doc_id AS asset_id,
           CAST(n_chars % 1600 + 1 AS BIGINT) AS width,
           CAST((3 * n_chars) % 900 + 1 AS BIGINT) AS height
    FROM documents
    """,
)
def mm8_gif_header_decode(spark, sf_dir):
    """GIF Logical Screen Descriptor decode (third container format
    after PNG big-endian and WAV little-endian): magic-gated
    little-endian uint16 width/height. Synthetic GIF89a headers vary
    per row; the oracle is ground truth from the construction formulas
    (operators/multimodal.gif_dims must invert the LE byte order)."""
    from es_to_clickhouse_spark.operators.multimodal import gif_dims

    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w = F.col("n_chars") % 1600 + 1
    h = (F.col("n_chars") * 3) % 900 + 1
    # little-endian u16 hex: low byte then high byte
    def le16(v):
        return F.concat(
            F.lpad(F.hex(v % 256), 2, "0"), F.lpad(F.hex(F.floor(v / 256)), 2, "0")
        )

    payload = F.unhex(
        F.concat(
            F.lit("474946383961"),  # 'GIF89a'
            le16(w), le16(h),
            F.lit("F7000000"),  # packed fields, bg index, aspect
        )
    )
    assets = docs.select(F.col("doc_id").alias("asset_id"), payload.alias("payload"))
    gw, gh = gif_dims(F.col("payload"))
    return assets.select("asset_id", gw.alias("width"), gh.alias("height"))


@query(
    "w15_activity_streaks",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), grp AS (
      SELECT user_id, d,
             CAST(d - INTERVAL (row_number() OVER
                    (PARTITION BY user_id ORDER BY d)) DAY AS DATE) AS anchor
      FROM days
    )
    SELECT user_id,
           strftime(min(d), '%Y-%m-%d') AS streak_start,
           strftime(max(d), '%Y-%m-%d') AS streak_end,
           count(*) AS len_days
    FROM grp GROUP BY user_id, anchor
    """,
)
def w15_activity_streaks(spark, sf_dir):
    """Gaps-and-islands: maximal runs of CONSECUTIVE active days per
    user (the streak feature behind retention and habit metrics). The
    classic trick — date minus row_number is constant within a
    consecutive run — turns streak detection into one distinct + one
    window + one groupBy, all sharing the user_id shuffle; no self-join,
    no iteration, no per-row state."""
    days = (
        t(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.select(
        "user_id",
        "d",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("anchor"),
    )
    return grp.groupBy("user_id", "anchor").agg(
        F.date_format(F.min("d"), "yyyy-MM-dd").alias("streak_start"),
        F.date_format(F.max("d"), "yyyy-MM-dd").alias("streak_end"),
        F.count(F.lit(1)).alias("len_days"),
    ).drop("anchor")


@query(
    "dq7_null_drift_by_day",
    """
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           count(*) AS n,
           CAST(count(*) - count(user_id) AS BIGINT) AS null_user,
           CAST(count(*) - count(value) AS BIGINT) AS null_value,
           CAST(count(*) - count(props) AS BIGINT) AS null_props,
           CAST(count(*) - count(event_type) AS BIGINT) AS null_type
    FROM events
    GROUP BY CAST(ts AS DATE)
    """,
)
def dq7_null_drift_by_day(spark, sf_dir):
    """Completeness drift: per-day null counts for every nullable
    column — the time axis dq2's whole-table profile lacks. A column
    whose null count jumps on one day pinpoints the broken producer
    deploy; integer counts make the check exact at any parallelism.
    One scan, one map-side-combinable aggregate keyed on day."""
    e = t(spark, sf_dir, "events")
    day = F.to_date("ts").alias("d")
    n = F.count(F.lit(1))
    return (
        e.groupBy(day)
        .agg(
            n.alias("n"),
            (n - F.count("user_id")).cast("bigint").alias("null_user"),
            (n - F.count("value")).cast("bigint").alias("null_value"),
            (n - F.count("props")).cast("bigint").alias("null_props"),
            (n - F.count("event_type")).cast("bigint").alias("null_type"),
        )
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "n", "null_user", "null_value", "null_props", "null_type",
        )
    )


@query(
    "dq9_benford_drift",
    """
    WITH d AS (
      SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                            1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ), c AS (
      SELECT digit, count(*) AS n FROM d GROUP BY digit
    ), tot AS (
      SELECT CAST(sum(n) AS DOUBLE) AS t FROM c
    )
    SELECT digit, CAST(n AS BIGINT) AS n,
           CAST(floor(n * 1000000.0 / (SELECT t FROM tot)) AS BIGINT)
             AS share_ppm,
           CAST(round(log10(1.0 + 1.0 / digit) * 1000000) AS BIGINT)
             AS benford_ppm,
           CAST(floor(n * 1000000.0 / (SELECT t FROM tot))
                - round(log10(1.0 + 1.0 / digit) * 1000000) AS BIGINT)
             AS drift_ppm
    FROM c
    """,
)
def dq9_benford_drift(spark, sf_dir):
    """Benford first-digit drift — the fraud/synthetic-data smell test:
    observed leading-digit shares of order totals vs the Benford
    expectation log10(1 + 1/d), in exact ppm (integer share math;
    only the 9 constant expectations touch a float log, rounded
    identically). One partial-agg scan + a 9-row reduction; the total
    is a 1-row broadcast. TPC-H prices are uniform-ish, so the drift
    column is large and NEGATIVE for digit 1 — the point of the
    profile is surfacing exactly such distribution mismatches."""
    d = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor("o_totalprice").cast("long").cast("string"), 1, 1
            )
            .cast("long")
            .alias("digit")
        )
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = c.agg(F.sum("n").cast("double").alias("t"))
    benford = F.round(F.log10(1.0 + 1.0 / F.col("digit")) * 1000000).cast("long")
    share = F.floor(F.col("n") * 1000000.0 / F.col("t")).cast("long")
    return c.crossJoin(F.broadcast(tot)).select(
        "digit",
        F.col("n").cast("long").alias("n"),
        share.alias("share_ppm"),
        benford.alias("benford_ppm"),
        (share - benford).cast("long").alias("drift_ppm"),
    )


@query(
    "ts11_theilsen_trend",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), idx AS (
      SELECT event_type, n,
             CAST(date_diff('day', DATE '2024-01-01', d) AS BIGINT) AS x
      FROM daily
    ), slopes AS (
      SELECT a.event_type,
             CAST(b.n - a.n AS DOUBLE) / (b.x - a.x) AS slope
      FROM idx a JOIN idx b
        ON a.event_type = b.event_type AND a.x < b.x
    ), ranked AS (
      SELECT event_type, slope,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY slope, event_type) AS rn,
             count(*) OVER (PARTITION BY event_type) AS m
      FROM slopes
    )
    SELECT event_type, CAST(min(m) AS BIGINT) AS n_slopes,
           round(avg(slope), 6) AS theilsen_slope
    FROM ranked
    WHERE rn IN ((m + 1) // 2, (m + 2) // 2)
    GROUP BY event_type
    """,
)
def ts11_theilsen_trend(spark, sf_dir):
    """Theil–Sen robust trend of the daily event rate per type: the
    MEDIAN of all pairwise slopes (n_j − n_i)/(x_j − x_i) — immune to
    the outlier days that wreck a least-squares slope (a18's
    regression aggs are the fragile baseline this replaces when data
    is dirty). The pairwise stage is quadratic in DAYS (30 days → 435
    pairs per type — bounded by time span, not row count; at 100 TB
    the day-count is unchanged), keyed per type so the self-join never
    crosses groups. Median = avg of the two middle ranks ((m+1)//2,
    (m+2)//2 — equal when m is odd), deterministic via the (slope,
    type) total order; slope division is one identical double op per
    pair on exact integer inputs."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    idx = daily.select(
        "event_type",
        "n",
        F.datediff(F.col("d"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("x"),
    )
    a = idx.select(
        "event_type", F.col("n").alias("na"), F.col("x").alias("xa")
    )
    b = idx.select(
        "event_type", F.col("n").alias("nb"), F.col("x").alias("xb")
    )
    slopes = (
        a.join(b, "event_type")
        .where(F.col("xa") < F.col("xb"))
        .select(
            "event_type",
            (
                (F.col("nb") - F.col("na")).cast("double")
                / (F.col("xb") - F.col("xa"))
            ).alias("slope"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("slope", "event_type")
    wc = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("m"),
    )
    mid = ranked.where(
        (F.col("rn") == F.floor((F.col("m") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("m") + 2) / 2))
    )
    return mid.groupBy("event_type").agg(
        F.min("m").cast("long").alias("n_slopes"),
        F.round(F.avg("slope"), 6).alias("theilsen_slope"),
    )


@query(
    "w19_gini_doc_length",
    """
    WITH r AS (
      SELECT source, CAST(n_chars AS BIGINT) AS x,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS i,
             count(*) OVER (PARTITION BY source) AS n,
             sum(CAST(n_chars AS BIGINT)) OVER (PARTITION BY source) AS tot
      FROM documents
    ), s AS (
      SELECT source, CAST(min(n) AS BIGINT) AS n_docs,
             CAST(min(tot) AS BIGINT) AS total_chars,
             CAST(sum(i * x) AS BIGINT) AS weighted
      FROM r GROUP BY source
    )
    SELECT source, n_docs, total_chars,
           round(CAST(2 * weighted AS DOUBLE)
                   / (CAST(n_docs AS DOUBLE) * CAST(total_chars AS DOUBLE))
                 - (CAST(n_docs AS DOUBLE) + 1.0) / CAST(n_docs AS DOUBLE),
                 6) AS gini
    FROM s
    """,
)
def w19_gini_doc_length(spark, sf_dir):
    """Gini coefficient of document length per source — the dataset-
    balance audit (a source whose token mass concentrates in a few
    giant documents behaves differently under packing/sampling than
    its doc count suggests; Lorenz-curve inequality is the standard
    one-number summary). Exact-rank formulation G = 2·Σ(i·x_i)/(n·Σx)
    − (n+1)/n over the ascending sort: every sum is bigint-exact (rank
    and length are integers), ONE source-keyed window sort shared by
    rank/count/total, and only the final three-op float expression —
    identical on both engines — touches doubles."""
    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wp = Window.partitionBy("source")
    r = d.select(
        "source",
        F.col("n_chars").cast("long").alias("x"),
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum(F.col("n_chars").cast("long")).over(wp).alias("tot"),
    )
    s = r.groupBy("source").agg(
        F.min("n").cast("long").alias("n_docs"),
        F.min("tot").cast("long").alias("total_chars"),
        F.sum(F.col("i") * F.col("x")).cast("long").alias("weighted"),
    )
    return s.select(
        "source",
        "n_docs",
        "total_chars",
        F.round(
            (2 * F.col("weighted")).cast("double")
            / (F.col("n_docs").cast("double") * F.col("total_chars").cast("double"))
            - (F.col("n_docs").cast("double") + 1.0)
            / F.col("n_docs").cast("double"),
            6,
        ).alias("gini"),
    )


@query(
    "pk3_greedy_bins",
    """
    WITH RECURSIVE d AS (
      SELECT source, doc_id,
             CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
               AS BIGINT) AS toks
      FROM documents
    ), ser AS (
      SELECT source, toks,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS i
      FROM d
    ), cnt AS (
      SELECT source, count(*) AS m, sum(toks) AS tot FROM ser GROUP BY source
    ), pack(source, i, fill, bins) AS (
      SELECT source, 1, toks, CAST(1 AS BIGINT) FROM ser WHERE i = 1
      UNION ALL
      SELECT s.source, s.i,
             CASE WHEN p.fill + s.toks <= 512 THEN p.fill + s.toks
                  ELSE s.toks END,
             CASE WHEN p.fill + s.toks <= 512 THEN p.bins
                  ELSE p.bins + 1 END
      FROM pack p JOIN ser s ON s.source = p.source AND s.i = p.i + 1
    )
    SELECT p.source, CAST(c.m AS BIGINT) AS n_docs,
           CAST(c.tot AS BIGINT) AS total_tokens,
           CAST(p.bins AS BIGINT) AS n_bins,
           CAST((c.tot + 511) // 512 AS BIGINT) AS lower_bound,
           round(CAST(c.tot AS DOUBLE) / (p.bins * 512), 4) AS fill_ratio
    FROM pack p JOIN cnt c ON p.source = c.source
    WHERE p.i = c.m
    """,
)
def pk3_greedy_bins(spark, sf_dir):
    """Greedy NO-SPLIT context packing (next-fit, the complement of
    pk1's concat-then-chop): documents in arrival order go into the
    current 512-token bin until one doesn't fit, which opens the next —
    no document ever straddles a window (the padding-free packing used
    when truncation is unacceptable). Output per source: bins used vs
    the ceil(total/512) lower bound and the realized fill ratio — the
    padding-waste audit next-fit pays for preserving documents. The
    sequential recurrence folds per source with a struct accumulator
    (ALL integer arithmetic — exact on any engine); the oracle states
    it as a recursive CTE (ts9/ts10 machinery)."""
    from es_to_clickhouse_spark.operators.text import tokens

    n = spark.sparkContext.defaultParallelism
    d = t(spark, sf_dir, "documents").repartition(n).select(
        "source", "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("toks")
    )
    ser = d.groupBy("source").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("doc_id", "toks"))),
            lambda s: s["toks"],
        ).alias("arr"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").alias("total_tokens"),
    )

    def step(acc, x):
        fits = acc["fill"] + x <= 512
        return F.struct(
            F.when(fits, acc["fill"] + x).otherwise(x).alias("fill"),
            F.when(fits, acc["bins"]).otherwise(acc["bins"] + 1).alias("bins"),
        )

    fold = F.aggregate(
        F.slice(F.col("arr"), 2, F.size("arr") - 1),
        F.struct(
            F.element_at("arr", 1).alias("fill"),
            F.lit(1).cast("long").alias("bins"),
        ),
        step,
    )
    return ser.select(
        "source",
        "n_docs",
        "total_tokens",
        fold["bins"].alias("n_bins"),
        F.floor((F.col("total_tokens") + 511) / 512).cast("long").alias("lower_bound"),
        F.round(
            F.col("total_tokens").cast("double") / (fold["bins"] * 512), 4
        ).alias("fill_ratio"),
    )


@query(
    "dq10_psi_drift",
    """
    WITH ref AS (
      SELECT value FROM events WHERE CAST(ts AS DATE) < DATE '2024-01-08'
    ), cur AS (
      SELECT value FROM events WHERE CAST(ts AS DATE) >= DATE '2024-01-08'
    ), cuts AS (
      SELECT quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS q
      FROM ref
    ), rb AS (
      SELECT (CASE WHEN q[1] <= value THEN 1 ELSE 0 END
            + CASE WHEN q[2] <= value THEN 1 ELSE 0 END
            + CASE WHEN q[3] <= value THEN 1 ELSE 0 END
            + CASE WHEN q[4] <= value THEN 1 ELSE 0 END
            + CASE WHEN q[5] <= value THEN 1 ELSE 0 END
            + CASE WHEN q[6] <= value THEN 1 ELSE 0 END
            + CASE WHEN q[7] <= value THEN 1 ELSE 0 END
            + CASE WHEN q[8] <= value THEN 1 ELSE 0 END
            + CASE WHEN q[9] <= value THEN 1 ELSE 0 END) AS bin
      FROM ref, cuts
    ), cb AS (
      SELECT (CASE WHEN q[1] <= value THEN 1 ELSE 0 END
            + CASE WHEN q[2] <= value THEN 1 ELSE 0 END
            + CASE WHEN q[3] <= value THEN 1 ELSE 0 END
            + CASE WHEN q[4] <= value THEN 1 ELSE 0 END
            + CASE WHEN q[5] <= value THEN 1 ELSE 0 END
            + CASE WHEN q[6] <= value THEN 1 ELSE 0 END
            + CASE WHEN q[7] <= value THEN 1 ELSE 0 END
            + CASE WHEN q[8] <= value THEN 1 ELSE 0 END
            + CASE WHEN q[9] <= value THEN 1 ELSE 0 END) AS bin
      FROM cur, cuts
    ), rc AS (
      SELECT bin, count(*) AS n_ref FROM rb GROUP BY bin
    ), cc AS (
      SELECT bin, count(*) AS n_cur FROM cb GROUP BY bin
    ), tot AS (
      SELECT (SELECT CAST(count(*) AS DOUBLE) FROM rb) AS nr,
             (SELECT CAST(count(*) AS DOUBLE) FROM cb) AS nc
    ), terms AS (
      SELECT rc.bin, rc.n_ref, coalesce(cc.n_cur, 0) AS n_cur,
             CAST(round(
               (rc.n_ref / tot.nr
                - greatest(coalesce(cc.n_cur, 0) / tot.nc, 0.000001))
               * ln((rc.n_ref / tot.nr)
                    / greatest(coalesce(cc.n_cur, 0) / tot.nc, 0.000001))
               * 1000000) AS BIGINT) AS term_micro
      FROM rc LEFT JOIN cc ON rc.bin = cc.bin, tot
    )
    SELECT bin, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
           term_micro,
           round(CAST(sum(term_micro) OVER () AS DOUBLE) / 1000000, 4) AS psi
    FROM terms
    """,
)
def dq10_psi_drift(spark, sf_dir):
    """Population Stability Index between week 1 (reference) and the
    rest of the stream (current) over the value column — THE model-
    monitoring drift gate (PSI > 0.2 = retrain): exact reference
    deciles (pk2's broadcast-cuts pattern, no global ntile), both
    populations binned by the same cuts, and Σ(p−q)·ln(p/q) with each
    bin's term quantized to integer micro-nats so the final sum is
    order-free. Empty current-side bins ride the standard 1e-6 floor.
    Per-bin evidence rows carry the total alongside (a 10-row window
    sum — bounded by the bin count, not data)."""
    e = t(spark, sf_dir, "events")
    cut_date = F.lit("2024-01-08").cast("date")
    ref = e.where(F.to_date("ts") < cut_date).select("value")
    cur = e.where(F.to_date("ts") >= cut_date).select("value")
    cuts = ref.agg(
        F.expr(
            "percentile(value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"
        ).alias("q")
    )

    def binned(df):
        b = df.crossJoin(F.broadcast(cuts))
        expr = sum(
            F.when(F.element_at("q", i) <= F.col("value"), 1).otherwise(0)
            for i in range(1, 10)
        )
        return b.select(expr.alias("bin"))

    rc = binned(ref).groupBy("bin").agg(F.count(F.lit(1)).alias("n_ref"))
    cc = binned(cur).groupBy("bin").agg(F.count(F.lit(1)).alias("n_cur"))
    tot = rc.agg(F.sum("n_ref").cast("double").alias("nr")).crossJoin(
        cc.agg(F.sum("n_cur").cast("double").alias("nc"))
    )
    j = rc.join(cc, "bin", "left").crossJoin(F.broadcast(tot))
    p = F.col("n_ref") / F.col("nr")
    q = F.greatest(
        F.coalesce(F.col("n_cur"), F.lit(0)) / F.col("nc"), F.lit(0.000001)
    )
    terms = j.select(
        "bin",
        F.col("n_ref").cast("long").alias("n_ref"),
        F.coalesce(F.col("n_cur"), F.lit(0)).cast("long").alias("n_cur"),
        F.round((p - q) * F.log(p / q) * 1000000).cast("long").alias("term_micro"),
    )
    wall = Window.partitionBy()
    return terms.select(
        "*",
        F.round(
            F.sum("term_micro").over(wall).cast("double") / 1000000, 4
        ).alias("psi"),
    )


@query(
    "ts12_acf",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), ser AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type ORDER BY d) AS i
      FROM daily
    ), st AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM ser GROUP BY event_type
    ), lags AS (
      SELECT unnest([1, 2, 3]) AS k
    ), pr AS (
      SELECT a.event_type, lags.k,
             CAST(count(*) AS BIGINT) AS m,
             CAST(sum(a.x * b.x) AS BIGINT) AS axy,
             CAST(sum(a.x) AS BIGINT) AS bx,
             CAST(sum(b.x) AS BIGINT) AS cx
      FROM ser a
      CROSS JOIN lags
      JOIN ser b ON b.event_type = a.event_type AND b.i = a.i - lags.k
      GROUP BY a.event_type, lags.k
    )
    SELECT pr.event_type, CAST(pr.k AS BIGINT) AS lag,
           round(
             (axy - (CAST(sx AS DOUBLE) / n) * (bx + cx)
                  + m * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
             / (sxx - n * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)),
             6) AS acf
    FROM pr JOIN st ON pr.event_type = st.event_type
    """,
)
def ts12_acf(spark, sf_dir):
    """Sample autocorrelation of the daily event rate at lags 1–3 per
    type — the diagnostic that tells a forecaster whether yesterday
    predicts today (and whether ts3/ts9's smoothers have anything to
    smooth). Float discipline: EVERY distributed sum is an exact
    integer accumulator (Σx, Σx², Σx_t·x_{t−k}, pair counts); the mean
    and the ACF ratio are single scalar expressions evaluated once per
    (type, lag) row — no distributed double accumulation anywhere (the
    a21 lesson, institutionalized)."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    ser = daily.select(
        "event_type", "x", F.row_number().over(w).alias("i")
    )
    st = ser.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    lags = e.sparkSession.createDataFrame([(1,), (2,), (3,)], "k int")
    a = ser.select("event_type", F.col("x").alias("xa"), F.col("i").alias("ia"))
    b = ser.select(
        F.col("event_type").alias("et_b"),
        F.col("x").alias("xb"),
        F.col("i").alias("ib"),
    )
    pr = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("et_b") == F.col("event_type"))
            & (F.col("ib") == F.col("ia") - F.col("k")),
        )
        .groupBy("event_type", "k")
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.sum(F.col("xa") * F.col("xb")).alias("axy"),
            F.sum("xa").alias("bx"),
            F.sum("xb").alias("cx"),
        )
    )
    mean = F.col("sx").cast("double") / F.col("n")
    return pr.join(st, "event_type").select(
        "event_type",
        F.col("k").cast("long").alias("lag"),
        F.round(
            (F.col("axy") - mean * (F.col("bx") + F.col("cx")) + F.col("m") * mean * mean)
            / (F.col("sxx") - F.col("n") * mean * mean),
            6,
        ).alias("acf"),
    )
