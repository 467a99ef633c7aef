"""Corpus: streaming semantics as batch-checkable queries (SURVEY §2.9).

The reference's continuous loop is a 60 s poll (es/es_to_bytehouse.py:
1069-1102); its *semantics* — watermark commit, bootstrap window, late-data
re-fetch, windowed time aggregation — are expressible as deterministic
queries, which is how they're oracle-checked here. The live Structured
Streaming path (triggers, checkpoints) lives in
es_to_clickhouse_spark/streaming/ and is exercised by pytest, not the
oracle (non-SQL-expressible, SURVEY §7.4 risk 5).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from es_to_clickhouse_spark.corpus import query, t
from es_to_clickhouse_spark.functions import ts_seconds


@query(
    "t2_watermark_commit",
    """
    SELECT count(*) AS last_sync_count,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_sync_time,
           max(event_id) AS last_id
    FROM events WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
    """,
)
def t2_watermark_commit(spark, sf_dir):
    """The state row a micro-batch commits: count + max watermarks in one
    partial-aggregated pass (replaces the reference's per-row running max,
    es/es_to_bytehouse.py:909-919)."""
    return (
        t(spark, sf_dir, "events")
        .where(F.col("ts") > F.lit("2024-01-15 00:00:00").cast("timestamp"))
        .agg(
            F.count(F.lit(1)).alias("last_sync_count"),
            ts_seconds(F.max("ts")).alias("last_sync_time"),
            F.max("event_id").alias("last_id"),
        )
    )


@query(
    "t5_bootstrap_window",
    """
    SELECT event_id, event_type
    FROM events
    WHERE ts > (SELECT max(ts) FROM events) - INTERVAL 1 DAY
    """,
)
def t5_bootstrap_window(spark, sf_dir):
    """First-run-with-no-state trailing window (t > now() - INTERVAL 1 DAY,
    clickhouse/clickhouse_to_bytehouse.py:467) — anchored to max(ts) so the
    check is deterministic."""
    ev = t(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("max_ts"))
    return (
        ev.crossJoin(F.broadcast(anchor))
        .where(F.col("ts") > F.col("max_ts") - F.expr("INTERVAL 1 DAY"))
        .select("event_id", "event_type")
    )


@query(
    "t3_late_data_refetch",
    """
    SELECT event_id, event_type FROM events
    WHERE ts > TIMESTAMP '2024-01-25 00:00:00'
       OR (event_type IN ('purchase', 'signup')
           AND ts > TIMESTAMP '2024-01-20 00:00:00')
    """,
)
def t3_late_data_refetch(spark, sf_dir):
    """Late/updated-data re-fetch: OR of insert-time and update-time
    watermarks (es/es_to_bytehouse.py:843-853); upsert reconciliation is
    w1/the sink's dedup view."""
    ev = t(spark, sf_dir, "events")
    pred = (F.col("ts") > F.lit("2024-01-25 00:00:00").cast("timestamp")) | (
        F.col("event_type").isin("purchase", "signup")
        & (F.col("ts") > F.lit("2024-01-20 00:00:00").cast("timestamp"))
    )
    return ev.where(pred).select("event_id", "event_type")


@query(
    "t7_tumbling_window",
    """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY date_trunc('day', ts), event_type
    """,
)
def t7_tumbling_window(spark, sf_dir):
    """Tumbling event-time window aggregate — Structured Streaming's
    ``window(ts, '1 day')``, oracle-checked via date_trunc."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            ts_seconds(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "t7_sliding_window",
    """
    WITH assigned AS (
      SELECT date_trunc('day', ts) AS w0, value FROM events
      UNION ALL
      SELECT date_trunc('day', ts) - INTERVAL 1 DAY AS w0, value FROM events
    )
    SELECT strftime(w0, '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM assigned GROUP BY w0
    """,
)
def t7_sliding_window(spark, sf_dir):
    """Sliding window (2 days, sliding 1 day): each event lands in two
    windows; oracle replays the assignment with a UNION ALL."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 days", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            ts_seconds(F.col("w.start")).alias("window_start"),
            "n",
            "total_value",
        )
    )


@query(
    "t8_session_window",
    """
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE user_id < 10
    ), sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM ordered
    )
    SELECT user_id, count(DISTINCT session_id) AS n_sessions, count(*) AS n_events
    FROM sessions GROUP BY user_id
    """,
)
def t8_session_window(spark, sf_dir):
    """Session windows (30 min gap) — Structured Streaming's
    ``session_window``; oracle via gaps-and-islands SQL."""
    ev = t(spark, sf_dir, "events").where(F.col("user_id") < 10)
    sess = ev.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
    ).agg(F.count(F.lit(1)).alias("n"))
    return sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"), F.sum("n").alias("n_events")
    )


@query(
    "t6_auto_mode_split",
    """
    WITH state AS (
      SELECT 'events' AS tbl, TIMESTAMP '2024-01-20 00:00:00' AS wm
    )
    SELECT e.event_id, e.event_type
    FROM events e JOIN state s ON s.tbl = 'events'
    WHERE e.ts > s.wm
    """,
)
def t6_auto_mode_split(spark, sf_dir):
    """Auto-mode handoff: tables WITH state sync incrementally from their
    watermark (mongodb/mongodb_to_bytehouse.py:811-866); the full-backfill
    branch is s1."""
    ev = t(spark, sf_dir, "events")
    state = spark.createDataFrame(
        [("events", "2024-01-20 00:00:00")], "tbl string, wm_s string"
    ).select("tbl", F.col("wm_s").cast("timestamp").alias("wm"))
    return (
        ev.join(F.broadcast(state), state.tbl == F.lit("events"))
        .where(F.col("ts") > F.col("wm"))
        .select("event_id", "event_type")
    )


@query(
    "w5_upsert_dedup_view",
    """
    WITH dup AS (
      SELECT event_id, user_id, value, ts FROM events
      UNION ALL
      SELECT event_id, user_id, value * 2 AS value, ts + INTERVAL 1 HOUR AS ts
      FROM events WHERE event_id % 7 = 0
    )
    SELECT event_id, round(value, 2) AS value FROM (
      SELECT *, row_number() OVER (
        PARTITION BY event_id ORDER BY ts DESC) AS rn FROM dup
    ) WHERE rn = 1
    """,
)
def w5_upsert_dedup_view(spark, sf_dir):
    """End-to-end upsert semantics: re-delivered rows with newer versions
    win (UNIQUE KEY _id merge-on-read, es/es_to_bytehouse.py:329-334) —
    built on the engine's upsert_view."""
    from es_to_clickhouse_spark.sink import upsert_view

    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "value", "ts")
    updated = (
        ev.where(F.col("event_id") % 7 == 0)
        .withColumn("value", F.col("value") * 2)
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR"))
    )
    merged = upsert_view(ev.unionByName(updated), key="event_id", version="ts")
    return merged.select("event_id", F.round("value", 2).alias("value"))


@query(
    "w10_upsert_stable",
    """
    WITH base AS (
      SELECT CAST(event_id AS VARCHAR) AS _id,
             'a' || CAST(event_id % 3 AS VARCHAR) AS variant
      FROM events WHERE event_id % 5 = 0
      UNION ALL
      SELECT CAST(event_id AS VARCHAR),
             'b' || CAST(event_id % 3 AS VARCHAR)
      FROM events WHERE event_id % 5 = 0
    ), fp AS (
      -- mirrors row_fingerprint's injective length-prefixed encoding:
      -- V<len>:<value> per field (cols sorted: _id, _timestamp, variant).
      -- The _timestamp token is DERIVED from the same rendering the
      -- Spark side produces — cast-to-string of a whole-second UTC
      -- timestamp, 19 chars ('yyyy-MM-dd HH:mm:ss', no fractional part)
      -- — instead of a hardcoded 'V19:...' literal, so a change to the
      -- literal date can't silently desync the two sides. A FRACTIONAL
      -- _timestamp would render with '.ffffff' on both engines and the
      -- length prefix would follow it here too.
      SELECT _id, variant,
             md5('V' || CAST(length(_id) AS VARCHAR) || ':' || _id
                 || 'V' || CAST(length(strftime(TIMESTAMP '2024-01-20 00:00:00',
                                                '%Y-%m-%d %H:%M:%S')) AS VARCHAR)
                     || ':' || strftime(TIMESTAMP '2024-01-20 00:00:00',
                                        '%Y-%m-%d %H:%M:%S')
                 || 'V' || CAST(length(variant) AS VARCHAR) || ':' || variant) AS f
      FROM base
    )
    SELECT CAST(_id AS BIGINT) AS event_id, variant FROM (
      SELECT *, row_number() OVER (PARTITION BY _id ORDER BY f DESC) AS rn
      FROM fp
    ) WHERE rn = 1
    """,
)
def w10_upsert_stable(spark, sf_dir):
    """Upsert determinism under physical-layout churn: two batches of the
    same keys with EQUAL versions (same ``_timestamp``) are appended to a
    real warehouse table, the table is compacted (file count, order, and
    row layout all change — ``layout.compact``), re-read, and merged with
    ``upsert_view``. The content-stable md5 tie-break elects the same
    winner the oracle computes; the old ``monotonically_increasing_id``
    tie-break would flake exactly here (ADVICE sink.py:146)."""
    import tempfile

    from es_to_clickhouse_spark import layout
    from es_to_clickhouse_spark.sink import WarehouseTarget, upsert_view

    base = (
        t(spark, sf_dir, "events")
        .where(F.col("event_id") % 5 == 0)
        .select(
            F.col("event_id").cast("string").alias("_id"),
            F.lit("2024-01-20 00:00:00").cast("timestamp").alias("_timestamp"),
            F.concat(F.lit("a"), (F.col("event_id") % 3).cast("string")).alias(
                "variant"
            ),
        )
    )
    tmp = tempfile.mkdtemp(prefix="w10_upsert_")
    target = WarehouseTarget(spark, tmp)
    target.append("assets", base)
    target.append(
        "assets",
        base.withColumn(
            "variant", F.concat(F.lit("b"), (F.col("_id").cast("long") % 3).cast("string"))
        ),
    )
    raw = target.read("assets", dedup=False)
    layout.compact(raw, f"{tmp}/assets_compacted")
    reread = spark.read.parquet(f"{tmp}/assets_compacted")
    merged = upsert_view(reread, key="_id", version="_timestamp")
    return merged.select(
        F.col("_id").cast("long").alias("event_id"), "variant"
    )


@query(
    "ts1_hourly_gap_fill",
    """
    WITH b AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2))
               AS sum_val
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ), span AS (
      SELECT event_type, min(h) AS lo, max(h) AS hi FROM b GROUP BY event_type
    ), spine AS (
      SELECT event_type,
             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      FROM span
    )
    SELECT s.event_type,
           strftime(s.h, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
           coalesce(b.n_events, 0) AS n_events,
           CAST(last_value(b.sum_val IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS sum_val_ffill
    FROM spine s LEFT JOIN b ON b.event_type = s.event_type AND b.h = s.h
    """,
)
def ts1_hourly_gap_fill(spark, sf_dir):
    """Hypertable-style hourly rollup with gap materialization: empty
    hours appear with n_events=0 and the last observed hourly average
    carried forward (operators/timeseries.py). The spine is generated
    per key (never shuffled); the forward fill windows by key, so state
    per task is one key's hour range even at 100 TB."""
    from es_to_clickhouse_spark.operators.timeseries import gap_fill, resample

    ev = t(spark, sf_dir, "events")
    b = resample(
        ev,
        "ts",
        ["event_type"],
        [
            F.count(F.lit(1)).alias("n_events"),
            # decimal-exact sum: engines' double round() algorithms
            # legitimately disagree at .xx5 boundaries, so no floats in
            # the carried-forward value at all
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(28,2)")
            .alias("sum_val"),
        ],
    )
    g = gap_fill(
        b,
        "bucket_ts",
        ["event_type"],
        step="1 hour",
        fill_zero=["n_events"],
        fill_forward=["sum_val"],
    )
    return g.select(
        "event_type",
        ts_seconds(F.col("bucket_ts")).alias("bucket_ts"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("sum_val").cast("double").alias("sum_val_ffill"),
    )


@query(
    "ts7_ewma_event_rate",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ), ser AS (
      SELECT event_type,
             list(CAST(n AS DOUBLE) ORDER BY h) AS arr,
             count(*) AS n_hours,
             max(n) AS max_n
      FROM hourly GROUP BY event_type
    )
    SELECT event_type, n_hours,
           round(list_reduce(arr, (a, b) -> a * 0.5 + b * 0.5), 6)
             AS last_ewma,
           max_n
    FROM ser
    """,
)
def ts7_ewma_event_rate(spark, sf_dir):
    """Exponentially-weighted moving average of the hourly event rate per
    type (alpha = 0.5), the classic smoothing baseline for rate
    monitoring/anomaly thresholds. The recurrence s_t = a*s_{t-1} +
    a*x_t is a SEQUENTIAL fold over the hour-ordered count series —
    expressed as F.aggregate seeded with the first element over the
    array tail, exactly DuckDB's list_reduce shape, and the series
    values are exact integers cast to double, so the result is
    bit-identical across engines. Scale: counts partial-aggregate
    map-side; each type's series is one array in one task (series
    length = hours observed, bounded by the time span, not row count)."""
    e = t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    ser = hourly.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("h", "n"))),
            lambda s: s["n"].cast("double"),
        ).alias("arr"),
        F.count(F.lit(1)).alias("n_hours"),
        F.max("n").alias("max_n"),
    )
    ewma = F.aggregate(
        F.slice(F.col("arr"), 2, F.size("arr") - 1),
        F.element_at("arr", 1),
        lambda acc, x: acc * F.lit(0.5) + x * F.lit(0.5),
    )
    return ser.select(
        "event_type",
        "n_hours",
        F.round(ewma, 6).alias("last_ewma"),
        "max_n",
    )


@query(
    "ts9_holt_linear",
    """
    WITH RECURSIVE hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ), ser AS (
      SELECT event_type, CAST(n AS DOUBLE) AS x,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS i
      FROM hourly
    ), cnt AS (
      SELECT event_type, count(*) AS m FROM ser GROUP BY event_type
    ), holt(event_type, i, l, b) AS (
      SELECT event_type, 1, x, CAST(0 AS DOUBLE) FROM ser WHERE i = 1
      UNION ALL
      SELECT s.event_type, s.i,
             0.5 * s.x + 0.5 * (h.l + h.b),
             0.5 * ((0.5 * s.x + 0.5 * (h.l + h.b)) - h.l) + 0.5 * h.b
      FROM holt h JOIN ser s ON s.event_type = h.event_type AND s.i = h.i + 1
    )
    SELECT h.event_type, CAST(c.m AS BIGINT) AS n_hours,
           round(h.l, 6) AS level, round(h.b, 6) AS trend,
           round(h.l + h.b, 6) AS forecast_1
    FROM holt h JOIN cnt c ON h.event_type = c.event_type
    WHERE h.i = c.m
    """,
)
def ts9_holt_linear(spark, sf_dir):
    """Holt double-exponential smoothing (level + trend, alpha = beta =
    0.5) of the hourly event rate per type, with the one-step-ahead
    forecast — the trend-aware upgrade of ts7's flat EWMA that a rate
    monitor needs when volume is ramping. The TWO-STATE recurrence
    (l_t, b_t depend on each other) folds with a STRUCT accumulator in
    one F.aggregate — DuckDB's list_reduce can't carry a struct, so
    the oracle states the identical recurrence as a recursive CTE; the
    op sequence (same multiplies, same order, exact-integer series
    inputs) is identical, so results match at full double precision
    before the final round. Scale: per-type series in one bounded
    array, counts partial-aggregated map-side (the ts7 shape)."""
    e = t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    ser = hourly.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("h", "n"))),
            lambda s: s["n"].cast("double"),
        ).alias("arr"),
        F.count(F.lit(1)).alias("n_hours"),
    )

    def step(acc, x):
        l_new = F.lit(0.5) * x + F.lit(0.5) * (acc["l"] + acc["b"])
        b_new = F.lit(0.5) * (l_new - acc["l"]) + F.lit(0.5) * acc["b"]
        return F.struct(l_new.alias("l"), b_new.alias("b"))

    fold = F.aggregate(
        F.slice(F.col("arr"), 2, F.size("arr") - 1),
        F.struct(
            F.element_at("arr", 1).alias("l"), F.lit(0.0).alias("b")
        ),
        step,
    )
    return ser.select(
        "event_type",
        "n_hours",
        F.round(fold["l"], 6).alias("level"),
        F.round(fold["b"], 6).alias("trend"),
        F.round(fold["l"] + fold["b"], 6).alias("forecast_1"),
    )


@query(
    "ts10_cusum_drift",
    """
    WITH RECURSIVE hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ), mu AS (
      SELECT event_type, avg(n) AS m FROM hourly GROUP BY event_type
    ), ser AS (
      SELECT hourly.event_type, CAST(n AS DOUBLE) AS x, mu.m,
             row_number() OVER (PARTITION BY hourly.event_type
                                ORDER BY h) AS i
      FROM hourly JOIN mu ON hourly.event_type = mu.event_type
    ), cnt AS (
      SELECT event_type, count(*) AS nh FROM ser GROUP BY event_type
    ), cusum(event_type, i, s, smax) AS (
      SELECT event_type, 1,
             greatest(CAST(0 AS DOUBLE), x - m - 0.5),
             greatest(CAST(0 AS DOUBLE), x - m - 0.5)
      FROM ser WHERE i = 1
      UNION ALL
      SELECT r.event_type, r.i,
             greatest(CAST(0 AS DOUBLE), c.s + r.x - r.m - 0.5),
             greatest(c.smax,
                      greatest(CAST(0 AS DOUBLE), c.s + r.x - r.m - 0.5))
      FROM cusum c JOIN ser r
        ON r.event_type = c.event_type AND r.i = c.i + 1
    )
    SELECT c.event_type, CAST(n.nh AS BIGINT) AS n_hours,
           round(c.s, 6) AS cusum_final, round(c.smax, 6) AS cusum_max,
           CASE WHEN c.smax > 20.0 THEN 1 ELSE 0 END AS drifted
    FROM cusum c JOIN cnt n ON c.event_type = n.event_type
    WHERE c.i = n.nh
    """,
)
def ts10_cusum_drift(spark, sf_dir):
    """One-sided CUSUM changepoint statistic (Page 1954) over the hourly
    event rate: s_t = max(0, s_{t-1} + x_t − μ − k) with slack k = 0.5,
    plus its running maximum — the sequential drift detector behind
    rate-shift alerts (an EWMA smooths a shift away; CUSUM accumulates
    it). TWO-STATE fold (s, smax), same machinery as ts9: one struct-
    accumulator F.aggregate on Spark, the identical recurrence as a
    recursive CTE on DuckDB, exact-integer inputs and identical op
    order so the doubles agree at full precision before rounding."""
    e = t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    mu = hourly.groupBy("event_type").agg(F.avg("n").alias("m"))
    ser = hourly.join(mu, "event_type").groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("h", "n"))),
            lambda s: s["n"].cast("double"),
        ).alias("arr"),
        F.count(F.lit(1)).alias("n_hours"),
        F.min("m").alias("m"),
    )

    def step(acc, x):
        s_new = F.greatest(
            F.lit(0.0), acc["s"] + x - F.col("m") - F.lit(0.5)
        )
        return F.struct(
            s_new.alias("s"), F.greatest(acc["smax"], s_new).alias("smax")
        )

    seed_s = F.greatest(
        F.lit(0.0), F.element_at("arr", 1) - F.col("m") - F.lit(0.5)
    )
    fold = F.aggregate(
        F.slice(F.col("arr"), 2, F.size("arr") - 1),
        F.struct(seed_s.alias("s"), seed_s.alias("smax")),
        step,
    )
    return ser.select(
        "event_type",
        "n_hours",
        F.round(fold["s"], 6).alias("cusum_final"),
        F.round(fold["smax"], 6).alias("cusum_max"),
        F.when(fold["smax"] > 20.0, 1).otherwise(0).alias("drifted"),
    )
