"""Corpus: behavioral / product analytics over the events stream table.

The reference feeds an analytics warehouse (ES/Mongo activity streams →
ClickHouse); these are the queries such a warehouse exists to answer —
cohort retention, event-transition structure, sliding-window actives,
JSON property extraction, per-entity modal behavior. All are expressed
as pure Catalyst plans (no UDFs) with exact integer/date arithmetic so
the DuckDB oracle matches bit-for-bit.

Scale notes:
- every query shuffles at most twice on `user_id` or a (small) derived
  grouping key; the per-user windows reuse one sort;
- b3 converts a sliding-window distinct count into explode + equi-group
  (shuffle on the window key) instead of a range self-join — O(rows × 7)
  work, no O(days × rows) candidate pairs, and no window-frame state;
- JSON extraction (f22) stays JVM-side via ``get_json_object`` (codegen),
  never a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from es_to_clickhouse_spark.corpus import query, t
from es_to_clickhouse_spark.functions import epoch_micros

# ------------------------------------------------------------ cohorts


@query(
    "b1_cohort_retention",
    """
    WITH f AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cw
      FROM events GROUP BY user_id
    ),
    a AS (
      SELECT DISTINCT e.user_id, f.cw, date_trunc('week', e.ts) AS w
      FROM events e JOIN f ON e.user_id = f.user_id
    )
    SELECT strftime(CAST(cw AS DATE), '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', CAST(cw AS DATE), CAST(w AS DATE)) / 7 AS BIGINT)
             AS week_offset,
           count(DISTINCT user_id) AS n_active
    FROM a GROUP BY cw, w
    """,
)
def b1_cohort_retention(spark, sf_dir):
    """Weekly cohort-retention matrix: cohort = ISO week of a user's first
    event; cell (cohort, k) = distinct cohort members active k weeks later.
    Two shuffles: first-event agg on user_id, then the (cohort, week)
    re-group; the cohort table joins back broadcast (distinct users ≪
    events at any SF — it is bounded by the user population)."""
    e = t(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cw")
    )
    active = (
        e.join(F.broadcast(first), "user_id")
        .select(
            "user_id",
            "cw",
            F.date_trunc("week", F.col("ts")).alias("w"),
        )
        .distinct()
    )
    return active.groupBy("cw", "w").agg(
        F.count_distinct("user_id").alias("n_active")
    ).select(
        F.date_format(F.col("cw"), "yyyy-MM-dd").alias("cohort_week"),
        (F.datediff(F.to_date("w"), F.to_date("cw")).cast("long") / 7)
        .cast("long")
        .alias("week_offset"),
        "n_active",
    )


# ------------------------------------------- event-transition structure


@query(
    "b2_transition_matrix",
    """
    WITH s AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, count(*) AS n
    FROM s WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def b2_transition_matrix(spark, sf_dir):
    """First-order Markov transition counts between consecutive events of
    one user (lag over the per-user time order). One shuffle on user_id
    for the window; the (prev, next) re-group is a 25-row partial-agg
    reduction that AQE coalesces to nothing."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    return s.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "b4_trigram_paths",
    """
    WITH s AS (
      SELECT user_id, event_type,
             lag(event_type, 1) OVER w AS p1,
             lag(event_type, 2) OVER w AS p2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    g AS (
      SELECT p2 || '>' || p1 || '>' || event_type AS path, count(*) AS n
      FROM s WHERE p2 IS NOT NULL GROUP BY 1
    )
    SELECT path, n FROM g
    ORDER BY n DESC, path LIMIT 20
    """,
)
def b4_trigram_paths(spark, sf_dir):
    """Top-20 length-3 behavior paths (sequential-pattern n-grams) via two
    lags over the same per-user sort — the window sort is shared, so the
    whole extraction is one shuffle. LIMIT carries the (n DESC, path)
    total order required by the driver's order-insensitive hash."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    ).where(F.col("p2").isNotNull())
    return (
        s.select(
            F.concat_ws(">", "p2", "p1", "event_type").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(20)
    )


# --------------------------------------------- sliding distinct actives


@query(
    "b3_sliding_dau",
    """
    WITH u AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
    days AS (SELECT DISTINCT d FROM u)
    SELECT strftime(days.d, '%Y-%m-%d') AS window_start,
           count(DISTINCT u.user_id) AS n_users
    FROM days JOIN u ON u.d BETWEEN days.d AND days.d + 6
    GROUP BY days.d
    """,
)
def b3_sliding_dau(spark, sf_dir):
    """Distinct users per 7-day forward window, one row per observed day.
    The naive plan is a range self-join (days × events candidate pairs);
    instead each (day, user) pair EXPLODES into the ≤7 window starts that
    cover it, turning the range join into an equi-groupBy — linear work,
    one shuffle on the window key (the same trick rj1 uses for interval
    joins). Window starts outside the observed-day set are dropped with a
    broadcast semi-join."""
    e = t(spark, sf_dir, "events")
    u = e.select(F.to_date("ts").alias("d"), "user_id").distinct()
    days = u.select("d").distinct()
    exploded = u.select(
        F.explode(
            F.sequence(F.date_sub(F.col("d"), 6), F.col("d"))
        ).alias("window_start"),
        "user_id",
    )
    covered = exploded.join(
        F.broadcast(days.withColumnRenamed("d", "window_start")),
        "window_start",
        "left_semi",
    )
    return covered.groupBy("window_start").agg(
        F.count_distinct("user_id").alias("n_users")
    ).select(
        F.date_format("window_start", "yyyy-MM-dd").alias("window_start"),
        "n_users",
    )


# --------------------------------------------------- JSON property math


@query(
    "f22_json_extract",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           count(json_extract_string(props, '$.k')) AS n_with_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def f22_json_extract(spark, sf_dir):
    """JSON path extraction from the raw props payload (the reference
    stringifies nested docs into JSON columns — es_to_bytehouse.py keeps
    object fields as json.dumps strings; this is the read-side inverse).
    ``get_json_object`` runs inside codegen; integer sums are exact."""
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(k).alias("n_with_k"),
        F.max(k).alias("max_k"),
    )


# ------------------------------------------------------- modal behavior


@query(
    "w13_mode_per_group",
    """
    WITH c AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY user_id, event_type
    ),
    r AS (
      SELECT user_id, event_type, n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type) AS rk
      FROM c
    )
    SELECT user_id, event_type AS modal_type, n AS n_events
    FROM r WHERE rk = 1
    """,
)
def w13_mode_per_group(spark, sf_dir):
    """Deterministic per-key mode (most frequent event type, ties broken
    lexicographically): count-then-rank. The count shuffles on the
    composite key with map-side partial agg; the window re-shuffles on
    user_id only — both tiny relative to the scan."""
    e = t(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), "event_type")
    return (
        c.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("modal_type"),
            F.col("n").alias("n_events"),
        )
    )


# ------------------------------------------- ClickHouse funnel parity


@query(
    "b6_window_funnel",
    """
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events
    ), s1 AS (
      SELECT user_id, event_type, us, event_id,
             max(CASE WHEN event_type = 'view' THEN us END) OVER
               (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lv
      FROM ev
    ), s2 AS (
      SELECT user_id, event_type, us, lv,
             max(CASE WHEN event_type = 'click' THEN lv END) OVER
               (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lvc
      FROM s1
    )
    SELECT user_id,
           CASE WHEN max(CASE WHEN event_type = 'purchase'
                              AND lvc >= us - 21600000000 THEN 1 ELSE 0 END) = 1
                THEN 3
                WHEN max(CASE WHEN event_type = 'click'
                              AND lv >= us - 21600000000 THEN 1 ELSE 0 END) = 1
                THEN 2
                WHEN max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) = 1
                THEN 1 ELSE 0 END AS funnel_level
    FROM s2 GROUP BY user_id
    """,
)
def b6_window_funnel(spark, sf_dir):
    """ClickHouse ``windowFunnel(6h)(ts, view, click, purchase)``
    parity: per user, the maximum funnel depth reachable by ANY chain
    view < click < purchase that fits inside a 6-hour window anchored
    at its view (sliding-anchor semantics — unlike w12, which anchors
    at the FIRST view only).

    Spark-first trick: instead of scanning per-user event lists
    imperatively (the ClickHouse implementation,
    clickhouse/clickhouse_to_bytehouse.py's target dialect), two
    cascaded running-max windows compute, for every event, the best
    (latest) chain prefix ending strictly before it: ``lv`` = latest
    prior view, ``lvc`` = best view start among prior clicks' chains.
    Depth-3 exists iff some purchase has lvc >= purchase_ts − window
    (the intermediate click is then automatically inside the window,
    since view < click < purchase <= view + τ). One user_id Exchange,
    one sort, zero self-joins — the exact-chain max without quadratic
    candidate pairs."""
    from es_to_clickhouse_spark.operators.funnel import window_funnel

    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", epoch_micros(F.col("ts")).alias("us"), "event_id"
    )
    return window_funnel(
        ev,
        key_col="user_id",
        ts_col="us",
        order_cols=["event_id"],
        conds=[
            F.col("event_type") == "view",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
        window=21_600_000_000,  # 6 hours
    )


@query(
    "b7_sequence_match",
    """
    WITH ev AS (
      SELECT user_id, substring(event_type, 1, 1) AS c,
             epoch_us(ts) AS us, event_id
      FROM events
    ), s AS (
      SELECT user_id, string_agg(c, '' ORDER BY us, event_id) AS seq
      FROM ev GROUP BY user_id
    )
    SELECT user_id, CAST(length(seq) AS BIGINT) AS seq_len,
           CASE WHEN regexp_matches(seq, 'v.*c.*p') THEN 1 ELSE 0 END AS has_vcp,
           CAST((length(seq) - length(replace(seq, 'vcp', ''))) // 3 AS BIGINT)
             AS n_vcp_runs
    FROM s
    """,
)
def b7_sequence_match(spark, sf_dir):
    """ClickHouse ``sequenceMatch('(?1).*(?2).*(?3)')`` / ``sequenceCount``
    parity: per user, the time-ordered event-initial string is matched
    against the funnel pattern — `.*`-separated for the any-gap match
    (has_vcp), adjacent-run counting for the strict consecutive form
    (n_vcp_runs, ClickHouse's `(?1)(?2)(?3)` with nothing between).

    The per-user sequence is ONE array_sort(collect_list(struct)) off
    the user_id shuffle — struct field order (us, event_id, c) makes
    lexicographic array_sort identical to the oracle's ORDER BY us,
    event_id. Bounded by per-user event count; an unbounded stream
    would sessionize first (t8) and match per session."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.substring("event_type", 1, 1).alias("c"),
        epoch_micros(F.col("ts")).alias("us"),
        "event_id",
    )
    s = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("us", "event_id", "c"))).alias("a")
    )
    seq = F.concat_ws("", F.transform("a", lambda x: x["c"]))
    sdf = s.select("user_id", seq.alias("seq"))
    return sdf.select(
        "user_id",
        F.length("seq").cast("long").alias("seq_len"),
        F.when(F.col("seq").rlike("v.*c.*p"), 1).otherwise(0).alias("has_vcp"),
        F.floor(
            (F.length("seq") - F.length(F.replace(F.col("seq"), F.lit("vcp")))) / 3
        )
        .cast("long")
        .alias("n_vcp_runs"),
    )


@query(
    "b8_retention_conditions",
    """
    WITH u AS (
      SELECT user_id,
             max(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-01'
                 THEN 1 ELSE 0 END) AS c1,
             max(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-02'
                 THEN 1 ELSE 0 END) AS c2,
             max(CASE WHEN CAST(ts AS DATE) BETWEEN DATE '2024-01-03'
                      AND DATE '2024-01-08' THEN 1 ELSE 0 END) AS c3
      FROM events GROUP BY user_id
    )
    SELECT CAST(sum(c1) AS BIGINT) AS r1,
           CAST(sum(c1 * c2) AS BIGINT) AS r2,
           CAST(sum(c1 * c3) AS BIGINT) AS r3,
           CAST(count(*) AS BIGINT) AS n_users
    FROM u
    """,
)
def b8_retention_conditions(spark, sf_dir):
    """ClickHouse ``retention(cond1, cond2, ...)`` parity: per user, a
    boolean per condition (active on day 1 / day 2 / during week 1),
    gated on the FIRST condition exactly like the ClickHouse aggregate
    (r_i counts users where cond1 AND cond_i), then rolled up to the
    cohort totals a dashboard plots. One user_id groupBy of 0/1 maxes —
    partial-aggregated map-side, the condition columns never shuffle
    individually. Complements b1's week-grain cohort MATRIX with the
    fixed-condition form."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    u = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("d") == F.lit("2024-01-01").cast("date"), 1).otherwise(0)).alias("c1"),
        F.max(F.when(F.col("d") == F.lit("2024-01-02").cast("date"), 1).otherwise(0)).alias("c2"),
        F.max(
            F.when(
                (F.col("d") >= F.lit("2024-01-03").cast("date"))
                & (F.col("d") <= F.lit("2024-01-08").cast("date")),
                1,
            ).otherwise(0)
        ).alias("c3"),
    )
    return u.agg(
        F.sum("c1").alias("r1"),
        F.sum(F.col("c1") * F.col("c2")).alias("r2"),
        F.sum(F.col("c1") * F.col("c3")).alias("r3"),
        F.count(F.lit(1)).alias("n_users"),
    )


@query(
    "b9_session_funnel",
    """
    WITH g AS (
      SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ), s AS (
      SELECT user_id, event_type, us, event_id,
             sum(new_sess) OVER (PARTITION BY user_id
                                 ORDER BY us, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS sess
      FROM g
    ), f AS (
      SELECT user_id, sess, event_type, us, event_id,
             max(CASE WHEN event_type = 'view' THEN us END) OVER
               (PARTITION BY user_id, sess ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS s1
      FROM s
    ), f2 AS (
      SELECT user_id, sess, event_type, us, s1,
             max(CASE WHEN event_type = 'click' THEN s1 END) OVER
               (PARTITION BY user_id, sess ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS s2
      FROM f
    ), lv AS (
      SELECT user_id, sess,
             CASE WHEN max(CASE WHEN event_type = 'purchase'
                                AND s2 IS NOT NULL THEN 1 ELSE 0 END) = 1
                  THEN 3
                  WHEN max(CASE WHEN event_type = 'click'
                                AND s1 IS NOT NULL THEN 1 ELSE 0 END) = 1
                  THEN 2
                  WHEN max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) = 1
                  THEN 1 ELSE 0 END AS session_level
      FROM f2 GROUP BY user_id, sess
    )
    SELECT session_level, CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM lv GROUP BY session_level
    """,
)
def b9_session_funnel(spark, sf_dir):
    """Funnel WITHIN session boundaries: sessionize first (30-minute
    inactivity gap — t8's batch sessionization), then require the
    view < click < purchase chain to complete inside ONE session — the
    product question 'do users convert in a sitting?' that the 6-hour
    wall-clock window of b6 can't answer. Composition: the
    gaps-and-islands session id (lag + running sum) feeds the same
    cascaded running-max funnel, all FIVE windows sharing the single
    user_id shuffle (session windows subpartition it). No time bound
    inside the session — the session IS the window, so the s_i chain
    stores need no window check at the final event."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", epoch_micros(F.col("ts")).alias("us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    g = ev.withColumn(
        "new_sess",
        F.when(
            F.lag("us").over(w).isNull()
            | (F.col("us") - F.lag("us").over(w) > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    s = g.withColumn(
        "sess",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = (
        Window.partitionBy("user_id", "sess")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    f = s.withColumn(
        "s1", F.max(F.when(F.col("event_type") == "view", F.col("us"))).over(ws)
    )
    f2 = f.withColumn(
        "s2", F.max(F.when(F.col("event_type") == "click", F.col("s1"))).over(ws)
    )
    lv = f2.groupBy("user_id", "sess").agg(
        F.when(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & F.col("s2").isNotNull(),
                    1,
                ).otherwise(0)
            )
            == 1,
            3,
        )
        .when(
            F.max(
                F.when(
                    (F.col("event_type") == "click") & F.col("s1").isNotNull(), 1
                ).otherwise(0)
            )
            == 1,
            2,
        )
        .when(
            F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)) == 1, 1
        )
        .otherwise(0)
        .alias("session_level")
    )
    return lv.groupBy("session_level").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "b10_session_entropy",
    """
    WITH g AS (
      SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ), s AS (
      SELECT user_id, event_type,
             sum(new_sess) OVER (PARTITION BY user_id
                                 ORDER BY us, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS sess
      FROM g
    ), tc AS (
      SELECT user_id, sess, event_type, count(*) AS c
      FROM s GROUP BY user_id, sess, event_type
    ), st AS (
      SELECT user_id, sess, sum(c) AS n, count(*) AS n_types FROM tc
      GROUP BY user_id, sess
    ), terms AS (
      SELECT tc.user_id, tc.sess, st.n_types,
             CAST(round(-ln(CAST(tc.c AS DOUBLE) / st.n)
                        * (CAST(tc.c AS DOUBLE) / st.n) * 1000000)
               AS BIGINT) AS micro
      FROM tc JOIN st ON tc.user_id = st.user_id AND tc.sess = st.sess
    ), se AS (
      SELECT user_id, sess, n_types,
             CAST(sum(micro) AS BIGINT) AS entropy_micro
      FROM terms GROUP BY user_id, sess, n_types
    )
    SELECT n_types, CAST(count(*) AS BIGINT) AS n_sessions,
           round(CAST(sum(entropy_micro) AS DOUBLE)
                 / count(*) / 1000000, 4) AS mean_entropy_nats
    FROM se GROUP BY n_types
    """,
)
def b10_session_entropy(spark, sf_dir):
    """Behavioral entropy per session: Shannon entropy of the event-type
    distribution inside each 30-minute session, summarized by session
    diversity (how focused vs exploratory sessions are — the
    information-theoretic counterpart of b2's transition matrix, and
    the session-quality feature behind engagement scoring). Each
    −p·ln p term is quantized to integer micro-nats BEFORE summing
    (txt18's discipline: the distributed sum is bigint-exact and
    order-free; only the per-term single-op float chain touches
    doubles, identically on both engines). Sessionization shares b9's
    gaps-and-islands windows on the one user shuffle."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", epoch_micros(F.col("ts")).alias("us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    g = ev.withColumn(
        "new_sess",
        F.when(
            F.lag("us").over(w).isNull()
            | (F.col("us") - F.lag("us").over(w) > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    s = g.withColumn(
        "sess",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    tc = s.groupBy("user_id", "sess", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    st = tc.groupBy("user_id", "sess").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_types")
    )
    p = F.col("c").cast("double") / F.col("n")
    terms = tc.join(st, ["user_id", "sess"]).select(
        "user_id",
        "sess",
        "n_types",
        F.round(-F.log(p) * p * 1000000).cast("long").alias("micro"),
    )
    se = terms.groupBy("user_id", "sess", "n_types").agg(
        F.sum("micro").alias("entropy_micro")
    )
    return se.groupBy("n_types").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(
            F.sum("entropy_micro").cast("double") / F.count(F.lit(1)) / 1000000,
            4,
        ).alias("mean_entropy_nats"),
    )
