"""Corpus: scans, filters, projections, scalar functions (SURVEY §2.1, §2.2, §2.8).

Every query here is the declarative Spark expression of a reference
operator; Catalyst pushes the filters/projections into the parquet scan
(verified via .explain PushedFilters/ReadSchema), which is the engine's
replacement for the reference's hand-built source-side pagination and
query-DSL predicate compilation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from es_to_clickhouse_spark.corpus import query, t
from es_to_clickhouse_spark.flatten import flatten_es, flatten_mongo
from es_to_clickhouse_spark.functions import glob_filter_column, ts_seconds
from es_to_clickhouse_spark.incremental import detect_time_field

# ---------------------------------------------------------------- scans


@query(
    "s1_full_scan",
    """
    SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           user_id, event_type, value, props
    FROM events
    """,
)
def s1_full_scan(spark, sf_dir):
    """Full table scan + stable projection (ES scroll full sync,
    es/es_to_bytehouse.py:577-673 → one distributed parquet scan)."""
    return t(spark, sf_dir, "events").select(
        "event_id",
        ts_seconds(F.col("ts")).alias("ts_s"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


@query(
    "s2_incremental_scan",
    """
    SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, event_type, value
    FROM events WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
    """,
)
def s2_incremental_scan(spark, sf_dir):
    """Watermark range scan with pushdown (es/es_to_bytehouse.py:825-961)."""
    return (
        t(spark, sf_dir, "events")
        .where(F.col("ts") > F.lit("2024-01-15 00:00:00").cast("timestamp"))
        .select(
            "event_id", ts_seconds(F.col("ts")).alias("ts_s"), "event_type", "value"
        )
    )


@query(
    "s3_sampled_scan",
    """
    SELECT event_id, event_type, user_id FROM events WHERE event_id % 20 = 0
    """,
)
def s3_sampled_scan(spark, sf_dir):
    """Deterministic sampled scan (schema-sampling analog of the reference's
    5000-doc scroll sample, es/es_to_bytehouse.py:338-395)."""
    ev = t(spark, sf_dir, "events")
    return ev.where(F.col("event_id") % 20 == 0).select(
        "event_id", "event_type", "user_id"
    )


@query(
    "s22_sliced_scroll_scan",
    """
    SELECT event_id, user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, value
    FROM events WHERE event_id % 50 = 0
    """,
)
def s22_sliced_scroll_scan(spark, sf_dir):
    """Distributed jar-free ES read END-TO-END over a real socket: a
    loopback ES fixture (sources/es_fixture.py) is seeded with a bounded
    slice of the events table, then :func:`sources.es.read_index_http`
    fans 4 slice drains out across the EXECUTORS (public sliced-scroll
    API — the parallel form of the reference's serial scroll loop,
    es/es_to_bytehouse.py:577-673) and the NDJSON rows parse JVM-side
    into a typed schema. The result must reassemble exactly the oracle's
    row set — S slices x P pages, no row lost or duplicated.

    The eager localCheckpoint bounds the fixture's lifetime to this
    call; Python appears only in the per-slice HTTP fetch (I/O), never
    in the row-parse path."""
    import threading  # noqa: F401  (fixture uses a daemon serve thread)

    from pyspark.sql import types as T

    from es_to_clickhouse_spark.sources.es import (
        ScrollSession,
        read_index_http,
    )
    from es_to_clickhouse_spark.sources.es_fixture import serve_index

    seed = (
        t(spark, sf_dir, "events")
        .where(F.col("event_id") % 50 == 0)
        .select(
            "event_id",
            "user_id",
            "event_type",
            ts_seconds(F.col("ts")).alias("ts_s"),
            "value",
        )
        .collect()  # bounded: 1/50 sample of events (20 rows at sf0.001)
    )
    docs = [{"_id": str(r.event_id), **r.asDict()} for r in seed]
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts_s", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    srv, host = serve_index(docs)
    try:
        df = read_index_http(
            spark,
            ScrollSession(host=host, size=500),
            "events",
            slices=4,
            schema=schema,
        ).localCheckpoint()  # eager: drains the wire before teardown
    finally:
        srv.shutdown()
    return df


def _es_to_ch_roundtrip(spark, sf_dir, residue, session_cls, state_prefix):
    """Shared body of the ES→CH pipeline queries (s23/s26): seed a
    loopback ES fixture with a bounded events sample, drain it through
    the live sync loop with the given SESSION CLASS (scroll or PIT +
    search_after — the polymorphic drain seam), land rows on a loopback
    ClickHouse via the token-deduped live sink, read them back with the
    distributed range read."""
    import tempfile

    from es_to_clickhouse_spark.sources.ch_fixture import serve_clickhouse
    from es_to_clickhouse_spark.sources.ch_http import (
        ClickHouseHttpSource,
        ClickHouseHttpTarget,
    )
    from es_to_clickhouse_spark.sources.es import sync_incremental_es_http
    from es_to_clickhouse_spark.sources.es_fixture import serve_index
    from es_to_clickhouse_spark.state import StateStore

    seed = (
        t(spark, sf_dir, "events")
        .where(F.col("event_id") % 50 == residue)
        .select(
            "event_id",
            "user_id",
            "event_type",
            ts_seconds(F.col("ts")).alias("created_at"),
            "value",
        )
        .collect()  # bounded: 1/50 sample of events
    )
    docs = [{"_id": str(r.event_id), **r.asDict()} for r in seed]
    mapping = {
        "event_id": {"type": "long"},
        "user_id": {"type": "long"},
        "event_type": {"type": "keyword"},
        "created_at": {"type": "date"},
        "value": {"type": "double"},
    }
    store: list[dict] = []  # the CH fake's live table: INSERTs land here,
    # SELECTs serve it — one store makes the write-then-read a real loop
    es_srv, es_host = serve_index(docs, index="events", mapping=mapping)
    ch_srv, ch_host, _, _ = serve_clickhouse(
        inserted=store, rows_ref=store, strict_columns=True,
        seen_tokens=set(), start_empty=True,
    )
    try:
        ch = ClickHouseHttpSource(host=ch_host, database="tgt_db")
        mode, n, _wm = sync_incremental_es_http(
            spark,
            session_cls(host=es_host, size=500),
            ClickHouseHttpTarget(ch),
            StateStore(spark, tempfile.mkdtemp(prefix=state_prefix)),
            "events",
            slices=4,
        )
        assert mode == "full" and n == len(docs), (mode, n)
        df = (
            ch.read_table(
                spark, "events",
                partition_column="event_id", bounds=(0, 1_000_000),
                num_partitions=4,
            )
            .select("event_id", "user_id", "event_type", "created_at", "value")
            .localCheckpoint()  # eager: drains the wire before teardown
        )
    finally:
        es_srv.shutdown()
        ch_srv.shutdown()
    return df


@query(
    "s23_es_to_ch_pipeline",
    """
    SELECT event_id, user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS created_at, value
    FROM events WHERE event_id % 50 = 7
    """,
)
def s23_es_to_ch_pipeline(spark, sf_dir):
    """The reference's WHOLE pipeline (es/es_to_bytehouse.py: the
    daemon end to end), oracle-checked over TWO real sockets:

    1. a loopback ES fixture (sources/es_fixture.py) is seeded with a
       bounded events sample and serves `_cat/indices` + `_mapping` +
       sliced scroll;
    2. :func:`sources.es.sync_incremental_es_http` drains it with
       executor-parallel sliced scroll (4 slices), flattens, and LANDS
       the rows on a loopback ClickHouse through the LIVE sink
       (ClickHouseHttpTarget: CREATE DATABASE/TABLE DDL, token-deduped
       NDJSON INSERT from the executors) while committing sync state;
    3. the returned DataFrame is the ClickHouse side read BACK with the
       distributed range read (read_table: executor-side range fetch,
       DESCRIBE-typed JVM-side parse).

    A row must survive scroll JSON → flatten → INSERT NDJSON → DESCRIBE
    typing → range-partitioned re-read byte-for-byte to match the
    oracle. The 1/50 sample keeps the fixture bounded (s22's contract);
    both servers shut down after the eager localCheckpoint."""
    from es_to_clickhouse_spark.sources.es import ScrollSession

    return _es_to_ch_roundtrip(spark, sf_dir, 7, ScrollSession, "s23_state_")


@query(
    "s26_es_pit_to_ch_pipeline",
    """
    SELECT event_id, user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS created_at, value
    FROM events WHERE event_id % 50 = 21
    """,
)
def s26_es_pit_to_ch_pipeline(spark, sf_dir):
    """s23's exact ES→CH pipeline with the PIT + search_after cursor
    (SearchAfterSession) in place of sliced scroll — the ES 8.x
    pagination the reference daemon predates, oracle-checked end to
    end: the sync loop, the executor fan-out, the flatten, the
    token-deduped live sink and the distributed read-back all run
    UNCHANGED over the swapped session (the polymorphic drain seam the
    --es-cursor CLI flag exposes); only the wire protocol differs
    (PIT open → stateless idempotent-retryable searches → PIT close).
    A disjoint 1/50 sample (residue 21) keeps the two pipeline oracles
    independent."""
    from es_to_clickhouse_spark.sources.es import SearchAfterSession

    return _es_to_ch_roundtrip(
        spark, sf_dir, 21, SearchAfterSession, "s26_state_"
    )


@query(
    "s24_mongo_to_ch_pipeline",
    """
    SELECT CAST(o_orderkey AS VARCHAR) AS o_orderkey,
           CAST(o_custkey AS VARCHAR) AS o_custkey,
           o_orderstatus
    FROM orders WHERE o_orderkey % 50 = 3
    """,
)
def s24_mongo_to_ch_pipeline(spark, sf_dir):
    """The reference's Mongo daemon end to end
    (mongodb/mongodb_to_bytehouse.py), oracle-checked over two real
    sockets — the OP_MSG twin of ``s23_es_to_ch_pipeline``:

    1. a loopback fake mongod (sources/mongo_fixture.py) serves a
       bounded orders sample as real BSON over raw TCP;
    2. :func:`sources.mongo_wire.sync_incremental_mongo_wire` drains it
       with the keyset scan (fresh ``find`` per page, ``_id $gt``
       watermark), STRINGIFY-projects (the Mongo dialect — every scalar
       through the reference's ``str()`` posture) and lands the rows on
       a loopback ClickHouse through the live sink;
    3. the returned DataFrame is the ClickHouse side read back with
       ``read_table``.

    Stringify fidelity is part of the oracle: long columns must come
    back as their exact decimal strings. The 1/50 sample keeps the
    fixtures bounded."""
    import tempfile

    from es_to_clickhouse_spark.sources.ch_fixture import serve_clickhouse
    from es_to_clickhouse_spark.sources.ch_http import (
        ClickHouseHttpSource,
        ClickHouseHttpTarget,
    )
    from es_to_clickhouse_spark.sources.mongo_fixture import serve_collection
    from es_to_clickhouse_spark.sources.mongo_wire import (
        MongoWireSession,
        sync_incremental_mongo_wire,
    )
    from es_to_clickhouse_spark.state import StateStore

    seed = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 50 == 3)
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .collect()  # bounded: 1/50 sample of orders
    )
    docs = [{"_id": f"{r.o_orderkey:012d}", **r.asDict()} for r in seed]
    store: list[dict] = []  # CH fake live table: INSERT lands, SELECT serves
    m_srv, m_port, _ = serve_collection(docs, collections=("orders",))
    ch_srv, ch_host, _, _ = serve_clickhouse(
        inserted=store, rows_ref=store, strict_columns=True,
        seen_tokens=set(), start_empty=True,
    )
    try:
        ch = ClickHouseHttpSource(host=ch_host, database="tgt_db")
        mode, n, _wm = sync_incremental_mongo_wire(
            spark,
            MongoWireSession(port=m_port, database="db", batch_size=500),
            ClickHouseHttpTarget(ch),
            StateStore(spark, tempfile.mkdtemp(prefix="s24_state_")),
            "orders",
        )
        assert mode == "full" and n == len(docs), (mode, n)
        df = (
            ch.read_table(spark, "orders")
            .select("o_orderkey", "o_custkey", "o_orderstatus")
            .localCheckpoint()  # eager: drains the wire before teardown
        )
    finally:
        m_srv.shutdown()
        ch_srv.shutdown()
    return df


@query(
    "s25_ch_to_ch_pipeline",
    """
    SELECT event_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS created_at_s, value
    FROM events WHERE event_id % 50 = 21
    """,
)
def s25_ch_to_ch_pipeline(spark, sf_dir):
    """The reference's ClickHouse daemon end to end
    (clickhouse/clickhouse_to_bytehouse.py: CH source → CH/ByteHouse
    target), oracle-checked over two real sockets — completing the
    trilogy with s23 (ES) and s24 (Mongo):

    1. a loopback ClickHouse fixture serves a bounded events sample
       with a typed DESCRIBE (DateTime column included — timestamps
       must survive BOTH hops);
    2. :func:`sources.ch_http.sync_incremental_http` reads it
       distributed (executor-side fetch, FAILFAST typed parse), with
       the stateless 1-day bootstrap condition (P6), and lands the rows
       on a SECOND loopback ClickHouse through the live sink
       (CREATE typed DDL incl. DateTime64(3), token-deduped NDJSON
       INSERT with millisecond timestamps);
    3. the returned DataFrame is the target side read back with
       ``read_table`` — the DESCRIBE-typed parse must accept the
       sink's own ``.SSS`` wire format.

    The 1/50 sample keeps the fixtures bounded."""
    import tempfile

    from es_to_clickhouse_spark.sources.ch_fixture import serve_clickhouse
    from es_to_clickhouse_spark.sources.ch_http import (
        ClickHouseHttpSource,
        ClickHouseHttpTarget,
        sync_incremental_http,
    )
    from es_to_clickhouse_spark.state import StateStore

    seed = (
        t(spark, sf_dir, "events")
        .where(F.col("event_id") % 50 == 21)
        .select(
            "event_id",
            ts_seconds(F.col("ts")).alias("created_at"),
            "event_type",
            "value",
        )
        .collect()  # bounded: 1/50 sample of events
    )
    src_rows = [r.asDict() for r in seed]
    src_schema = [
        {"name": "event_id", "type": "Int64"},
        {"name": "created_at", "type": "DateTime"},
        {"name": "event_type", "type": "String"},
        {"name": "value", "type": "Float64"},
    ]
    store: list[dict] = []
    src_srv, src_host, _, _ = serve_clickhouse(
        rows_ref=src_rows, schema=src_schema
    )
    tgt_srv, tgt_host, _, _ = serve_clickhouse(
        inserted=store, rows_ref=store, strict_columns=True,
        seen_tokens=set(), start_empty=True,
    )
    try:
        src = ClickHouseHttpSource(host=src_host, database="src_db")
        tgt = ClickHouseHttpSource(host=tgt_host, database="tgt_db")
        n, _cond, _wm = sync_incremental_http(
            spark, src, ClickHouseHttpTarget(tgt),
            StateStore(spark, tempfile.mkdtemp(prefix="s25_state_")),
            "events", time_column="created_at",
        )
        assert n == len(seed), n
        df = (
            tgt.read_table(
                spark, "events",
                partition_column="event_id", bounds=(0, 1_000_000),
                num_partitions=4,
            )
            .select(
                "event_id",
                "event_type",
                ts_seconds(F.col("created_at")).alias("created_at_s"),
                "value",
            )
            .localCheckpoint()  # eager: drains the wire before teardown
        )
    finally:
        src_srv.shutdown()
        tgt_srv.shutdown()
    return df


@query(
    "s6_paged_scan",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey > 100
    ORDER BY o_orderkey LIMIT 1000
    """,
)
def s6_paged_scan(spark, sf_dir):
    """One page of a keyset-ordered scan — replaces the reference's O(n²)
    LIMIT/OFFSET pagination (clickhouse/clickhouse_to_bytehouse.py:303-306)
    with seekable ranges (order-preserving, pushdown-friendly)."""
    return (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") > 100)
        .orderBy("o_orderkey")
        .limit(1000)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )


@query(
    "s10_keyset_scan",
    """
    SELECT c_custkey, c_name, c_nationkey FROM customer
    WHERE c_custkey > 40 ORDER BY c_custkey LIMIT 500
    """,
)
def s10_keyset_scan(spark, sf_dir):
    """Mongo-style keyset page: _id > last, sorted ascending
    (mongodb/mongodb_to_bytehouse.py:524-532)."""
    return (
        t(spark, sf_dir, "customer")
        .where(F.col("c_custkey") > 40)
        .orderBy("c_custkey")
        .limit(500)
        .select("c_custkey", "c_name", "c_nationkey")
    )


# ------------------------------------------------ projections / filters


@query(
    "p1_flatten_json",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS props_k
    FROM events
    """,
)
def p1_flatten_json(spark, sf_dir):
    """JSON document flatten via the engine's schema-driven flatten
    (es/es_to_bytehouse.py:544-575): parse props → struct → one generated
    select, no UDF."""
    ev = t(spark, sf_dir, "events").select(
        "event_id",
        F.from_json(F.col("props"), "struct<k:bigint>").alias("props"),
    )
    return flatten_es(ev, stringify=False)


@query(
    "p4_column_projection",
    """
    SELECT event_id, event_type, CAST(NULL AS VARCHAR) AS extra_col FROM events
    """,
)
def p4_column_projection(spark, sf_dir):
    """Projection onto a target column set: missing columns → NULL
    (es/es_to_bytehouse.py:681-688)."""
    return t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.lit(None).cast("string").alias("extra_col"),
    )


@query(
    "p5_watermark_or_ranges",
    """
    SELECT event_id, event_type, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
    FROM events
    WHERE ts > TIMESTAMP '2024-01-20 00:00:00'
       OR (event_type = 'purchase' AND ts > TIMESTAMP '2024-01-10 00:00:00')
    """,
)
def p5_watermark_or_ranges(spark, sf_dir):
    """OR-of-ranges watermark (insert-time ∪ update-time re-fetch,
    es/es_to_bytehouse.py:841-861)."""
    ev = t(spark, sf_dir, "events")
    pred = (F.col("ts") > F.lit("2024-01-20 00:00:00").cast("timestamp")) | (
        (F.col("event_type") == "purchase")
        & (F.col("ts") > F.lit("2024-01-10 00:00:00").cast("timestamp"))
    )
    return ev.where(pred).select(
        "event_id", "event_type", ts_seconds(F.col("ts")).alias("ts_s")
    )


@query(
    "p8_equality_filter",
    "SELECT event_id, user_id, value FROM events WHERE event_type = 'error'",
)
def p8_equality_filter(spark, sf_dir):
    """Equality predicate (state-table lookup shape, es/es_to_bytehouse.py:437-440)."""
    return (
        t(spark, sf_dir, "events")
        .where(F.col("event_type") == "error")
        .select("event_id", "user_id", "value")
    )


@query(
    "p9_null_empty_filter",
    """
    SELECT doc_id, lang FROM documents
    WHERE text IS NOT NULL AND text != ''
    """,
)
def p9_null_empty_filter(spark, sf_dir):
    """NULL/empty guard (es/es_to_bytehouse.py:1117-1119)."""
    d = t(spark, sf_dir, "documents")
    return d.where(F.col("text").isNotNull() & (F.col("text") != "")).select(
        "doc_id", "lang"
    )


@query(
    "p10_system_filter",
    """
    SELECT doc_id, source FROM documents
    WHERE source NOT LIKE '.%' AND source NOT LIKE 'system.%'
    """,
)
def p10_system_filter(spark, sf_dir):
    """System-object filter (es/es_to_bytehouse.py:250-253,
    mongodb/mongodb_to_bytehouse.py:303-304)."""
    d = t(spark, sf_dir, "documents")
    return d.where(
        ~F.col("source").startswith(".") & ~F.col("source").startswith("system.")
    ).select("doc_id", "source")


@query(
    "p11_wildcard_filter",
    """
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_mktsegment LIKE 'BUILD%' OR c_mktsegment = 'AUTOMOBILE'
    """,
)
def p11_wildcard_filter(spark, sf_dir):
    """Comma-separated glob patterns → Column predicate
    (clickhouse/clickhouse_to_bytehouse.py:83-98 fnmatch semantics)."""
    c = t(spark, sf_dir, "customer")
    return c.where(glob_filter_column(F.col("c_mktsegment"), "BUILD*,AUTOMOBILE")).select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "p12_time_field_detection",
    """
    SELECT * FROM (VALUES
      ('customer', CAST(NULL AS VARCHAR)),
      ('documents', CAST(NULL AS VARCHAR)),
      ('embeddings', CAST(NULL AS VARCHAR)),
      ('events', 'ts'),
      ('lineitem', 'l_shipdate'),
      ('nation', CAST(NULL AS VARCHAR)),
      ('orders', 'o_orderdate'),
      ('part', CAST(NULL AS VARCHAR)),
      ('region', CAST(NULL AS VARCHAR)),
      ('supplier', CAST(NULL AS VARCHAR))
    ) AS v(tbl, time_field)
    """,
)
def p12_time_field_detection(spark, sf_dir):
    """Time-field autodetection against real schemas
    (es/es_to_bytehouse.py:467-496 candidate walk)."""
    tables = [
        "customer",
        "documents",
        "embeddings",
        "events",
        "lineitem",
        "nation",
        "orders",
        "part",
        "region",
        "supplier",
    ]
    rows = [
        (name, detect_time_field(t(spark, sf_dir, name).columns)) for name in tables
    ]
    return spark.createDataFrame(rows, "tbl string, time_field string")


# ------------------------------------------------------ scalar functions


@query(
    "f1_py_str_fidelity",
    """
    SELECT event_id,
           CASE WHEN value > 50 THEN 'True' ELSE 'False' END AS flag_str,
           substring(event_type, 1, 3) AS type_prefix
    FROM events
    """,
)
def f1_py_str_fidelity(spark, sf_dir):
    """Python str() fidelity: booleans render True/False
    (es/es_to_bytehouse.py:573-574), substring truncation (F12)."""
    from es_to_clickhouse_spark.functions import py_str
    from pyspark.sql import types as T

    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        py_str(F.col("value") > 50, T.BooleanType()).alias("flag_str"),
        F.substring("event_type", 1, 3).alias("type_prefix"),
    )


@query(
    "f2_json_roundtrip",
    """
    SELECT event_id,
           '{"k":' || json_extract_string(props, '$.k') || '}' AS props_json
    FROM events
    """,
)
def f2_json_roundtrip(spark, sf_dir):
    """json.dumps fidelity: parse → re-serialize compact
    (es/es_to_bytehouse.py:565,569)."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.to_json(F.from_json(F.col("props"), "struct<k:bigint>")).alias("props_json"),
    )


@query(
    "f6_isoformat",
    """
    SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%S') AS ts_iso
    FROM events WHERE event_id < 1000
    """,
)
def f6_isoformat(spark, sf_dir):
    """datetime.isoformat() T-separator fidelity
    (mongodb/mongodb_to_bytehouse.py:322-324)."""
    ev = t(spark, sf_dir, "events")
    return ev.where(F.col("event_id") < 1000).select(
        "event_id", F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("ts_iso")
    )


@query(
    "f7_hex_lower",
    """
    SELECT doc_id, lower(hex(substring(text, 1, 8))) AS text_hex
    FROM documents
    """,
)
def f7_hex_lower(spark, sf_dir):
    """bytes.hex() lowercase fidelity (mongodb/mongodb_to_bytehouse.py:325-327)."""
    from es_to_clickhouse_spark.functions import hex_lower

    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", hex_lower(F.substring("text", 1, 8)).alias("text_hex"))


@query(
    "f14_progress_math",
    """
    SELECT event_type,
           count(*) AS n,
           round(count(*) / 60.0, 4) AS speed,
           round(count(*) * 100.0 / (SELECT count(*) FROM events), 4) AS progress
    FROM events GROUP BY event_type
    """,
)
def f14_progress_math(spark, sf_dir):
    """The reference's progress/ETA arithmetic as columns
    (es/es_to_bytehouse.py:639-643)."""
    ev = t(spark, sf_dir, "events")
    total = ev.agg(F.count(F.lit(1)).alias("total"))
    return (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .select(
            "event_type",
            "n",
            F.round(F.col("n") / 60.0, 4).alias("speed"),
            F.round(F.col("n") * 100.0 / F.col("total"), 4).alias("progress"),
        )
    )


@query(
    "flat2_mongo_stringify",
    """
    SELECT CAST(event_id AS VARCHAR) AS event_id,
           '{"user_id":' || user_id || ',"event_type":"' || event_type || '"}'
             AS profile,
           strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') AS ts,
           CAST(value AS VARCHAR) AS value
    FROM events WHERE event_id < 2000
    """,
)
def flat2_mongo_stringify(spark, sf_dir):
    """Mongo stringify dialect end-to-end: struct→JSON, timestamp→isoformat,
    scalars→str (mongodb/mongodb_to_bytehouse.py:306-333)."""
    ev = (
        t(spark, sf_dir, "events")
        .where(F.col("event_id") < 2000)
        .select(
            "event_id",
            F.struct("user_id", "event_type").alias("profile"),
            "ts",
            "value",
        )
    )
    return flatten_mongo(ev)


@query(
    "f8_parse_isoformat",
    """
    SELECT event_id,
           strftime(strptime(strftime(ts, '%Y-%m-%dT%H:%M:%S'),
                             '%Y-%m-%dT%H:%M:%S'),
                    '%Y-%m-%d %H:%M:%S') AS parsed_s
    FROM events
    """,
)
def f8_parse_isoformat(spark, sf_dir):
    """F8: datetime.fromisoformat parse
    (mongodb/mongodb_to_bytehouse.py:616) — ISO-'T' strings parsed back to
    timestamps with to_timestamp."""
    from es_to_clickhouse_spark.functions import ts_seconds

    e = t(spark, sf_dir, "events")
    iso = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss")
    return e.select(
        "event_id",
        ts_seconds(F.to_timestamp(iso, "yyyy-MM-dd'T'HH:mm:ss")).alias("parsed_s"),
    )


@query(
    "f12_substring_truncate",
    """
    SELECT doc_id, substr(text, 1, 100) AS prefix100, substr(text, 1, 20) AS prefix20
    FROM documents
    """,
)
def f12_substring_truncate(spark, sf_dir):
    """F12: substring truncation (msg[:100], [:20] —
    es/es_to_bytehouse.py:50,67)."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.substring("text", 1, 100).alias("prefix100"),
        F.substring("text", 1, 20).alias("prefix20"),
    )


@query(
    "f19_regexp_functions",
    """
    SELECT event_id,
           CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k_val,
           regexp_replace(event_type, '[aeiou]', '*', 'g') AS masked_type
    FROM events
    """,
)
def f19_regexp_functions(spark, sf_dir):
    """Regex surface: group extraction from the JSON-ish props string and
    global character-class replacement — both JVM-side (no UDF); DuckDB
    needs the 'g' flag to match Spark's replace-all default."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.regexp_extract("props", r'"k": (\d+)', 1).cast("bigint").alias("k_val"),
        F.regexp_replace("event_type", "[aeiou]", "*").alias("masked_type"),
    )


@query(
    "f25_array_set_ops",
    """
    WITH p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             list_distinct(list_filter(string_split(a.text, ' '), x -> x != ''))
               AS ta,
             list_distinct(list_filter(string_split(b.text, ' '), x -> x != ''))
               AS tb
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      WHERE a.doc_id % 10 = 0
    )
    SELECT id_a, id_b,
           CAST(len(list_intersect(ta, tb)) AS BIGINT) AS n_intersect,
           CAST(len(list_distinct(list_concat(ta, tb))) AS BIGINT) AS n_union,
           CAST(len(list_filter(ta, x -> NOT list_contains(tb, x)))
             AS BIGINT) AS n_except,
           CASE WHEN len(list_intersect(ta, tb)) > 0 THEN 1 ELSE 0 END
             AS overlaps
    FROM p
    """,
)
def f25_array_set_ops(spark, sf_dir):
    """Array set-algebra battery (array_intersect / array_union /
    array_except / arrays_overlap) over adjacent documents' token sets
    — the JVM-side set ops every dedup verify stage leans on, checked
    as CARDINALITIES (element order after a set op is engine-specific
    and deliberately not part of the contract; sizes are). All four ops
    evaluate in one codegen'd projection per pair."""
    d = t(spark, sf_dir, "documents")
    tok = F.array_distinct(F.filter(F.split("text", " "), lambda x: x != ""))
    a = d.where(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("id_a"), tok.alias("ta")
    )
    b = d.select((F.col("doc_id")).alias("id_b"), tok.alias("tb"))
    p = a.join(b, F.col("id_b") == F.col("id_a") + 1)
    return p.select(
        "id_a",
        "id_b",
        F.size(F.array_intersect("ta", "tb")).cast("long").alias("n_intersect"),
        F.size(F.array_union("ta", "tb")).cast("long").alias("n_union"),
        F.size(F.array_except("ta", "tb")).cast("long").alias("n_except"),
        F.when(F.arrays_overlap("ta", "tb"), 1).otherwise(0).alias("overlaps"),
    )
