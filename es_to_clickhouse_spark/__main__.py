"""CLI — the Spark-native twin of the reference daemons' argparse surface.

Reference entry points re-expressed (SURVEY §3):
- ``--mode full``        es/es_to_bytehouse.py:1210-1257 (run_full_sync)
- ``--mode incremental`` one bounded round
- ``--mode continuous``  es/es_to_bytehouse.py:1053-1102 (poll loop;
  ``--interval`` = INCREMENTAL_INTERVAL, default 60 s)
- ``--mode auto``        mongodb/mongodb_to_bytehouse.py:811-866
- ``--mode status``      clickhouse/clickhouse_to_bytehouse.py:205-224
- ``--list-only``        es/es_to_bytehouse.py:1246-1253

Usage::

    python -m es_to_clickhouse_spark \
        --source-dir /root/testdata/sf0.001 --warehouse /tmp/wh \
        --mode auto --tables 'events,line*'
"""

from __future__ import annotations

import argparse
import json
import sys

from es_to_clickhouse_spark.catalog import ParquetCatalog
from es_to_clickhouse_spark.config import EnvConfig
from es_to_clickhouse_spark.engine import SyncEngine
from es_to_clickhouse_spark.session import get_spark
from es_to_clickhouse_spark.sink import WarehouseTarget
from es_to_clickhouse_spark.state import StateStore


def build_parser(env: EnvConfig | None = None) -> argparse.ArgumentParser:
    """CLI with env-var defaults (reference es/Dockerfile:25-42): every
    flag falls back to its env twin, so a container can be driven purely
    by environment like the reference daemons."""
    env = env or EnvConfig.from_env()
    p = argparse.ArgumentParser(
        prog="es_to_clickhouse_spark",
        description="PySpark-native sync engine (full/incremental/continuous/auto)",
    )
    p.add_argument(
        "--mode",
        choices=[
            "full",
            "incremental",
            "continuous",
            "auto",
            "entrypoint",
            "status",
            "list",
        ],
        default="auto",
        help="'entrypoint' = full sync then continuous handoff "
        "(es/entrypoint.sh:23-48; SKIP_FULL_SYNC=true skips step 1)",
    )
    p.add_argument(
        "--source-dir",
        default=env.source_dir,
        help="parquet source catalog dir [env: SOURCE_DIR] — required "
        "unless --ch-http-url drives a live incremental sync",
    )
    p.add_argument(
        "--warehouse",
        required=env.warehouse is None,
        default=env.warehouse,
        help="target warehouse dir [env: WAREHOUSE_DIR]",
    )
    p.add_argument(
        "--tables",
        default=env.tables,
        help="comma-separated glob patterns (clickhouse_to_bytehouse.py:83-98) "
        "[env: INDEX_PATTERN / TABLE_PATTERN / COLLECTION_PATTERN]",
    )
    p.add_argument(
        "--interval",
        type=float,
        default=env.interval,
        help="continuous poll seconds [env: INCREMENTAL_INTERVAL]",
    )
    p.add_argument(
        "--max-rounds", type=int, default=None, help="bound continuous rounds"
    )
    p.add_argument(
        "--batch-size",
        type=int,
        default=env.batch_size,
        help="max records per output file on append — the INSERT-chunk "
        "analog [env: BATCH_SIZE / SYNC_BATCH_SIZE]",
    )
    p.add_argument(
        "--dialect",
        choices=["es", "mongo", "ch"],
        default=env.dialect,
        help="transform dialect: es=flatten, mongo=stringify, ch=typed "
        "passthrough [env: SYNC_DIALECT]",
    )
    p.add_argument(
        "--id-field",
        default=env.id_field,
        help="source column to expose as _id [env: ID_FIELD]",
    )
    p.add_argument(
        "--start-date",
        default=env.start_date,
        help="stateless-table incremental bootstrap: sync rows with "
        "time > START_DATE (mongodb_to_bytehouse.py --start-date) "
        "[env: START_DATE]",
    )
    p.add_argument(
        "--store-source",
        action="store_true",
        default=env.store_source,
        help="keep whole doc as a _source JSON column [env: STORE_SOURCE]",
    )
    p.add_argument(
        "--skip-full-sync",
        action="store_true",
        default=env.skip_full_sync,
        help="entrypoint mode: skip the initial full sync "
        "[env: SKIP_FULL_SYNC]",
    )
    p.add_argument(
        "--list-only", action="store_true", help="print matching tables and exit"
    )
    p.add_argument(
        "--ch-http-url",
        default=env.ch_http_url,
        help="ClickHouse HTTP-interface URL (e.g. http://ch:8123) — "
        "switches --mode incremental to the jar-free live source "
        "(sources/ch_http.py) instead of the parquet catalog "
        "[env: CH_HTTP_URL]",
    )
    p.add_argument(
        "--ch-database",
        default=env.ch_database,
        help="source ClickHouse database "
        "(reference SOURCE_CH_DATABASE, clickhouse_to_bytehouse.py:68) "
        "[env: SOURCE_CH_DATABASE]",
    )
    p.add_argument(
        "--time-column",
        default=env.time_column,
        help="incremental watermark column for the ch-http source "
        "(reference --time-column) [env: TIME_COLUMN]",
    )
    p.add_argument(
        "--es-http-url",
        default=env.es_http_url,
        help="Elasticsearch HTTP URL (e.g. http://es:9200) — switches "
        "--mode incremental to the jar-free live SLICED-SCROLL source "
        "(sources/es.py sync_incremental_es_http): full-bootstrap for "
        "unseen indices, watermark ranges after [env: ES_HTTP_URL]",
    )
    p.add_argument(
        "--es-cursor",
        choices=["scroll", "search_after"],
        default=env.es_cursor,
        help="pagination cursor for the live ES source: 'scroll' "
        "(reference parity) or 'search_after' (PIT + search_after — "
        "the ES 8.x replacement; stateless cursor, so transient page "
        "failures RETRY instead of degrading the round to partial) "
        "[env: ES_CURSOR]",
    )
    p.add_argument(
        "--slices",
        type=int,
        default=env.slices,
        help="executor fan-out for the live jar-free sources: sliced "
        "scroll contexts for ES, _id-range sub-cursors for Mongo (1 = "
        "serial reference walk); track the index's shard count at "
        "scale [env: ES_SLICES]",
    )
    p.add_argument(
        "--mongo-uri",
        default=env.mongo_uri,
        help="MongoDB URI (mongodb://host:port) — switches --mode "
        "incremental to the jar-free live OP_MSG source "
        "(sources/mongo_wire.py: keyset scan with typed _id resume) "
        "[env: MONGO_URI]",
    )
    p.add_argument(
        "--mongo-database",
        default=env.mongo_database,
        help="source MongoDB database (reference MONGO_DATABASE, "
        "mongodb_to_bytehouse.py:118) [env: MONGO_DATABASE]",
    )
    p.add_argument(
        "--ch-sink-url",
        default=env.ch_sink_url,
        help="ClickHouse HTTP-interface URL for the TARGET — synced "
        "rows land on the live server (CREATE/ALTER DDL + token-deduped "
        "INSERT, sources/ch_http.py ClickHouseHttpTarget) instead of "
        "the parquet warehouse; --warehouse still hosts sync state "
        "[env: CH_SINK_URL / TARGET_CH_HTTP_URL]",
    )
    p.add_argument(
        "--ch-sink-database",
        default=env.ch_sink_database,
        help="target ClickHouse database (reference TARGET_DATABASE, "
        "es/es_to_bytehouse.py:151) [env: TARGET_DATABASE]",
    )
    return p


def _expand_patterns(
    patterns: str,
    available: list[str],
    seen_errors: set[str] | None = None,
) -> tuple[list[str], int]:
    """Expand comma-separated glob patterns against a LIVE catalog and
    reject typo'd plain names up front — the same contract as the
    parquet-catalog path (fnmatch glob semantics,
    clickhouse_to_bytehouse.py:83-98). Prints one JSON error line per
    failure; returns (tables deduped in order, failure count). The
    failure count is PER CALL — a continuous loop re-lists the catalog
    every round, so a name that only materializes after round 1 must
    stop counting once it matches (ADVICE r9). ``seen_errors``: a set
    the caller carries across rounds to print each distinct error line
    once instead of every round."""
    import fnmatch

    tables: list[str] = []
    failures = 0

    def _err(line: dict) -> None:
        key = json.dumps(line, sort_keys=True)
        if seen_errors is None or key not in seen_errors:
            print(json.dumps(line))
            if seen_errors is not None:
                seen_errors.add(key)

    for pat in (patterns or "").split(","):
        pat = pat.strip()
        if not pat:
            continue
        if any(ch in pat for ch in "*?["):
            hits = [t for t in available if fnmatch.fnmatch(t, pat)]
            if not hits:
                _err({"pattern": pat, "error": "no match"})
                failures += 1
            tables.extend(hits)
        elif pat not in available:
            _err({"table": pat, "error": "table not found"})
            failures += 1
        else:
            tables.append(pat)
    return list(dict.fromkeys(tables)), failures


def main(argv: list[str] | None = None, environ: dict | None = None) -> int:
    env = EnvConfig.from_env(environ)
    parser = build_parser(env)
    args = parser.parse_args(argv)
    if args.es_cursor not in ("scroll", "search_after"):
        # argparse only checks `choices` on EXPLICIT flags — an invalid
        # ES_CURSOR env value arrives as the default and would silently
        # fall back to scroll, the exact failure mode the user opted
        # out of. Fail loudly instead.
        parser.error(
            f"invalid ES_CURSOR / --es-cursor {args.es_cursor!r}: "
            "expected 'scroll' or 'search_after'"
        )
    live_capable = args.mode in ("incremental", "continuous")
    ch_http_mode = live_capable and args.ch_http_url
    es_http_mode = live_capable and args.es_http_url
    mongo_mode = live_capable and args.mongo_uri
    live_modes = [m for m in (ch_http_mode, es_http_mode, mongo_mode) if m]
    if len(live_modes) > 1:
        parser.error(
            "--ch-http-url / --es-http-url / --mongo-uri are mutually "
            "exclusive source selections"
        )
    live_mode = bool(live_modes)
    if not args.source_dir and not live_mode:
        parser.error("--source-dir is required (or set SOURCE_DIR)")
    if live_mode and not [
        t for t in (args.tables or "").split(",") if t.strip()
    ]:
        # an empty pattern would loop zero tables and exit 0 — a silent
        # green no-op (ADVICE r7); fail loudly like the catalog path
        parser.error(
            "--tables is required with a live source "
            "(or set INDEX_PATTERN / COLLECTION_PATTERN)"
        )
    spark = get_spark("es_to_clickhouse_spark.cli")
    spark.sparkContext.setLogLevel(env.log_level)
    if args.ch_sink_url:
        # synced rows land on a LIVE ClickHouse over HTTP (the
        # reference's actual data flow: everything writes to the
        # CH/ByteHouse target, clickhouse_to_bytehouse.py:311-316);
        # --warehouse remains the home of sync state
        from es_to_clickhouse_spark.sources.ch_http import (
            ClickHouseHttpSource,
            ClickHouseHttpTarget,
        )

        target = ClickHouseHttpTarget(
            ClickHouseHttpSource(
                host=args.ch_sink_url, database=args.ch_sink_database
            )
        )
    else:
        target = WarehouseTarget(spark, args.warehouse)
    if args.batch_size:
        target.max_records_per_file = args.batch_size
        if args.ch_sink_url:
            target.source.batch_size = args.batch_size
    if live_mode:
        # live jar-free sources — all three reference daemons'
        # incremental loop bodies on one shared rounds loop. --mode
        # incremental = one round; --mode continuous = the reference's
        # poll loop (es/es_to_bytehouse.py:1053-1102: re-list the
        # catalog, sync each match, sleep INCREMENTAL_INTERVAL),
        # bounded by --max-rounds for tests, forever otherwise.
        import time as _time

        from es_to_clickhouse_spark.functions import is_system_name

        state = StateStore(spark, args.warehouse)
        if ch_http_mode:
            # (clickhouse_to_bytehouse.py:499-512)
            from es_to_clickhouse_spark.sources.ch_http import (
                ClickHouseHttpSource,
                sync_incremental_http,
            )

            src = ClickHouseHttpSource(
                host=args.ch_http_url, database=args.ch_database
            )
            list_fn = src.list_tables

            def sync_one(table):
                n, cond, wm = sync_incremental_http(
                    spark, src, target, state, table,
                    time_column=args.time_column, start_date=args.start_date,
                )
                return {"table": table, "mode": "incremental_ch_http",
                        "rows": n, "condition": cond, "watermark": wm}
        elif es_http_mode:
            # sliced-scroll live ES (es/es_to_bytehouse.py:963-1006);
            # composed with --ch-sink-url this is the reference's exact
            # ES→ClickHouse pipeline, end-to-end jar-free
            from es_to_clickhouse_spark.sources.es import (
                ScrollSession,
                SearchAfterSession,
                list_indices,
                sync_incremental_es_http,
            )

            # the two sessions share the whole drain surface — the
            # sync loop and read_index_http run unchanged over either
            cursor_cls = (
                SearchAfterSession
                if args.es_cursor == "search_after"
                else ScrollSession
            )
            sess = cursor_cls(host=args.es_http_url)

            def list_fn():
                return [
                    n for n in list_indices(sess)
                    if not is_system_name(n, "es")
                ]

            def sync_one(index):
                mode, n, wm = sync_incremental_es_http(
                    spark, sess, target, state, index,
                    start_date=args.start_date, slices=args.slices,
                    store_source=args.store_source,
                )
                return {"table": index, "mode": f"{mode}_es_http",
                        "rows": n, "watermark": wm}
        else:
            # raw OP_MSG live Mongo (mongodb_to_bytehouse.py:811-866)
            import urllib.parse as _up

            from es_to_clickhouse_spark.sources.mongo_wire import (
                MongoWireSession,
                list_collections,
                sync_incremental_mongo_wire,
            )

            u = _up.urlsplit(args.mongo_uri)
            msess = MongoWireSession(
                host=u.hostname or "127.0.0.1",
                port=u.port or 27017,
                database=args.mongo_database,
            )

            def list_fn():
                return [
                    c for c in list_collections(msess)
                    if not is_system_name(c, "mongo")
                ]

            def sync_one(coll):
                # --slices drives the _id-range pre-split exactly like
                # ES sliced scroll (1 = the reference's serial walk)
                mode, n, wm = sync_incremental_mongo_wire(
                    spark, msess, target, state, coll, splits=args.slices
                )
                return {"table": coll, "mode": f"{mode}_mongo_wire",
                        "rows": n, "watermark": wm}

        failures = 0
        pattern_failures = 0  # latest round only: a plain name that
        rounds = 0            # appears mid-run stops counting (ADVICE r9)
        seen_errors: set[str] = set()
        while True:
            available = None
            try:
                # re-listed EVERY round like the reference daemons —
                # tables created mid-run join the next round
                available = list_fn()
            except (OSError, ValueError) as e:
                # OSError = transport; ValueError = garbled response
                # surviving the retry budget. A one-shot mode fails the
                # invocation; a CONTINUOUS daemon must outlive a
                # transient catalog blip and retry next round — exiting
                # here turned one reset into a dead pipeline (the chaos
                # tests' liveness contract).
                print(json.dumps({"error": f"catalog: {e}"}))
                failures += 1
                if args.mode != "continuous":
                    return 1
            if available is not None:
                tables, pattern_failures = _expand_patterns(
                    args.tables, available, seen_errors=seen_errors
                )
                for table in tables:
                    try:
                        print(json.dumps(sync_one(table)))
                    except (OSError, ValueError) as e:
                        print(json.dumps({"table": table, "error": str(e)}))
                        failures += 1
            rounds += 1
            if args.mode != "continuous" or (
                args.max_rounds is not None and rounds >= args.max_rounds
            ):
                break
            _time.sleep(args.interval)
        return 1 if failures or pattern_failures else 0
    engine = SyncEngine(
        spark=spark,
        catalog=ParquetCatalog(spark, args.source_dir),
        target=target,
        state=StateStore(spark, args.warehouse),
        dialect=args.dialect,
        id_field=args.id_field,
        store_source=args.store_source,
    )
    if args.list_only or args.mode == "list":
        for name in engine.list_tables(args.tables):
            print(name)
        return 0
    if args.mode == "status":
        for row in engine.status().collect():
            print(json.dumps(row.asDict(), default=str))
        return 0
    if args.mode == "full":
        reports = engine.sync_full(args.tables)
    elif args.mode == "incremental":
        reports = engine.sync_incremental_once(args.tables, start_date=args.start_date)
    elif args.mode == "auto":
        reports = engine.sync_auto(args.tables)
    elif args.mode == "entrypoint":
        # full→continuous handoff (es/entrypoint.sh:23-48)
        reports = [] if args.skip_full_sync else engine.sync_full(args.tables)
        rounds = engine.sync_continuous(
            args.tables, interval_s=args.interval, max_rounds=args.max_rounds
        )
        reports += [r for rnd in rounds for r in rnd]
    else:  # continuous
        rounds = engine.sync_continuous(
            args.tables, interval_s=args.interval, max_rounds=args.max_rounds
        )
        reports = [r for rnd in rounds for r in rnd]
    for r in reports:
        print(
            json.dumps(
                {
                    "table": r.table,
                    "mode": r.mode,
                    "rows": r.rows,
                    "seconds": round(r.seconds, 3),
                    "watermark": r.watermark,
                }
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
