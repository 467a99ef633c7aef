"""Environment-variable configuration — deployment parity with the
reference containers.

The reference daemons are configured entirely via env vars baked into
their Dockerfiles (es/Dockerfile:25-42: BATCH_SIZE, SCROLL_SIZE,
INCREMENTAL_INTERVAL, SKIP_FULL_SYNC, STORE_SOURCE, INDEX_PATTERN,
LOG_LEVEL…) and launched by an entrypoint that runs a full sync then
hands off to the continuous loop (es/entrypoint.sh:23-48, honoring
SKIP_FULL_SYNC). This module gives the CLI the same surface: every env
var is a *default* that explicit CLI flags override.

Mappings onto the Spark engine:

- ``INDEX_PATTERN`` / ``TABLE_PATTERN`` / ``COLLECTION_PATTERN`` (the
  three daemons' names for the same thing) → ``--tables``.
- ``INCREMENTAL_INTERVAL`` → ``--interval`` (seconds between rounds).
- ``BATCH_SIZE`` / ``SYNC_BATCH_SIZE`` → max records per output file on
  append (the INSERT-chunk analog: bounds the unit of work a single
  file represents, via Spark's ``maxRecordsPerFile``).
- ``SKIP_FULL_SYNC`` → entrypoint mode skips step 1 (full sync).
- ``STORE_SOURCE`` → keep the whole doc as a ``_source`` JSON column.
- ``START_DATE`` → stateless-table incremental bootstrap
  (mongodb_to_bytehouse.py ``--start-date``).
- ``SOURCE_DIR`` / ``WAREHOUSE_DIR`` → the testbed's stand-ins for the
  reference's connection env vars (ES_HOST / BYTEHOUSE_HOST…).
- ``LOG_LEVEL`` → driver log level (es/Dockerfile:41).

Boolean parsing accepts ``true/1/yes`` case-insensitively, matching
mongodb/mongodb_to_bytehouse.py:132.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

_TRUTHY = ("true", "1", "yes")


def env_bool(environ: dict, name: str, default: bool = False) -> bool:
    raw = environ.get(name)
    if raw is None:
        return default
    return raw.strip().lower() in _TRUTHY


def env_first(environ: dict, names: list[str], default=None):
    for n in names:
        if environ.get(n) not in (None, ""):
            return environ[n]
    return default


@dataclass
class EnvConfig:
    source_dir: str | None = None
    warehouse: str | None = None
    tables: str | None = None
    interval: float = 60.0
    batch_size: int | None = None
    skip_full_sync: bool = False
    store_source: bool = False
    start_date: str | None = None
    dialect: str = "es"
    id_field: str | None = None
    log_level: str = "WARN"
    # live ClickHouse HTTP-interface source (sources/ch_http.py) — the
    # reference clickhouse daemon's connection surface
    # (clickhouse_to_bytehouse.py:60-68: CLICKHOUSE_HOST/PORT,
    # SOURCE_CH_DATABASE) collapsed to one URL + database + time column
    ch_http_url: str | None = None
    ch_database: str = "default"
    time_column: str = "created_at"
    # live ClickHouse HTTP-interface SINK — the reference's target side
    # (TARGET_BH_HOST/TARGET_BH_DATABASE, clickhouse_to_bytehouse.py:71-75;
    # TARGET_DATABASE, es/es_to_bytehouse.py:151) as one URL + database
    ch_sink_url: str | None = None
    ch_sink_database: str = "default"
    # live Elasticsearch HTTP source (sources/es.py sliced scroll) —
    # the reference's ES_HOST/ES_PORT (es/es_to_bytehouse.py:145-147)
    # collapsed to one URL; slices = executor fan-out per index
    es_http_url: str | None = None
    es_cursor: str = "scroll"  # or "search_after" (PIT, ES 8.x)
    slices: int = 8
    # live MongoDB over the raw OP_MSG socket (sources/mongo_wire.py) —
    # the reference's MONGO_URI/MONGO_DATABASE surface
    # (mongodb/mongodb_to_bytehouse.py:117-118)
    mongo_uri: str | None = None
    mongo_database: str = "test"

    @classmethod
    def from_env(cls, environ: dict | None = None) -> "EnvConfig":
        e = environ if environ is not None else dict(os.environ)
        batch = env_first(e, ["BATCH_SIZE", "SYNC_BATCH_SIZE"])
        return cls(
            source_dir=env_first(e, ["SOURCE_DIR"]),
            warehouse=env_first(e, ["WAREHOUSE_DIR", "WAREHOUSE"]),
            tables=env_first(
                e, ["INDEX_PATTERN", "TABLE_PATTERN", "COLLECTION_PATTERN"]
            ),
            interval=float(env_first(e, ["INCREMENTAL_INTERVAL"], 60.0)),
            batch_size=int(batch) if batch is not None else None,
            skip_full_sync=env_bool(e, "SKIP_FULL_SYNC"),
            store_source=env_bool(e, "STORE_SOURCE"),
            start_date=env_first(e, ["START_DATE"]),
            dialect=env_first(e, ["SYNC_DIALECT"], "es"),
            id_field=env_first(e, ["ID_FIELD"]),
            log_level=env_first(e, ["LOG_LEVEL"], "WARN").upper(),
            ch_http_url=env_first(e, ["CH_HTTP_URL"]),
            ch_database=env_first(e, ["SOURCE_CH_DATABASE"], "default"),
            time_column=env_first(e, ["TIME_COLUMN"], "created_at"),
            ch_sink_url=env_first(e, ["CH_SINK_URL", "TARGET_CH_HTTP_URL"]),
            ch_sink_database=env_first(
                e, ["TARGET_DATABASE", "TARGET_BH_DATABASE"], "default"
            ),
            es_http_url=env_first(e, ["ES_HTTP_URL"]),
            es_cursor=env_first(e, ["ES_CURSOR"], "scroll"),
            slices=int(env_first(e, ["ES_SLICES"], 8)),
            mongo_uri=env_first(e, ["MONGO_URI"]),
            mongo_database=env_first(e, ["MONGO_DATABASE"], "test"),
        )
