"""Incremental-scan predicate builders + watermark computation (SURVEY P5-P7, A1-A2, T2-T5).

The reference compiles watermark filters into each source's native query
language (ES range DSL es/es_to_bytehouse.py:841-861; CH SQL WHERE
clickhouse/clickhouse_to_bytehouse.py:455-468; Mongo $gt filters
mongodb/mongodb_to_bytehouse.py:611-631). In Spark these are Column
predicates — Catalyst pushes them into the scan (parquet row-group pruning
/ JDBC WHERE / connector pushdown), so the same declarative filter is the
pushdown.

Watermarks advance via ``max()`` aggregates over the batch (the Spark
version of the reference's in-flight running max, es/es_to_bytehouse.py:909-919).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: time-field autodetection candidates (es/es_to_bytehouse.py:156)
TIME_FIELD_CANDIDATES = [
    "timestamp",
    "@timestamp",
    "cTime",
    "StartTime",
    "ExecutionTime",
    "doc_time",
    "created_at",
    "updated_at",
    "_timestamp",
    "ts",  # testbed events table
    "o_orderdate",
    "l_shipdate",
]

#: update-time candidates (es/es_to_bytehouse.py:500)
UPDATE_FIELD_CANDIDATES = [
    "updated_at",
    "updateTime",
    "update_time",
    "modifiedAt",
    "modified_at",
    "lastModified",
]


def detect_time_field(columns: list[str], candidates: list[str] | None = None) -> str | None:
    """First candidate present in the schema (es/es_to_bytehouse.py:467-496).
    The reference's ``@timestamp``→``timestamp`` rebind (P13) is handled by
    checking sanitized names too."""
    cands = candidates or TIME_FIELD_CANDIDATES
    colset = set(columns)
    for c in cands:
        if c in colset:
            return c
        sanitized = c.replace("@", "")
        if sanitized in colset:
            return sanitized
    return None


def detect_update_time_field(columns: list[str]) -> str | None:
    return detect_time_field(columns, UPDATE_FIELD_CANDIDATES)


def watermark_predicate(
    time_field: str,
    since,
    update_field: str | None = None,
    since_update=None,
) -> Column:
    """Strictly-greater watermark; with an update field, the OR-of-ranges
    re-fetch of updated docs (es/es_to_bytehouse.py:841-861, minimum_should_match=1)."""
    pred = F.col(time_field) > F.lit(since)
    if update_field and since_update is not None:
        pred = pred | (F.col(update_field) > F.lit(since_update))
    return pred


def keyset_predicate(id_field: str, last_id, dtype=None) -> Column:
    """Mongo-style keyset watermark ``_id > last``
    (mongodb/mongodb_to_bytehouse.py:611-631).

    ``dtype`` (a Spark DataType or DDL string): cast the stored string
    watermark back to the column's NATIVE type before comparing, so
    numeric ids compare numerically — a lexicographic string compare
    breaks on them ('100' < '99', skipping every id that grows a digit).
    String comparison is only safe for fixed-width ids like Mongo's
    24-hex ObjectIds."""
    lit = F.lit(last_id)
    if dtype is not None:
        lit = lit.cast(dtype)
    return F.col(id_field) > lit


def bootstrap_window_predicate(time_field: str, days: int = 1) -> Column:
    """First-incremental-run-with-no-state default: trailing window
    ``t > now() - INTERVAL 1 DAY`` (clickhouse/clickhouse_to_bytehouse.py:467)."""
    return F.col(time_field) > F.current_timestamp() - F.expr(f"INTERVAL {days} DAY")


@dataclass
class BatchWatermarks:
    rows: int
    max_time: str | None
    max_update: str | None
    max_id: str | None


def batch_watermarks(
    df: DataFrame,
    time_field: str | None,
    update_field: str | None = None,
    id_field: str | None = None,
) -> BatchWatermarks:
    """One pass over the batch: count + max(t) + max(u) + max(id)
    (replaces the reference's per-row running max, es/es_to_bytehouse.py:909-919).
    A single partial-aggregated job — no collect of data rows."""
    aggs = [F.count(F.lit(1)).alias("n")]
    if time_field:
        aggs.append(F.max(time_field).cast("string").alias("max_t"))
    if update_field:
        aggs.append(F.max(update_field).cast("string").alias("max_u"))
    if id_field:
        aggs.append(F.max(id_field).cast("string").alias("max_id"))
    row = df.agg(*aggs).collect()[0]
    d = row.asDict()
    return BatchWatermarks(
        rows=d["n"],
        max_time=d.get("max_t"),
        max_update=d.get("max_u"),
        max_id=d.get("max_id"),
    )
