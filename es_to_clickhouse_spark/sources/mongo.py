"""MongoDB source via mongo-spark (connector not installed — options logic
is pure + tested; the read raises with setup instructions).

Reference behaviors mapped:
- keyset full scan (`_id > last`, mongodb/mongodb_to_bytehouse.py:524-532)
  ↔ the connector's partitioner splitting on _id;
- incremental `$gt` filters (mongodb/mongodb_to_bytehouse.py:611-631) ↔
  ``aggregation.pipeline`` $match pushdown built by :func:`match_pipeline`;
- `$sample` field scan (mongodb/mongodb_to_bytehouse.py:347-361) ↔
  ``sample_pipeline``.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def match_pipeline(
    last_id: str | None = None,
    time_field: str | None = None,
    since_iso: str | None = None,
) -> str:
    """$match stage for incremental sync: keyset `_id $gt` or time `$gt`
    (mongodb/mongodb_to_bytehouse.py:611-631)."""
    if last_id:
        match = {"_id": {"$gt": {"$oid": last_id}}}
    elif time_field and since_iso:
        match = {time_field: {"$gt": {"$date": since_iso}}}
    else:
        match = {}
    return json.dumps([{"$match": match}])


def sample_pipeline(size: int = 1000) -> str:
    """$sample schema-discovery stage (mongodb/mongodb_to_bytehouse.py:347-353)."""
    return json.dumps([{"$sample": {"size": size}}])


@dataclass
class KeysetSession:
    """The reference's Mongo full-scan protocol as a PURE fold over
    recorded batches (mongodb/mongodb_to_bytehouse.py:524-565): repeated
    ``find(query).sort("_id", 1).limit(batch_size)`` where the query is
    ``{}`` on the first page and ``{"_id": {"$gt": last_id}}`` after —
    keyset pagination, NOT an open server cursor, so the scan is
    restartable from any watermark and needs no server-side state. The
    loop ends on the first empty batch; a failed fetch keeps the rows
    already drained (at-least-once partial progress, the reference
    returns total_synced on error). ``drain(batches)`` replays recorded
    batch results and returns ``(rows, queries)`` so tests golden-check
    the wire exchange with zero network; the production read path is the
    connector (:class:`MongoSource`, partitioner splitting on _id), and
    this class pins the PROTOCOL the watermark logic must honor."""

    batch_size: int = 1000

    def query_for(self, last_id: str | None) -> dict:
        q = {"_id": {"$gt": last_id}} if last_id else {}
        return {"filter": q, "sort": [("_id", 1)], "limit": self.batch_size}

    def drain(
        self,
        batches: list[list[dict] | Exception],
        store_source: bool = False,
    ) -> tuple[list[dict], list[dict]]:
        rows: list[dict] = []
        queries: list[dict] = []
        last_id: str | None = None
        queries.append(self.query_for(last_id))
        for batch in batches:
            if isinstance(batch, Exception):
                break  # partial progress kept
            if not batch:
                break
            for doc in batch:
                row = {"_id": str(doc.get("_id", ""))}
                if store_source:
                    row["_source"] = json.dumps(
                        doc, ensure_ascii=False, default=str
                    )
                row.update({k: v for k, v in doc.items() if k != "_id"})
                rows.append(row)
                last_id = doc.get("_id")
            queries.append(self.query_for(last_id))
        return rows, queries


@dataclass
class MongoSource:
    uri: str = "mongodb://localhost:27017"
    database: str = "test"

    def options(self, collection: str, pipeline: str | None = None) -> dict[str, str]:
        opts = {
            "connection.uri": self.uri,
            "database": self.database,
            "collection": collection,
            # split on _id like the reference's keyset walk, but in parallel
            "partitioner": "com.mongodb.spark.sql.connector.read.partitioner.SamplePartitioner",
        }
        if pipeline:
            opts["aggregation.pipeline"] = pipeline
        return opts

    def read_collection(
        self, spark: SparkSession, collection: str, pipeline: str | None = None
    ) -> DataFrame:
        try:
            return (
                spark.read.format("mongodb")
                .options(**self.options(collection, pipeline))
                .load()
            )
        except Exception as e:  # noqa: BLE001
            raise RuntimeError(
                "MongoDB read requires the mongo-spark connector: "
                "spark-submit --packages "
                "org.mongodb.spark:mongo-spark-connector_2.13:10.x. "
                f"Underlying: {e}"
            ) from e
