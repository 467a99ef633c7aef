"""Elasticsearch source via elasticsearch-hadoop (connector not installed —
options logic is pure + tested; the read raises with setup instructions).

Reference behaviors mapped:
- scroll pagination (es/es_to_bytehouse.py:577-673) ↔ connector-managed
  per-shard splits (``es.scroll.size``);
- range watermark in query DSL (es/es_to_bytehouse.py:841-861) ↔
  ``es.query`` pushdown built by :func:`range_query`;
- catalog pattern (`_cat/indices/{pattern}`, es/es_to_bytehouse.py:239-258)
  ↔ index wildcard in the resource string.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def range_query(
    time_field: str,
    since: str | None = None,
    update_field: str | None = None,
    since_update: str | None = None,
) -> str:
    """The reference's incremental query DSL (es/es_to_bytehouse.py:841-861):
    strict-greater range, or OR-of-ranges with minimum_should_match=1."""
    if since is None:
        return json.dumps({"query": {"match_all": {}}})
    ranges = [{"range": {time_field: {"gt": since}}}]
    if update_field and since_update is not None:
        ranges.append({"range": {update_field: {"gt": since_update}}})
        return json.dumps(
            {"query": {"bool": {"should": ranges, "minimum_should_match": 1}}}
        )
    return json.dumps({"query": {"bool": {"filter": ranges[0]}}})


@dataclass
class EsSource:
    nodes: str = "localhost"
    port: int = 9200
    scroll_size: int = 1000  # SCROLL_SIZE default (es/es_to_bytehouse.py:149)
    scroll_timeout: str = "5m"  # SCROLL_TIMEOUT (es/es_to_bytehouse.py:150)

    def options(self, index: str, query: str | None = None) -> dict[str, str]:
        opts = {
            "es.nodes": self.nodes,
            "es.port": str(self.port),
            "es.resource": index,
            "es.scroll.size": str(self.scroll_size),
            "es.scroll.keepalive": self.scroll_timeout,
            "es.read.metadata": "true",  # exposes _id (target key, S14)
        }
        if query:
            opts["es.query"] = query
        return opts

    def read_index(
        self, spark: SparkSession, index: str, query: str | None = None
    ) -> DataFrame:
        try:
            return (
                spark.read.format("org.elasticsearch.spark.sql")
                .options(**self.options(index, query))
                .load()
            )
        except Exception as e:  # noqa: BLE001
            raise RuntimeError(
                "Elasticsearch read requires the elasticsearch-hadoop "
                "connector: spark-submit --packages "
                "org.elasticsearch:elasticsearch-spark-30_2.13:8.x. "
                f"Underlying: {e}"
            ) from e
