"""Source readers behind one interface (SURVEY §2.1).

The testbed source is parquet (catalog.ParquetCatalog). Production
sources mirror the reference's three systems, each expressed as a
Catalyst-planned connector read instead of hand-rolled pagination:

- :mod:`.jdbc` — ClickHouse (or any JDBC) with **partitioned range
  scans** replacing the reference's O(n²) LIMIT/OFFSET walk
  (clickhouse/clickhouse_to_bytehouse.py:303-306).
- :mod:`.es` — Elasticsearch via the elasticsearch-hadoop connector
  (scroll pagination ↔ connector-managed splits).
- :mod:`.mongo` — MongoDB via the mongo-spark connector (keyset paging ↔
  partitioner).

- :mod:`.json_docs` — dynamic-schema JSON document ingestion: sampled
  schema inference, batch-over-batch schema evolution, malformed-row
  quarantine (the reference's sampled scans + reactive schema repair,
  es/es_to_bytehouse.py:338-395,696-736, re-expressed declaratively).

The ES/Mongo connectors aren't installed in this container; their
readers raise a clear error with the exact spark-submit packages needed,
while their *option-building* logic (URL, pushdown, split sizing) is pure
and unit-tested.
"""
