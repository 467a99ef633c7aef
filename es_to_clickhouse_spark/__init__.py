"""es_to_clickhouse_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference
`itswl/es-to-clickhouse` (three single-threaded Python ETL daemons:
ES→ByteHouse, ClickHouse→ByteHouse, MongoDB→ByteHouse) as an idiomatic
Spark engine:

- DataFrame/SQL operators planned by Catalyst (pushdown, pruning, AQE)
  instead of hand-rolled pagination loops.
- Structured-Streaming-shaped incremental sync with a queryable
  ``_sync_state`` watermark table (reference: `es/es_to_bytehouse.py:412-465`).
- Schema-driven document flattening (reference: `es/es_to_bytehouse.py:544-575`)
  as generated ``select`` expressions — not UDFs.
- LLM-data-pipeline extensions: dedup (exact / MinHash-LSH / n-gram
  Jaccard / embedding), similarity search, text analysis, multimodal
  column plumbing.

Nothing in this package is ported from the reference's control flow; file:line
citations in docstrings point at the *behavior* being re-expressed.
"""

__version__ = "0.1.0"

from es_to_clickhouse_spark.session import get_spark  # noqa: F401
