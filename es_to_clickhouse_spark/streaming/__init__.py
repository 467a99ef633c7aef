"""Structured Streaming sync path (SURVEY §2.9).

The reference's continuous mode is a poll loop (es/es_to_bytehouse.py:
1069-1102). The engine offers two equivalents:

- :class:`~es_to_clickhouse_spark.engine.SyncEngine.sync_continuous` — a
  driver loop of incremental micro-batches (closest to the reference).
- This module — a real ``readStream`` → ``foreachBatch`` pipeline with
  checkpointing, for sources that stream (file arrival here; Kafka/CDC in
  a real deployment). Each micro-batch flows through the same
  WarehouseTarget/StateStore as batch mode, so delivery semantics and the
  queryable ``_sync_state`` table are identical in both paths.
"""

from es_to_clickhouse_spark.streaming.sync import StreamingSync  # noqa: F401
