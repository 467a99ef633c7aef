"""readStream → foreachBatch continuous sync.

Maps the reference's semantics onto Structured Streaming:

- T1 micro-batch trigger: ``processingTime`` (default 60 s like
  INCREMENTAL_INTERVAL, es/es_to_bytehouse.py:155) or ``availableNow``
  for a bounded catch-up run.
- T2 watermark/offset tracking: Spark's checkpoint dir is the source of
  truth for offsets; the engine ALSO appends to the queryable
  ``_sync_state`` table per batch (the reference's state table is a
  user-facing feature, es/es_to_bytehouse.py:412-465).
- T3 late data: event-time watermark via ``withWatermark`` for windowed
  aggs; upsert reconciliation happens at read time (sink.upsert_view).
- T8 delivery: foreachBatch + idempotent-by-_id target = the same
  at-least-once + upsert contract as the reference.
- T4 upgrade on the LIVE ClickHouse sink: ``ch_http.write_table``
  with ``dedup_epoch=f"{table}:{batch_id}"`` carries a deterministic
  ``insert_deduplication_token`` per (partition, batch), so a Spark
  task retry re-posting a partition is dropped server-side —
  effectively-once per epoch, strictly stronger than the reference's
  bare at-least-once (duplicates possible on retry,
  clickhouse/clickhouse_to_bytehouse.py:313-316 has no token).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from es_to_clickhouse_spark.flatten import flatten_es
from es_to_clickhouse_spark.incremental import batch_watermarks, detect_time_field
from es_to_clickhouse_spark.sink import ID_COL, WarehouseTarget
from es_to_clickhouse_spark.state import StateStore, SyncState


@dataclass
class StreamingSync:
    spark: SparkSession
    target: WarehouseTarget
    state: StateStore
    id_field: str | None = None
    #: optional LIVE ClickHouse sink (sources/ch_http.ClickHouseHttpTarget):
    #: when set, each micro-batch ALSO lands on the real server with
    #: ``epoch=f"{table}:{batch_id}"`` — batch_id is durable in the
    #: streaming checkpoint, so a post-crash foreachBatch replay posts
    #: the SAME dedup tokens and the server drops the duplicate blocks:
    #: effectively-once end-to-end (T4 upgrade, see module docstring)
    ch_target: object | None = None
    #: optional ingest-time near-dup screen
    #: (operators.dedup.PersistedNearDupStore) — the foreachBatch twin
    #: of SyncEngine.neardup: each micro-batch screens against the
    #: parquet-persisted LSH store, drops verified near-dups from the
    #: sink, appends the novel rows' signatures. State still commits
    #: the FULL batch's watermark (wm is computed before the screen),
    #: so all-dup micro-batches cannot stall the stream's progress.
    neardup: object | None = None
    #: compact the near-dup store's append-round small files every N
    #: micro-batches (the streaming twin of SyncEngine.sync_continuous
    #: compact_every — a year of hourly appends is ~140k store files
    #: otherwise). Runs at the END of _handle_batch, after the store
    #: append, so no append is in flight during the directory swap.
    #: Keyed on batch_id (durable in the streaming checkpoint), so a
    #: replayed batch re-triggers the same idempotent compaction
    #: instead of drifting the cadence.
    compact_store_every: int | None = None

    def _handle_batch(self, table: str, source_name: str, batch: DataFrame, batch_id: int) -> None:
        """One micro-batch: flatten → append → state commit (the streaming
        twin of SyncEngine.sync_incremental_once)."""
        out = flatten_es(batch, stringify=False)
        if self.id_field and self.id_field in out.columns and ID_COL not in out.columns:
            out = out.withColumn(ID_COL, F.col(self.id_field).cast("string"))
        time_field = detect_time_field(out.columns)
        wm = batch_watermarks(out, time_field)
        if wm.rows == 0:
            return
        nd = self.neardup
        nd_novel = None
        if (
            nd is not None
            and getattr(nd, "id_col", None) in out.columns
            and nd.text_col in out.columns
        ):
            # screen_split, NOT ingest: the store append must come
            # after the sink append + state commit below, else a crash
            # between store and sink makes the checkpoint-replayed
            # batch screen as a near-dup of its own failed attempt —
            # dropped from the sink while the watermark advances,
            # breaking the effectively-once contract the ch_target
            # epoch path advertises (ADVICE r12, high). Post-commit
            # append is replay-safe: a re-appended signature set is
            # absorbed by screen_against_store's store-side dedup.
            out, _ = nd.screen_split(out.localCheckpoint())
            if out.isEmpty():
                # all near-dups: nothing to append, but the state
                # commit below still advances the full-batch watermark
                out = None
            else:
                nd_novel = out
        if out is not None:
            self.target.append(table, out)
            if self.ch_target is not None:
                # checkpoint-durable epoch: replayed batch → replayed tokens
                self.ch_target.append(table, out, epoch=f"{table}:{batch_id}")
        self.state.commit(
            SyncState(
                table_name=table,
                source_name=source_name,
                time_field=time_field,
                last_sync_time=wm.max_time,
                last_sync_count=wm.rows,
            )
        )
        if nd_novel is not None:
            # store append LAST — see the ordering comment above
            nd.append(nd_novel)
        if (
            nd is not None
            and self.compact_store_every
            and (batch_id + 1) % self.compact_store_every == 0
            and hasattr(nd, "compact")
        ):
            nd.compact(self.spark)

    def file_stream(
        self,
        source_dir: str,
        table: str,
        schema,
        checkpoint_dir: str,
        trigger: dict | None = None,
    ):
        """Continuous sync of a parquet-file-arrival source.

        ``trigger``: e.g. ``{"processingTime": "60 seconds"}`` (reference
        default) or ``{"availableNow": True}`` (bounded catch-up, used in
        tests). Returns the StreamingQuery; caller owns awaiting/stopping.
        """
        stream = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 64)
            .parquet(source_dir)
        )
        writer = (
            stream.writeStream.foreachBatch(
                lambda batch, bid: self._handle_batch(table, source_dir, batch, bid)
            )
            .option("checkpointLocation", checkpoint_dir)
            .trigger(**(trigger or {"processingTime": "60 seconds"}))
        )
        return writer.start()


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    keys: list[str] | None = None,
) -> DataFrame:
    """Late-data-tolerant windowed aggregation (T7): works on both batch
    and streaming DataFrames; on streams the watermark bounds state."""
    df = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    group = [F.window(ts_col, window).alias("w")] + [F.col(k) for k in (keys or [])]
    return df.groupBy(*group).agg(
        F.count(F.lit(1)).alias("n"),
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "30 minutes",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state (the streaming twin of
    operators/dedup.exact_dedup): duplicates of a key arriving within the
    watermark horizon are suppressed; state for a key is dropped once the
    watermark passes, so memory is O(keys-per-horizon), not O(all keys
    ever) — the property that keeps a continuous 100 TB ingest alive."""
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    left_watermark: str = "30 minutes",
    right_watermark: str = "30 minutes",
    within: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join: match left rows to right
    rows with the same key where right_ts in [left_ts, left_ts + within].
    Both watermarks + the time-range predicate bound the join state on
    BOTH sides (without the range condition Spark would buffer streams
    forever). The batch analogue is operators/range_join.py.

    ``how='left_outer'`` additionally emits unmatched left rows (null
    right columns) — but only once the watermark passes their match
    window's upper bound, i.e. in a LATER micro-batch; an attribution
    pipeline sees its no-click impressions one watermark-delay late."""
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= F.expr(f"{left_ts} + INTERVAL {within}"))
    )
    return lw.join(rw, cond, how).drop(rw[key])
