"""Unit tests: StateStore + WarehouseTarget (SURVEY T2, S14-S19)."""

from __future__ import annotations

from pyspark.sql import functions as F

from es_to_clickhouse_spark.sink import WarehouseTarget, upsert_view
from es_to_clickhouse_spark.state import StateStore, SyncState


def test_state_roundtrip_latest_wins(spark, tmp_path):
    store = StateStore(spark, str(tmp_path))
    assert store.get("t1") is None
    assert not store.has_synced_before("t1")
    store.commit(SyncState("t1", time_field="ts", last_sync_time="2024-01-01"))
    store.commit(SyncState("t1", time_field="ts", last_sync_time="2024-01-02"))
    st = store.get("t1")
    # latest row per key (ORDER BY updated_at DESC LIMIT 1,
    # es/es_to_bytehouse.py:437-440)
    assert st.last_sync_time == "2024-01-02"
    assert store.has_synced_before("t1")
    assert store.read_all().count() == 2  # append-only underneath


def test_state_status_ordering(spark, tmp_path):
    store = StateStore(spark, str(tmp_path))
    for i in range(3):
        store.commit(SyncState(f"t{i}"))
    rows = store.status(limit=2).collect()
    assert len(rows) == 2
    assert rows[0].updated_at >= rows[1].updated_at


def test_target_append_and_evolution(spark, tmp_path):
    target = WarehouseTarget(spark, str(tmp_path))
    df1 = spark.createDataFrame([("1", "a")], "_id string, x string")
    target.append("tbl", df1)
    assert target.live_columns("tbl") >= {"_id", "x", "_timestamp"}
    # new column appears in batch 2 → evolution, old rows NULL
    df2 = spark.createDataFrame([("2", "b", "z")], "_id string, x string, y string")
    target.append("tbl", df2)
    out = target.read("tbl", dedup=False)
    assert set(out.columns) >= {"_id", "x", "y"}
    got = {r._id: r.y for r in out.select("_id", "y").collect()}
    assert got == {"1": None, "2": "z"}


def test_target_upsert_read(spark, tmp_path):
    target = WarehouseTarget(spark, str(tmp_path))
    df1 = spark.createDataFrame([("1", "old")], "_id string, v string")
    target.append("tbl", df1)
    df2 = spark.createDataFrame([("1", "new")], "_id string, v string")
    target.append("tbl", df2)
    merged = target.read("tbl", dedup=True)
    assert merged.count() == 1
    assert merged.collect()[0].v == "new"


def test_upsert_view_ties_stable(spark):
    df = spark.createDataFrame(
        [("k", 1, "a"), ("k", 1, "a")], "_id string, _timestamp long, v string"
    )
    out = upsert_view(df, "_id", "_timestamp")
    assert out.count() == 1


def test_max_of_with_null_empty_guard(spark, tmp_path):
    target = WarehouseTarget(spark, str(tmp_path))
    df = spark.createDataFrame(
        [("1", "2024-01-01"), ("2", ""), ("3", None)], "_id string, ts string"
    )
    target.append("tbl", df)
    # P9: empty strings excluded from max()
    assert target.max_of("tbl", "ts") == "2024-01-01"
    assert target.max_of("tbl", "missing_col") is None
