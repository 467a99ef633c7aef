"""Plan-level tests: bucketed co-located joins are shuffle-free; salted
joins match the plain join exactly (operators/partitioning.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from es_to_clickhouse_spark.operators.partitioning import (
    colocated_join,
    repartition_by_range,
    salted_join,
    write_bucketed,
)


@pytest.fixture()
def bucketed_pair(spark):
    orders = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("amount")
    )
    items = spark.range(3000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("item_id")
    )
    write_bucketed(orders, "b_orders", "k", n_buckets=8)
    write_bucketed(items, "b_items", "k", n_buckets=8)
    yield "b_orders", "b_items"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    lt, rt = bucketed_pair
    # force SMJ path: a broadcast join would hide the bucketing benefit
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, lt, rt, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # bucket-to-bucket, zero shuffles
        assert joined.count() == 3000
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024)
        )


def test_unbucketed_join_does_shuffle(spark):
    """Control: the same join without bucketing plans an Exchange."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(1000).select(F.col("id").alias("k"))
        b = spark.range(1000).select(F.col("id").alias("k"))
        plan = a.join(b, "k")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024)
        )


def test_salted_join_matches_plain_join(spark):
    # skewed fact: 90% of rows share key 0
    big = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("row_id"),
    )
    small = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dim_val")
    )
    plain = big.join(small, "k").select("row_id", "dim_val")
    salted = salted_join(big, small, "k", big_unique_col="row_id", n_salt=8).select(
        "row_id", "dim_val"
    )
    assert plain.subtract(salted).count() == 0
    assert salted.subtract(plain).count() == 0
    assert salted.count() == plain.count()


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, 10), (99, 11)], "k long, row_id long")
    small = spark.createDataFrame([(1, 5)], "k long, dim_val long")
    out = salted_join(big, small, "k", "row_id", n_salt=4, how="left")
    got = {r.row_id: r.dim_val for r in out.collect()}
    assert got == {10: 5, 11: None}


def test_repartition_by_range_clusters_time(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id"),
        F.timestamp_micros((F.col("id") * 1_000_000).cast("long")).alias("ts"),
    )
    out = repartition_by_range(df, "ts", n_partitions=4)
    assert out.rdd.getNumPartitions() == 4
    # each partition holds a contiguous time range (min/max don't overlap)
    ranges = (
        out.select(F.spark_partition_id().alias("p"), "ts")
        .groupBy("p")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    for prev, nxt in zip(ranges, ranges[1:]):
        assert prev.hi <= nxt.lo


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-style partitionBy + filter → PartitionFilters prune whole
    directories at plan time (the layout the sink uses for time-series
    targets; at 100 TB a day-filter reads one partition, not the table)."""
    df = spark.range(300).select(
        F.col("id"),
        F.concat(F.lit("2024-01-0"), ((F.col("id") % 3) + 1).cast("string")).alias(
            "dt"
        ),
    )
    path = str(tmp_path / "parted")
    df.write.partitionBy("dt").parquet(path)
    read = spark.read.parquet(path).where(F.col("dt") == "2024-01-02")
    plan = read._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "dt" in plan.split("PartitionFilters")[1][:120]
    assert read.count() == 100


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew handling: a 90%-one-key join completes with AQE on and
    produces exact results (the skew-join optimization is plan-internal;
    correctness + termination is the contract we pin here)."""
    from pyspark.sql import functions as F

    big = spark.range(200_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(100).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
    joined = big.join(dim, "k")
    n = joined.count()
    # k=7 matches 180k rows; other dim keys (0,10,...,90 pattern) match 1 each
    expected = 180_000 + big.where((F.col("k") != 7) & (F.col("k") < 100)).count()
    assert n == expected
