"""Time-series resample + gap fill (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from es_to_clickhouse_spark.operators.timeseries import gap_fill, resample


def _events(spark):
    rows = [
        ("a", dt.datetime(2024, 1, 1, 0, 10), 1.0),
        ("a", dt.datetime(2024, 1, 1, 0, 50), 3.0),
        # hour 1 missing for a
        ("a", dt.datetime(2024, 1, 1, 2, 5), 10.0),
        ("b", dt.datetime(2024, 1, 1, 5, 0), 7.0),
    ]
    return spark.createDataFrame(rows, "key string, ts timestamp, v double")


def test_resample_buckets_and_aggregates(spark):
    b = resample(
        _events(spark), "ts", ["key"], [F.sum("v").alias("s")], bucket="hour"
    )
    got = {(r.key, r.bucket_ts.hour): r.s for r in b.collect()}
    assert got == {("a", 0): 4.0, ("a", 2): 10.0, ("b", 5): 7.0}


def test_gap_fill_materializes_gaps_zero_and_ffill(spark):
    b = resample(
        _events(spark),
        "ts",
        ["key"],
        [F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")],
        bucket="hour",
    )
    g = gap_fill(b, "bucket_ts", ["key"], "1 hour", fill_zero=["n"], fill_forward=["s"])
    rows = {(r.key, r.bucket_ts.hour): (r.n, r.s) for r in g.collect()}
    # key a spans hours 0..2 inclusive; hour 1 is a materialized gap
    assert rows[("a", 1)] == (0, 4.0)  # zero count, carried-forward sum
    assert rows[("a", 2)] == (1, 10.0)
    # key b has a single bucket -> no gaps invented
    assert ("b", 4) not in rows and rows[("b", 5)] == (1, 7.0)
    assert len(rows) == 4


def test_gap_fill_leading_gap_stays_null(spark):
    # forward fill has nothing to carry before the first observation;
    # a gap can only appear after a key's min bucket, so construct one
    # via two observed buckets with a hole, and check the hole's fill
    # comes from the EARLIER bucket only
    b = resample(
        _events(spark), "ts", ["key"], [F.max("v").alias("m")], bucket="hour"
    )
    g = gap_fill(b, "bucket_ts", ["key"], "1 hour", fill_forward=["m"])
    rows = {(r.key, r.bucket_ts.hour): r.m for r in g.collect()}
    assert rows[("a", 1)] == 3.0  # from hour 0's max, not hour 2's
