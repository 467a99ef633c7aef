"""Range (point-in-interval) join: bucketized equi-join vs brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from es_to_clickhouse_spark.operators.range_join import range_join


def _brute(points, intervals):
    cond = (F.col("t") >= F.col("s")) & (F.col("t") <= F.col("e"))
    return {
        (r.t, r.s, r.e)
        for r in points.crossJoin(intervals).where(cond).collect()
    }


def test_range_join_matches_bruteforce(spark):
    points = spark.range(100).select(F.col("id").alias("t"))
    intervals = spark.range(30).select(
        (F.col("id") * 3).alias("s"), (F.col("id") * 3 + F.col("id") % 9).alias("e")
    )
    got = {
        (r.t, r.s, r.e)
        for r in range_join(points, intervals, "t", "s", "e", width=5.0).collect()
    }
    assert got == _brute(points, intervals)


def test_range_join_inclusive_bounds(spark):
    points = spark.createDataFrame([(10,), (20,), (15,)], "t long")
    intervals = spark.createDataFrame([(10, 20)], "s long, e long")
    got = sorted(
        r.t for r in range_join(points, intervals, "t", "s", "e", width=4.0).collect()
    )
    assert got == [10, 15, 20]


def test_range_join_long_interval_broadcast_path(spark):
    points = spark.range(50).select(F.col("id").alias("t"))
    # one huge interval (span 40 buckets at width=1) + short ones
    intervals = spark.createDataFrame([(0, 40), (5, 6)], "s long, e long")
    got = {
        (r.t, r.s, r.e)
        for r in range_join(
            points, intervals, "t", "s", "e", width=1.0, long_threshold=4
        ).collect()
    }
    assert got == _brute(points, intervals)


def test_range_join_error_strategy_raises_on_long_interval(spark):
    points = spark.createDataFrame([(1,)], "t long")
    intervals = spark.createDataFrame([(0, 100)], "s long, e long")
    with pytest.raises(Exception):
        range_join(
            points, intervals, "t", "s", "e",
            width=1.0, long_threshold=4, long_strategy="error",
        ).collect()


def test_interval_coverage_matches_range_join_counts(spark):
    from pyspark.sql import functions as F2

    from es_to_clickhouse_spark.operators.range_join import interval_coverage

    # timestamps at day granularity
    points = spark.createDataFrame(
        [("2024-01-%02d 00:00:00" % d,) for d in range(1, 21)], "d string"
    ).selectExpr("cast(d as timestamp) d")
    intervals = spark.createDataFrame(
        [
            ("2024-01-02 00:00:00", "2024-01-05 00:00:00"),
            ("2024-01-04 00:00:00", "2024-01-10 00:00:00"),
            ("2024-01-04 00:00:00", "2024-01-04 00:00:00"),
            ("2024-01-15 00:00:00", "2024-01-16 00:00:00"),
        ],
        "s string, e string",
    ).selectExpr("cast(s as timestamp) s", "cast(e as timestamp) e")
    got = {
        (str(r.d), r.n_covering)
        for r in interval_coverage(points, intervals, "d", "s", "e").collect()
    }
    brute = {
        (str(r.d), r.n)
        for r in points.crossJoin(intervals)
        .where((F2.col("d") >= F2.col("s")) & (F2.col("d") <= F2.col("e")))
        .groupBy("d")
        .agg(F2.count(F2.lit(1)).alias("n"))
        .collect()
    }
    assert got == brute
