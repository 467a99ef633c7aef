"""SQL gateway: register_views + run_sql (es_to_clickhouse_spark/sql.py)."""

from __future__ import annotations

from es_to_clickhouse_spark.sql import register_views, run_sql

SF = "/root/testdata/sf0.001"


def test_register_views_lists_all_tables(spark):
    names = register_views(spark, SF)
    assert set(names) >= {"region", "nation", "lineitem", "orders", "documents"}
    assert spark.sql("SELECT count(*) AS n FROM region").collect()[0].n == 5


def test_run_sql_join(spark):
    df = run_sql(
        spark,
        SF,
        "SELECT n_name, count(*) AS n FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name",
    )
    rows = df.collect()
    assert sum(r.n for r in rows) == 150


def test_views_are_replaceable(spark):
    register_views(spark, SF)
    register_views(spark, SF)  # idempotent re-registration
    assert spark.sql("SELECT count(*) AS n FROM nation").collect()[0].n == 25
