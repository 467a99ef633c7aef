"""JDBC source/sink (ClickHouse and friends) with partitioned range scans.

The reference pages ClickHouse with ``LIMIT B OFFSET o``
(clickhouse/clickhouse_to_bytehouse.py:303-306) — the server re-scans the
prefix every page, O(n²/B) total work, single-threaded. The Spark read
plans N parallel range predicates over a numeric column instead: each
executor issues ``WHERE col >= lo AND col < hi``, so a 100 TB table scans
in one pass across the cluster.

No JDBC driver jar ships in this container; ``read_table`` raises with
the needed ``--jars`` coordinates. The option-building is pure and tested.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcSource:
    url: str  # e.g. jdbc:clickhouse://host:8123/db
    user: str = "default"
    password: str = ""
    driver: str = "com.clickhouse.jdbc.ClickHouseDriver"
    fetch_size: int = 10_000  # reference's recommended batch (clickhouse/README.md:40)

    def base_options(self) -> dict[str, str]:
        return {
            "url": self.url,
            "user": self.user,
            "password": self.password,
            "driver": self.driver,
            "fetchsize": str(self.fetch_size),
        }

    def partition_options(
        self,
        partition_column: str,
        lower_bound: int,
        upper_bound: int,
        num_partitions: int = 32,
    ) -> dict[str, str]:
        """Parallel range-scan options — the scale replacement for
        LIMIT/OFFSET paging."""
        return {
            "partitionColumn": partition_column,
            "lowerBound": str(lower_bound),
            "upperBound": str(upper_bound),
            "numPartitions": str(num_partitions),
        }

    def pushdown_query(self, table: str, where: str | None = None) -> str:
        """Source-side predicate pushdown (the WHERE the reference compiles
        at clickhouse/clickhouse_to_bytehouse.py:455-468) as a dbtable
        subquery; Catalyst also pushes post-hoc filters."""
        if where:
            return f"(SELECT * FROM {table} WHERE {where}) AS src"
        return table

    def read_options(
        self,
        table: str,
        where: str | None = None,
        partition_column: str | None = None,
        bounds: tuple[int, int] | None = None,
        num_partitions: int = 32,
    ) -> dict[str, str]:
        """The COMPLETE option dict read_table hands to the JDBC reader
        — pure, so the skipped live round-trip's assembly stays
        unit-asserted even while the wire test is environment-gated."""
        opts = self.base_options()
        opts["dbtable"] = self.pushdown_query(table, where)
        if partition_column and bounds:
            opts.update(
                self.partition_options(
                    partition_column, bounds[0], bounds[1], num_partitions
                )
            )
        return opts

    def write_options(self, table: str, batch_size: int = 10_000) -> dict[str, str]:
        """The complete option dict write_table hands to the writer."""
        return {
            **self.base_options(),
            "dbtable": table,
            "batchsize": str(batch_size),
            "isolationLevel": "NONE",
        }

    def read_table(
        self,
        spark: SparkSession,
        table: str,
        where: str | None = None,
        partition_column: str | None = None,
        bounds: tuple[int, int] | None = None,
        num_partitions: int = 32,
    ) -> DataFrame:
        opts = self.read_options(
            table, where, partition_column, bounds, num_partitions
        )
        try:
            return spark.read.format("jdbc").options(**opts).load()
        except Exception as e:  # noqa: BLE001
            raise RuntimeError(
                "JDBC read failed — a driver jar is required, e.g. "
                "spark-submit --jars clickhouse-jdbc-0.6.x-all.jar "
                f"(driver={self.driver}). Underlying: {e}"
            ) from e

    def write_table(
        self, df: DataFrame, table: str, mode: str = "append", batch_size: int = 10_000
    ) -> None:
        """Batched INSERT sink (es/es_to_bytehouse.py:675-694 analog):
        JDBC batchsize replaces the hand-built VALUES batching."""
        try:
            (
                df.write.format("jdbc")
                .options(**self.write_options(table, batch_size))
                .mode(mode)
                .save()
            )
        except Exception as e:  # noqa: BLE001
            raise RuntimeError(
                "JDBC write failed — a driver jar is required "
                f"(driver={self.driver}). Underlying: {e}"
            ) from e
