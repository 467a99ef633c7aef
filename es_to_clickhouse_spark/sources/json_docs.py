"""Dynamic-schema JSON document ingestion (SURVEY §1.3, §7.4 risk 1).

The reference's sources emit schemaless JSON/BSON documents; it discovers
fields by scanning samples (es/es_to_bytehouse.py:338-395 — 5,000-doc
scroll; mongodb/mongodb_to_bytehouse.py:347-361 — $sample 1,000) and grows
the target per batch. Spark DataFrames are fixed-schema, so the engine
splits the problem:

- ``infer_json_schema``: sampled schema inference — Spark's JSON reader
  over a bounded sample (the exact analog of the reference's sampled
  scan, but distributed). Returns a ``StructType``.
- ``union_schemas``: declared ∪ sampled ∪ previous-batch union
  (es/es_to_bytehouse.py:762-771) so the accumulated schema only grows.
- ``parse_json_col``: ``from_json`` with the accumulated schema +
  PERMISSIVE corrupt-record capture. Malformed documents NEVER abort the
  batch and never silently disappear: they land in a quarantine
  DataFrame (the scale-correct replacement for the reference's
  row-by-row salvage loop, es/es_to_bytehouse.py:725-736 — SURVEY §4).

At 100 TB: inference runs on a bounded sample (driver-side cost is one
small job), parsing is JVM-side ``from_json`` inside codegen, and
quarantine is a filter — no Python, no per-row error handling.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def infer_json_schema(
    spark: SparkSession, df: DataFrame, json_col: str, sample_size: int = 1000
) -> T.StructType:
    """Infer a StructType from a bounded sample of JSON strings
    (reference sample sizes: ES 5000, Mongo 1000)."""
    sample = [
        r.j
        for r in df.select(F.col(json_col).alias("j"))
        .where(F.col("j").isNotNull())
        .limit(sample_size)  # bounded: the collect is at most sample_size strings
        .collect()
    ]
    if not sample:
        return T.StructType([])
    inferred = spark.read.json(spark.sparkContext.parallelize(sample, 4))
    fields = [f for f in inferred.schema.fields if f.name != CORRUPT_COL]
    return T.StructType(fields)


def union_schemas(*schemas: T.StructType) -> T.StructType:
    """Field-name union, first-seen type wins (es/es_to_bytehouse.py:762-771).
    Nested structs union recursively so batch-over-batch drift only adds."""
    out: dict[str, T.StructField] = {}
    for schema in schemas:
        for f in schema.fields:
            if f.name not in out:
                out[f.name] = f
            elif isinstance(f.dataType, T.StructType) and isinstance(
                out[f.name].dataType, T.StructType
            ):
                out[f.name] = T.StructField(
                    f.name, union_schemas(out[f.name].dataType, f.dataType), True
                )
    return T.StructType(list(out.values()))


@dataclass
class ParsedBatch:
    good: DataFrame       # parsed + original columns
    quarantine: DataFrame  # rows whose JSON failed to parse (raw preserved)


def parse_json_col(
    df: DataFrame, json_col: str, schema: T.StructType
) -> ParsedBatch:
    """PERMISSIVE parse with corrupt capture; the malformed rows are
    quarantined, not dropped and not row-by-row retried."""
    parse_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = df.withColumn(
        "_doc",
        F.from_json(
            F.col(json_col),
            parse_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ),
    )
    bad = F.col(f"_doc.{CORRUPT_COL}").isNotNull() | (
        F.col(json_col).isNotNull() & F.col("_doc").isNull()
    )
    good = (
        parsed.where(~bad | F.col(json_col).isNull())
        .select("*", "_doc.*")
        .drop("_doc", CORRUPT_COL)
    )
    quarantine = parsed.where(bad).drop("_doc")
    return ParsedBatch(good=good, quarantine=quarantine)


def sync_json_batches(
    spark: SparkSession,
    batches: list[DataFrame],
    json_col: str,
    sample_size: int = 1000,
) -> tuple[DataFrame, DataFrame, T.StructType]:
    """Batch-over-batch evolving ingestion: per batch, infer ∪ accumulate
    → parse → union-by-name (missing columns NULL-filled — the engine's
    ALTER TABLE ADD COLUMN analog). Returns (good, quarantine, schema)."""
    from functools import reduce

    acc_schema = T.StructType([])
    goods, bads = [], []
    for b in batches:
        acc_schema = union_schemas(
            acc_schema, infer_json_schema(spark, b, json_col, sample_size)
        )
        parsed = parse_json_col(b, json_col, acc_schema)
        goods.append(parsed.good)
        bads.append(parsed.quarantine)
    good = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), goods)
    bad = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), bads)
    return good, bad, acc_schema
