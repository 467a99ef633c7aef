"""Dynamic-schema JSON ingestion: sampled inference, batch-over-batch
evolution, malformed-row quarantine (sources/json_docs.py)."""

from __future__ import annotations

from pyspark.sql import types as T

from es_to_clickhouse_spark.flatten import flatten_es
from es_to_clickhouse_spark.sources.json_docs import (
    infer_json_schema,
    parse_json_col,
    sync_json_batches,
    union_schemas,
)


def test_infer_schema_from_sample(spark):
    df = spark.createDataFrame(
        [
            (1, '{"a": 1, "user": {"name": "x"}}'),
            (2, '{"a": 2, "tags": ["p", "q"]}'),
            (3, None),
        ],
        "id long, doc string",
    )
    schema = infer_json_schema(spark, df, "doc")
    names = {f.name for f in schema.fields}
    assert names == {"a", "user", "tags"}
    assert isinstance(schema["user"].dataType, T.StructType)
    assert isinstance(schema["tags"].dataType, T.ArrayType)


def test_union_schemas_recursive_first_wins(spark):
    s1 = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField(
                "u", T.StructType([T.StructField("x", T.StringType())])
            ),
        ]
    )
    s2 = T.StructType(
        [
            T.StructField("a", T.StringType()),  # conflict: first wins
            T.StructField(
                "u", T.StructType([T.StructField("y", T.LongType())])
            ),
            T.StructField("b", T.DoubleType()),
        ]
    )
    u = union_schemas(s1, s2)
    assert u["a"].dataType == T.LongType()
    assert {f.name for f in u["u"].dataType.fields} == {"x", "y"}
    assert "b" in u.fieldNames()


def test_parse_quarantines_malformed(spark):
    df = spark.createDataFrame(
        [
            (1, '{"a": 1}'),
            (2, "{not json at all"),
            (3, None),
        ],
        "id long, doc string",
    )
    schema = T.StructType([T.StructField("a", T.LongType())])
    out = parse_json_col(df, "doc", schema)
    good = {r.id: r.a for r in out.good.collect()}
    assert good == {1: 1, 3: None}  # NULL doc passes through with NULL fields
    bad = out.quarantine.collect()
    assert len(bad) == 1 and bad[0].id == 2
    assert bad[0].doc == "{not json at all"  # raw preserved for replay


def test_batch_over_batch_evolution_and_flatten(spark):
    """Batch 2 introduces a new nested field; accumulated schema grows,
    batch-1 rows NULL-fill, and the ES flatten applies on top (the full
    reference pipeline: sample → parse → evolve → flatten)."""
    b1 = spark.createDataFrame(
        [(1, '{"a": 1, "user": {"name": "x"}}')], "id long, doc string"
    )
    b2 = spark.createDataFrame(
        [(2, '{"a": 2, "user": {"name": "y", "geo-city": "c"}, "new_field": true}')],
        "id long, doc string",
    )
    good, bad, schema = sync_json_batches(spark, [b1, b2], "doc")
    assert bad.count() == 0
    assert {f.name for f in schema.fields} == {"a", "user", "new_field"}
    flat = flatten_es(good.drop("doc"))
    rows = {r.id: r for r in flat.collect()}
    assert rows["1"].user_name == "x" and rows["1"].new_field is None
    assert rows["2"].user_geo_city == "c" and rows["2"].new_field == "True"
