"""Full-corpus oracle sweep at sf0.001 — the driver's correctness gate,
in CI.

The driver samples ~50 of the corpus queries per round; round 3 proved a
sampled gate can sit green while unsampled queries are broken (w9/w12/
a18/t9 failed for a full round unnoticed). This sweep runs EVERY
``queries()`` entry against its DuckDB oracle at the smallest scale
factor, parametrized per query so a breakage names itself. Comparison is
the same exact sorted-values check as tools/check_correctness.py
(stricter than the driver's hash).
"""

from __future__ import annotations

import math
import os

import pytest

from tests.conftest import SF_DIR

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _canon_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def _canon_frame(df):
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows)


def _all_queries():
    from es_to_clickhouse_spark.corpus import all_queries

    return all_queries()


def _all_oracles():
    from es_to_clickhouse_spark.corpus import all_oracles

    return all_oracles()


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for name in TABLES:
        p = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_all_queries()))
def test_corpus_query_matches_oracle(name, spark, duck):
    qs, oracles = _all_queries(), _all_oracles()
    sdf = qs[name](spark, SF_DIR).toPandas()
    if name not in oracles:
        # rows-only contract for non-SQL-expressible ops: must run and
        # produce a stable schema
        assert sdf.columns.tolist(), f"{name}: empty schema"
        return
    odf = duck.execute(oracles[name]).fetchdf()
    scols, srows = _canon_frame(sdf)
    ocols, orows = _canon_frame(odf)
    assert scols == ocols, f"{name}: columns spark={scols} oracle={ocols}"
    assert len(srows) == len(orows), (
        f"{name}: rowcount spark={len(srows)} oracle={len(orows)}"
    )
    for i, (a, b) in enumerate(zip(srows, orows)):
        assert a == b, f"{name}: first diff row {i}: spark={a} oracle={b}"
