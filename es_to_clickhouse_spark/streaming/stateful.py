"""Custom stateful streaming operators (applyInPandasWithState).

The reference's only cross-batch state is the watermark row + the
storage-level upsert key (SURVEY T2/T3/T8): a document seen again in a
later batch must not produce a second live row. Structured Streaming
expresses that as keyed state: ``first_seen_stream`` keeps one boolean
per key in the state store and emits only the first occurrence — the
streaming twin of the batch-side ``upsert_view`` dedup window.

Scale notes:
- state is partitioned by key across executors (RocksDB-backed in
  production via ``spark.sql.streaming.stateStore.providerClass``), so
  the seen-set never materializes on one node;
- Arrow batches flow through the Python worker (applyInPandasWithState
  is a Pandas-batched API, not row-at-a-time);
- a GroupStateTimeout can bound state for TTL'd dedup (not enabled in
  the default: the reference's upsert window is unbounded too).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

FIRST_SEEN_OUTPUT = StructType(
    [
        StructField("key", LongType()),
        StructField("first_id", LongType()),
    ]
)
FIRST_SEEN_STATE = StructType([StructField("seen", LongType())])


def _first_seen_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Emit (key, min id in the first batch that contains the key); later
    batches emit nothing. The min() makes the result independent of row
    order inside a micro-batch."""
    if state.exists:
        for _ in pdfs:  # drain (required by the contract)
            pass
        return
    first_id = None
    for pdf in pdfs:
        if len(pdf):
            m = int(pdf["_sf_id"].min())
            first_id = m if first_id is None else min(first_id, m)
    if first_id is not None:
        state.update((1,))
        yield pd.DataFrame({"key": [key[0]], "first_id": [first_id]})


def first_seen_stream(
    df: DataFrame, key_col: str, id_col: str
) -> DataFrame:
    """Streaming first-occurrence dedup by ``key_col``: one output row per
    key over the life of the stream, carrying the smallest ``id_col`` from
    the micro-batch where the key first appeared.

    Works on a streaming DataFrame; output mode must be ``update`` or
    ``append`` on the writer.
    """
    from pyspark.sql import functions as F

    keyed = df.select(
        F.col(key_col).cast("long").alias("_sf_key"),
        F.col(id_col).cast("long").alias("_sf_id"),
    )
    return keyed.groupBy("_sf_key").applyInPandasWithState(
        _first_seen_fn,
        outputStructType=FIRST_SEEN_OUTPUT,
        stateStructType=FIRST_SEEN_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
