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


# ------------------------------------------------- streaming funnel

FUNNEL_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("funnel_level", LongType()),
    ]
)
#: (latest view us, best view-start among seen clicks' chains, level)
FUNNEL_STATE = StructType(
    [
        StructField("lv", LongType()),
        StructField("lvc", LongType()),
        StructField("level", LongType()),
    ]
)


def _funnel_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    window_us: int = 21_600_000_000,
) -> Iterator[pd.DataFrame]:
    """Per-user windowFunnel state fold (the streaming twin of corpus
    b6_window_funnel's cascaded running-max decomposition): ``lv`` is
    the latest view timestamp, ``lvc`` the best chain start among
    clicks seen so far, ``level`` the max depth reached. Each is a
    running max, so the fold is exactly the batch windows replayed
    incrementally — same tie order ((us, event_id)), same strictly-
    before semantics, identical result when events arrive time-ordered
    (the watermark contract; late events would need the batch path)."""
    lv, lvc, level = state.get if state.exists else (None, None, 0)
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        ev = pd.concat(chunks).sort_values(["_sf_us", "_sf_id"])
        for et, us in zip(ev["_sf_type"], ev["_sf_us"]):
            us = int(us)
            if et == "view":
                lv = us if lv is None else max(lv, us)
                level = max(level, 1)
            elif et == "click" and lv is not None:
                if lv >= us - window_us:
                    level = max(level, 2)
                lvc = lv if lvc is None else max(lvc, lv)
            elif et == "purchase" and lvc is not None and lvc >= us - window_us:
                level = max(level, 3)
    state.update((lv, lvc, level))
    yield pd.DataFrame({"user_id": [key[0]], "funnel_level": [level]})


def funnel_stream(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    us_col: str = "us",
    id_col: str = "event_id",
    window_us: int = 21_600_000_000,
) -> DataFrame:
    """Streaming ``windowFunnel``: per-user max funnel depth
    (view < click < purchase inside ``window_us`` of the chain's view),
    maintained incrementally across micro-batches with three longs of
    state per user — never the event history. Output mode ``update``:
    each batch re-emits the (monotone) level for the users it touched.

    State is keyed/partitioned by user across executors exactly like
    first_seen_stream; the per-user fold is O(batch rows), Arrow-
    batched. Assumes per-user time-ordered arrival (enforce with a
    watermark + sorted sources; the reference's scroll/keyset protocols
    deliver exactly that order)."""
    import functools

    from pyspark.sql import functions as F

    keyed = df.select(
        F.col(user_col).cast("long").alias("_sf_key"),
        F.col(type_col).cast("string").alias("_sf_type"),
        F.col(us_col).cast("long").alias("_sf_us"),
        F.col(id_col).cast("long").alias("_sf_id"),
    )
    return keyed.groupBy("_sf_key").applyInPandasWithState(
        functools.partial(_funnel_fn, window_us=window_us),
        outputStructType=FUNNEL_OUTPUT,
        stateStructType=FUNNEL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
