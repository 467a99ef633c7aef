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


def _funnel_state_schema(n_stages: int) -> StructType:
    """(s_1 .. s_{n-1}, level): s_i = best chain start among depth-i
    prefixes seen so far — the streaming mirror of operators/funnel.py's
    cascaded running maxes."""
    fields = [StructField(f"s{i}", LongType()) for i in range(1, n_stages)]
    return StructType(fields + [StructField("level", LongType())])


def _funnel_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    window_us: int = 21_600_000_000,
) -> Iterator[pd.DataFrame]:
    """Per-user windowFunnel state fold (the streaming twin of
    operators/funnel.py window_funnel's cascaded running-max
    decomposition): ``s[i]`` is the best (latest) chain start among
    depth-(i+1) prefixes seen so far; a stage-k event at time ``us``
    reaches depth k iff ``s[k-2] >= us - window``. Every state entry is
    a running max, so the fold is exactly the batch windows replayed
    incrementally — same tie order ((us, event_id)), same strictly-
    before semantics, identical result when events arrive time-ordered
    (the watermark contract; late events would need the batch path)."""
    n = len(stages)
    if state.exists:
        got = state.get
        s, level = list(got[: n - 1]), got[n - 1]
    else:
        s, level = [None] * (n - 1), 0
    idx = {et: i for i, et in enumerate(stages)}
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        ev = pd.concat(chunks).sort_values(["_sf_us", "_sf_id"])
        for et, us in zip(ev["_sf_type"], ev["_sf_us"]):
            i = idx.get(et)
            if i is None:
                continue
            us = int(us)
            if i == 0:
                s[0] = us if s[0] is None else max(s[0], us)
                level = max(level, 1)
                continue
            prev = s[i - 1]
            if prev is None:
                continue
            if prev >= us - window_us:
                level = max(level, i + 1)
            if i < n - 1:
                # chain start propagates UNCONDITIONALLY (the window
                # check applies only at the final event), exactly like
                # the batch s_i windows
                s[i] = prev if s[i] is None else max(s[i], prev)
    state.update(tuple(s) + (level,))
    yield pd.DataFrame({"user_id": [key[0]], "funnel_level": [level]})


def funnel_stream(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    us_col: str = "us",
    id_col: str = "event_id",
    window_us: int = 21_600_000_000,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Streaming ``windowFunnel`` over an ARBITRARY ordered stage list:
    per-user max funnel depth (stages in order inside ``window_us`` of
    the chain's first event), maintained incrementally across
    micro-batches with len(stages) longs of state per user — never the
    event history. Output mode ``update``: each batch re-emits the
    (monotone) level for the users it touched.

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
        functools.partial(_funnel_fn, stages=tuple(stages), window_us=window_us),
        outputStructType=FUNNEL_OUTPUT,
        stateStructType=_funnel_state_schema(len(stages)),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
