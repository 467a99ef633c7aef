"""As-of join — a custom operator Spark lacks natively (SURVEY §2.3 note).

``asof_join(left, right, on, by)``: for each left row, attach the most
recent right row with ``right.on <= left.on`` (within the same ``by`` key).

Implementation is the union-and-window technique (no Python in the data
path, one shuffle on the by-key):

1. tag both sides and union them on (by, on);
2. window ``last(right_cols, ignorenulls=True)`` ordered by (on, side)
   carries the latest right values forward onto each left row;
3. filter back to left rows.

Cost: one shuffle + one window sort per call — the same price as the
sort-merge join Spark would plan for an equi-join, and strictly better
than the naive range-join (which explodes to O(n·m) pairs before
aggregation). Skewed by-keys are handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join.

    Parameters
    ----------
    on: ordering column (time), present in both sides.
    by: optional equality key.
    right_cols: right columns to carry (default: all but on/by).
    strict: if True, match ``right.on < left.on`` (exclusive).
    """
    rcols = right_cols or [c for c in right.columns if c not in {on, by}]
    # side ordering: right rows sort BEFORE left rows at the same `on`
    # for inclusive (<=) semantics, AFTER for strict (<).
    right_tag, left_tag = (0, 1) if not strict else (1, 0)

    lefts = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(left_tag).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in rcols],
    )
    rights = right.select(
        *[
            (F.col(c) if c in {on, by} else F.lit(None).cast(left.schema[c].dataType))
            .alias(c)
            for c in left.columns
        ],
        F.lit(right_tag).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
    )
    unioned = lefts.unionByName(rights)

    w = Window.orderBy(F.col(on).asc(), F.col("_side").asc())
    if by is not None:
        w = Window.partitionBy(by).orderBy(F.col(on).asc(), F.col("_side").asc())
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in rcols
        ],
    )
    return carried.where(F.col("_side") == F.lit(left_tag)).drop(
        "_side", *[f"_r_{c}" for c in rcols]
    )
