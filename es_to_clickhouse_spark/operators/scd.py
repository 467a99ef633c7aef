"""SCD2 (slowly-changing-dimension, type 2) history building.

The reference ships raw append streams into a warehouse and leaves
"what was this entity's state at time T" to consumers; the standard
warehouse answer is an SCD2 dimension — one row per (entity, state
version) with a validity interval. Building it from an event/CDC
stream is two windows over one shuffle:

1. CHANGE DETECTION: a row opens a new version iff any tracked
   attribute differs from the previous row of the same entity
   (null-safe compare — ``IS DISTINCT FROM`` — so NULL→value and
   value→NULL transitions count as changes; an entity whose very first
   attribute values are all NULL is treated as having no state yet and
   opens on its first non-null change);
2. INTERVALS: ``valid_from`` is the change row's time, ``valid_to`` the
   next change's time (exclusive), NULL for the current version.

Both windows share the same (entity) partitioning — Catalyst plans ONE
Exchange; at 100 TB this is a single entity-keyed shuffle followed by
per-entity linear scans, with no self-join and no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_intervals(
    df: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    time_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse an ordered event stream into SCD2 validity intervals.

    Returns one row per state version: ``key_cols + attr_cols +
    valid_from + valid_to + is_current``. ``time_col`` plus
    ``tiebreak_cols`` must totally order each entity's rows (same
    contract as every windowed operator here — ambiguous order makes
    "previous state" ambiguous).
    """
    order = [F.col(time_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    versions = df.withColumn("_chg", changed).where(F.col("_chg")).drop("_chg")
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    valid_to = F.lead(time_col).over(w2)
    return versions.select(
        *key_cols,
        *attr_cols,
        F.col(time_col).alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )
