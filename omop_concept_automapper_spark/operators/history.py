"""Temporal-table (SCD2) semantics: change events -> validity intervals
-> as-of snapshots.

The KG's edge stream is append-only change events (last-write-wins merge
gives only the CURRENT state — catalog.merge_upsert).  These operators
derive the full history view a temporal query needs:

* ``scd2_intervals``  — per key, each change row becomes a half-open
  validity interval ``[valid_from, valid_to)``; the latest row stays
  open (``valid_to`` NULL).
* ``asof_snapshot``   — the table as of an instant: the one interval per
  key containing it.

Both are pure window/filter compositions: ONE shuffle keyed by the
entity key (bounded per-key state — ``lead`` over the key's own history),
then map-only filters.  At 10^12 rows the key is the uniform entity id;
a snapshot probe prunes with an ordinary ``valid_from <= t`` predicate
that reaches the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_intervals(
    events: DataFrame,
    keys: list[str],
    ts_col: str,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Validity intervals from a change-event stream.

    Every input row becomes one output row with ``valid_from`` (its own
    timestamp) and ``valid_to`` (the NEXT change's timestamp for the same
    key, NULL for the current version) plus ``is_current``.  Ordering
    within a key is (ts, *tie_cols) — pass a unique tie column (an event
    id) when timestamps can collide, otherwise same-instant rows would
    order nondeterministically.  Input columns all pass through.
    """
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tie_cols or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        events.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def asof_snapshot(history: DataFrame, at: Column) -> DataFrame:
    """The table state at instant ``at``: rows whose
    ``[valid_from, valid_to)`` interval contains it (open intervals
    match any later instant).  ``at`` may be a literal or any column
    expression comparable with the interval bounds."""
    return history.where(
        (F.col("valid_from") <= at)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > at))
    )
