"""As-of (nearest-prior / nearest-following) join — a time-series operator
Spark lacks natively.

Implemented as a composition of built-in DataFrame ops (the preferred
strategy for custom operators): tag both sides, union them, and take the
last right-side row at-or-before each left row via an ``ignorenulls``
window ``last`` over the merged ordering.  One shuffle on (keys, ts) —
same cost as a sort-merge join, no UDF, whole-stage codegen applies.

Semantics: for every left row, the right row with the greatest
``ts <= left.ts`` (``backward``) or the smallest ``ts >= left.ts``
(``forward``) within the same key group; at equal timestamps the right
row matches in BOTH directions, pinned so the DuckDB oracle agrees.
``forward`` is the identical merged-ordering scan run descending — right
rows still sort ahead of left rows at equal timestamps, so the inclusive
bound costs nothing extra.  Left rows with no match get NULLs
(left-outer as-of).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    right_payload: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: attach the latest prior-or-equal right row.

    ``right`` must be unique per (on, ts) — pre-aggregate otherwise, or the
    match among same-timestamp rows is nondeterministic.  Output: all left
    columns + ``right_<c>`` for each payload column.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    l_payload = [c for c in left.columns if c not in on and c != ts_col]
    left_types = dict(left.dtypes)
    right_struct_type = (
        "struct<"
        + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in right_payload)
        + ">"
    )

    r_side = right.select(
        *on,
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.struct(*[F.col(c) for c in right_payload]).alias("_r"),
        *[F.lit(None).cast(left_types[c]).alias(c) for c in l_payload],
    )
    l_side = left.select(
        *on,
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(right_struct_type).alias("_r"),
        *[F.col(c) for c in l_payload],
    )
    ts_order = F.asc("_ts") if direction == "backward" else F.desc("_ts")
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.asc("_is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = r_side.unionByName(l_side).withColumn(
        "_matched", F.last("_r", ignorenulls=True).over(w)
    )
    out_cols = (
        [F.col(c) for c in on]
        + [F.col("_ts").alias(ts_col)]
        + [F.col(c) for c in l_payload]
        + [F.col(f"_matched.{c}").alias(f"right_{c}") for c in right_payload]
    )
    return matched.where(F.col("_is_left") == 1).select(*out_cols)
