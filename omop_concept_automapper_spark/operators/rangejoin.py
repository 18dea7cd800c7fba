"""Interval (range) join: points against half-open intervals, equi-shuffled.

Spark's optimizer turns a bare inequality join into a broadcast
nested-loop or cartesian plan — O(|P| * |I|) work that is unusable at
10^12-row scale.  This operator makes the join an EQUI-join on a derived
bucket key: each interval explodes to the fixed-width buckets it covers,
each point maps to its single bucket, and the bucket (plus any caller
equi-keys) drives one ordinary shuffled join; the precise half-open
predicate runs as a residual filter.

Because a point lives in exactly one bucket, every qualifying
(interval, point) pair meets in exactly one bucket — no post-join
dedup is needed.

Cost model: shuffle fan-out on the interval side is
ceil(interval_length / bucket_width) + 1 rows per interval; pick
``bucket_width`` near the typical interval length so fan-out stays O(1)
while each bucket pairs only nearby rows.  The bucket key is uniform when
points are (time-)uniform; a hot equi-key (one pathological user) is the
caller's salting decision, same as any keyed join here.

Same family as operators/asof.py (reference has no native range join
either; both re-express ordered-scan semantics as keyed shuffles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    bucket_width: int = 3_600_000_000,
) -> DataFrame:
    """Inner-join each point row to every interval row with
    ``start <= point < end`` (and equal ``on`` keys, if given).

    ``point_col`` / ``start_col`` / ``end_col`` must be integral columns
    in one domain (e.g. epoch micros via ``F.unix_micros``).  Output:
    the interval row's columns + the point row's columns (names must not
    collide except ``on``).  Intervals with ``end <= start`` are dropped
    (Spark's ``sequence`` would otherwise generate a DESCENDING bucket
    range and corrupt the join).
    """
    on = on or []
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")

    def fdiv(col):
        # integer FLOOR division: (x - pmod(x, w)) DIV w stays in 64-bit
        # arithmetic (F.floor(x / w) rounds through a double and loses
        # exactness past 2^53 — e.g. nanosecond-epoch domains), and pmod
        # keeps the floor semantics for negative coordinates
        return F.expr(f"(({col} - pmod({col}, {w})) DIV {w})")

    iv = intervals.where(F.col(end_col) > F.col(start_col)).withColumn(
        "_bkt",
        F.explode(
            F.sequence(fdiv(start_col), fdiv(f"({end_col} - 1)")),
        ),
    )
    pt = points.withColumn("_bkt", fdiv(point_col))
    cond = (
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) < F.col(end_col))
    )
    return iv.join(pt, on=on + ["_bkt"], how="inner").where(cond).drop("_bkt")
