"""Deterministic cardinality sketches (KMV / k-minimum-values).

Spark ships HLL++ (``approx_count_distinct``), but its estimate is
implementation-defined — it can only be tested against an error bound
(tests/test_sketches.py does).  This KMV sketch is built from the same
md5-hash primitives as the dedup/decontam operators, so DuckDB reproduces
the estimate BIT-FOR-BIT and the driver gate is hash-exact, while the
statistical contract is the textbook one (Beyer et al. 2007): keep the k
smallest 60-bit hashes of the distinct values; if fewer than k exist the
count is exact, else estimate = (k-1) * 2^60 / h_(k), with relative
error ~ 1/sqrt(k).

Scale shape: one distinct shuffle on (group, hash), then a per-group
top-k — a window over the group key whose state is k rows per group
(Spark's sort-based window never materializes more).  The global variant
is TakeOrderedAndProject: per-partition partial top-k, k rows per
partition to the driver-side merge.  At 100 TB the sketch is the point:
k longs per group cross the network instead of the distinct values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 15 hex chars = 60 bits, same key discipline as operators/decontam.py
_HASH_HEX_LEN = 15
_HASH_SPACE = float(1 << 60)


def kmv_hash(col: Column | str) -> Column:
    """60-bit md5-derived hash, identical in Spark and DuckDB
    (('0x' || substr(md5(v), 1, 15))::BIGINT).

    The value is stringified before hashing; for string/integer columns
    both engines render identically.  For float columns the engines'
    double->string formats can differ — cast floats to a decimal or
    string yourself before sketching if an oracle must reproduce it.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, _HASH_HEX_LEN), 16, 10)
        .cast("long")
    )


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    k: int = 64,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Approximate distinct count per group (or globally when
    ``group_cols`` is None, returned as a single row).

    Output: group cols + ``est_distinct`` (bigint) + ``is_exact``
    (boolean: fewer than k distinct hashes survived, so the sketch
    degenerated to an exact count).  The estimate is a pure function of
    the data — no RNG, no implementation-defined merge order — because
    min-k of a set is order-free and the final arithmetic is one double
    division of exactly-representable integers.
    """
    groups = list(group_cols or [])
    hashed = df.select(
        *groups, kmv_hash(value_col).alias("_hv")
    ).distinct()
    if groups:
        w = Window.partitionBy(*groups).orderBy(F.col("_hv").asc())
        kept = hashed.withColumn("_rn", F.row_number().over(w)).where(
            F.col("_rn") <= k
        )
        agg = kept.groupBy(*groups).agg(
            F.count("*").alias("_n"), F.max("_hv").alias("_kth")
        )
    else:
        # global: TakeOrderedAndProject — k rows per partition reach the
        # merge, never the distinct value set
        kept = hashed.orderBy(F.col("_hv").asc()).limit(k)
        agg = kept.agg(F.count("*").alias("_n"), F.max("_hv").alias("_kth"))
    scale = F.lit(float((k - 1) * (1 << 60)))  # exact in float64
    est = F.when(F.col("_n") < k, F.col("_n")).otherwise(
        F.round(scale / F.col("_kth"), 0).cast("long")
    )
    return agg.select(
        *groups,
        est.cast("long").alias("est_distinct"),
        (F.col("_n") < k).alias("is_exact"),
    )
