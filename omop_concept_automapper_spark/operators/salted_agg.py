"""Skew-aware two-phase (salted) aggregation.

The transcripts workload has hot mention keys (a few surface forms appear in
a large fraction of turns — FIXTURES.md §1), so a naive
``groupBy(mention_text)`` funnels those keys into single reducer tasks.
This helper implements the classic salt -> partial agg -> unsalt -> final
agg pattern the north_rule mandates ("salted, skew-aware groupBy of
high-frequency concepts").  The partial aggregate is computed per
(key, salt) bucket — map-side combining still applies — then merged.

Salt derivation is deterministic: ``xxhash64`` over caller-provided salt
source columns (e.g. (conv_id, turn_idx)), never ``rand()``, so reruns and
resumed jobs produce identical plans and results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGEABLE = {
    "count": (F.count, F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
    "collect_set": (F.collect_set, None),  # merged via flatten+distinct
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    salt_cols: list[str | Column] | None = None,
    buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation over ``keys``.

    ``aggs`` is a list of (input_col, fn, output_alias) with fn in
    {count, sum, min, max, collect_set}.
    """
    if salt_cols:
        salt = F.pmod(F.xxhash64(*[F.col(c) if isinstance(c, str) else c
                                   for c in salt_cols]), F.lit(buckets))
    else:
        salt = F.pmod(F.spark_partition_id().cast("long"), F.lit(buckets))
    salted = df.withColumn("_salt", salt)

    partial_exprs = []
    for col, fn, alias in aggs:
        if fn not in _MERGEABLE:
            raise ValueError(f"unsupported agg fn: {fn}")
        partial_fn, _ = _MERGEABLE[fn]
        partial_exprs.append(partial_fn(F.col(col)).alias(f"_p_{alias}"))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_exprs)

    final_exprs = []
    for col, fn, alias in aggs:
        _, merge_fn = _MERGEABLE[fn]
        if fn == "collect_set":
            final_exprs.append(
                F.array_distinct(F.flatten(F.collect_list(f"_p_{alias}"))).alias(alias)
            )
        else:
            final_exprs.append(merge_fn(F.col(f"_p_{alias}")).alias(alias))
    return partial.groupBy(*keys).agg(*final_exprs)
