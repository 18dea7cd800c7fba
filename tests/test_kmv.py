"""KMV cardinality sketch: exact branch below k, estimate accuracy within
the 1/sqrt(k) statistical bound above k, and layout invariance (the
estimate is a pure function of the data)."""

from __future__ import annotations

from pyspark.sql import functions as F

from omop_concept_automapper_spark.operators.sketches import kmv_distinct


def test_exact_below_k(spark):
    df = spark.range(0, 1000).select((F.col("id") % 37).alias("v"))
    row = kmv_distinct(df, "v", k=64).collect()[0]
    assert row["is_exact"] is True
    assert row["est_distinct"] == 37


def test_estimate_within_bound_and_layout_invariant(spark):
    # 20k distinct values, k=64 -> relative error ~ 1/8; assert 3 sigma
    df = spark.range(0, 60000).select((F.col("id") % 20000).alias("v"))
    got = []
    for d in (df, df.repartition(17)):
        row = kmv_distinct(d, "v", k=64).collect()[0]
        assert row["is_exact"] is False
        assert abs(row["est_distinct"] - 20000) / 20000 < 3 / 8
        got.append(row["est_distinct"])
    assert got[0] == got[1]  # deterministic across layouts


def test_groupwise_mixed_exact_and_estimated(spark):
    df = spark.range(0, 30000).select(
        F.when(F.col("id") % 2 == 0, F.lit("small")).otherwise(F.lit("big")).alias("g"),
        F.when(F.col("id") % 2 == 0, F.col("id") % 10)
        .otherwise(F.col("id"))
        .alias("v"),
    )
    rows = {r["g"]: r for r in kmv_distinct(df, "v", k=64, group_cols=["g"]).collect()}
    # even ids mod 10 -> the 5 even digits
    assert rows["small"]["is_exact"] is True
    assert rows["small"]["est_distinct"] == 5
    assert rows["big"]["is_exact"] is False
    assert abs(rows["big"]["est_distinct"] - 15000) / 15000 < 3 / 8
