"""Approximate aggregation sketches — the 100 TB cardinality/quantile path.

No cross-engine oracle (sketch implementations differ by design); instead
the error bound vs the exact answer is asserted, which is the actual
contract these operators carry at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_hll_distinct_within_bound(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    rel_err = abs(row["approx"] - row["exact"]) / row["exact"]
    assert rel_err < 0.05, (row["exact"], row["approx"])


def test_approx_percentile_within_bound(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    row = o.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("exact_p50"),
        F.expr("approx_percentile(o_totalprice, 0.5, 1000)").alias("approx_p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("exact_p90"),
        F.expr("approx_percentile(o_totalprice, 0.9, 1000)").alias("approx_p90"),
    ).collect()[0]
    for q in ("p50", "p90"):
        exact, approx = row[f"exact_{q}"], row[f"approx_{q}"]
        assert abs(approx - exact) / exact < 0.02, (q, exact, approx)


def test_hll_groupwise(spark):
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    rows = (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id").alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) / max(r["exact"], 1) < 0.1
