"""Interval join (operators/rangejoin.py): brute-force equality across
bucket widths, half-open boundary semantics, invalid-interval handling,
equi-key scoping, and the plan-shape guarantee (an equi-shuffle, never a
nested-loop/cartesian plan)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from omop_concept_automapper_spark.operators.rangejoin import interval_join


def _frames(spark, seed=7, n_pts=120, n_iv=40):
    rng = random.Random(seed)
    pts = [(i, rng.randrange(3), rng.randrange(0, 1000)) for i in range(n_pts)]
    ivs = []
    for i in range(n_iv):
        s = rng.randrange(0, 950)
        ivs.append((i, rng.randrange(3), s, s + rng.randrange(1, 120)))
    p = spark.createDataFrame(pts, "point_id long, k int, p long")
    iv = spark.createDataFrame(ivs, "iv_id long, k int, s long, en long")
    return pts, ivs, p, iv


def _ref(pts, ivs, keyed):
    out = set()
    for pid, pk, pv in pts:
        for iid, ik, s, e in ivs:
            if (not keyed or pk == ik) and s <= pv < e:
                out.add((iid, pid))
    return out


@pytest.mark.parametrize("width", [7, 64, 1000])
def test_matches_bruteforce(spark, width):
    pts, ivs, p, iv = _frames(spark)
    got = {
        (r["iv_id"], r["point_id"])
        for r in interval_join(
            p, iv, "p", "s", "en", on=["k"], bucket_width=width
        ).collect()
    }
    assert got == _ref(pts, ivs, keyed=True)


def test_unkeyed_join(spark):
    pts, ivs, p, iv = _frames(spark, n_pts=40, n_iv=15)
    got = {
        (r["iv_id"], r["point_id"])
        for r in interval_join(
            p.drop("k"), iv.drop("k"), "p", "s", "en", bucket_width=50
        ).collect()
    }
    assert got == _ref(pts, ivs, keyed=False)


def test_half_open_boundaries(spark):
    p = spark.createDataFrame(
        [(1, 10), (2, 19), (3, 20), (4, 9)], "point_id long, p long"
    )
    iv = spark.createDataFrame([(1, 10, 20)], "iv_id long, s long, en long")
    got = sorted(
        r["point_id"]
        for r in interval_join(p, iv, "p", "s", "en", bucket_width=8).collect()
    )
    assert got == [1, 2]  # start inclusive, end exclusive


def test_empty_and_inverted_intervals_dropped(spark):
    p = spark.createDataFrame([(1, 5)], "point_id long, p long")
    iv = spark.createDataFrame(
        [(1, 5, 5), (2, 9, 3), (3, 0, 10)], "iv_id long, s long, en long"
    )
    got = [
        (r["iv_id"], r["point_id"])
        for r in interval_join(p, iv, "p", "s", "en", bucket_width=4).collect()
    ]
    assert got == [(3, 1)]


def test_no_duplicate_pairs(spark):
    # an interval spanning many buckets still yields each pair once
    p = spark.createDataFrame([(1, 500)], "point_id long, p long")
    iv = spark.createDataFrame([(1, 0, 1000)], "iv_id long, s long, en long")
    out = interval_join(p, iv, "p", "s", "en", bucket_width=10).collect()
    assert len(out) == 1


def test_plan_is_equi_join(spark):
    _, _, p, iv = _frames(spark)
    plan = (
        interval_join(p, iv, "p", "s", "en", on=["k"], bucket_width=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_validation(spark):
    _, _, p, iv = _frames(spark)
    with pytest.raises(ValueError):
        interval_join(p, iv, "p", "s", "en", bucket_width=0)


def test_negative_and_large_domains_stay_exact(spark):
    # negative coordinates use floor (not truncate-toward-zero) buckets,
    # and values past 2^53 stay exact (integer bucket arithmetic)
    big = 1 << 60
    p = spark.createDataFrame(
        [(1, -5), (2, -15), (3, big + 3)], "point_id long, p long"
    )
    iv = spark.createDataFrame(
        [(1, -20, -1), (2, big, big + 10)], "iv_id long, s long, en long"
    )
    got = sorted(
        (r["iv_id"], r["point_id"])
        for r in interval_join(p, iv, "p", "s", "en", bucket_width=7).collect()
    )
    assert got == [(1, 1), (1, 2), (2, 3)]
