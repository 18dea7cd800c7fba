"""As-of join (operators/asof.py) both directions: brute-force
reference, equal-timestamp inclusivity, no-match NULLs, the
time-reversal duality between backward and forward, and validation."""

from __future__ import annotations

import random

import pytest

from omop_concept_automapper_spark.operators.asof import asof_join


def _frames(spark, seed=13, n_l=60, n_r=40):
    rng = random.Random(seed)
    lrows = [
        (i, rng.randrange(3), rng.randrange(0, 500)) for i in range(n_l)
    ]
    rrows = {}
    for i in range(n_r):
        k, t = rng.randrange(3), rng.randrange(0, 500)
        rrows[(k, t)] = min(rrows.get((k, t), 10**9), 1000 + i)
    rrows = [(k, t, v) for (k, t), v in rrows.items()]
    l = spark.createDataFrame(lrows, "lid long, k int, ts long")
    r = spark.createDataFrame(rrows, "k int, ts long, payload long")
    return lrows, rrows, l, r


def _ref(lrows, rrows, direction):
    out = {}
    for lid, lk, lt in lrows:
        best = None
        for rk, rt, v in rrows:
            if rk != lk:
                continue
            if direction == "backward" and rt <= lt:
                if best is None or rt > best[0]:
                    best = (rt, v)
            if direction == "forward" and rt >= lt:
                if best is None or rt < best[0]:
                    best = (rt, v)
        out[lid] = best[1] if best else None
    return out


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_matches_bruteforce(spark, direction):
    lrows, rrows, l, r = _frames(spark)
    got = {
        row["lid"]: row["right_payload"]
        for row in asof_join(
            l, r, on=["k"], ts_col="ts", right_payload=["payload"],
            direction=direction,
        ).collect()
    }
    assert got == _ref(lrows, rrows, direction)


def test_equal_ts_matches_both_directions(spark):
    l = spark.createDataFrame([(1, 0, 100)], "lid long, k int, ts long")
    r = spark.createDataFrame([(0, 100, 7)], "k int, ts long, payload long")
    for d in ("backward", "forward"):
        out = asof_join(
            l, r, on=["k"], ts_col="ts", right_payload=["payload"],
            direction=d,
        ).collect()
        assert out[0]["right_payload"] == 7, d


def test_no_match_yields_null(spark):
    l = spark.createDataFrame([(1, 0, 100)], "lid long, k int, ts long")
    r = spark.createDataFrame([(0, 200, 7)], "k int, ts long, payload long")
    back = asof_join(
        l, r, ["k"], "ts", ["payload"], direction="backward"
    ).collect()
    fwd = asof_join(
        l, r, ["k"], "ts", ["payload"], direction="forward"
    ).collect()
    assert back[0]["right_payload"] is None
    assert fwd[0]["right_payload"] == 7


def test_time_reversal_duality(spark):
    """forward(t) == backward(-t): negate every timestamp and the
    directions swap results exactly."""
    lrows, rrows, l, r = _frames(spark, seed=29)
    fwd = {
        row["lid"]: row["right_payload"]
        for row in asof_join(
            l, r, ["k"], "ts", ["payload"], direction="forward"
        ).collect()
    }
    from pyspark.sql import functions as F

    ln = l.withColumn("ts", -F.col("ts"))
    rn = r.withColumn("ts", -F.col("ts"))
    back_neg = {
        row["lid"]: row["right_payload"]
        for row in asof_join(
            ln, rn, ["k"], "ts", ["payload"], direction="backward"
        ).collect()
    }
    assert fwd == back_neg


def test_validation(spark):
    _, _, l, r = _frames(spark)
    with pytest.raises(ValueError):
        asof_join(l, r, ["k"], "ts", ["payload"], direction="nearest")
