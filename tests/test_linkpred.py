"""Link-prediction evaluation (operators/linkpred.py): hand-computed
ranks, the filtered-protocol discount, deterministic tie handling, NULL
scores, breakdown columns, and partition-layout invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from omop_concept_automapper_spark.operators.linkpred import (
    MRR_SCALE,
    link_prediction_eval,
    link_prediction_ranks,
)

SCHEMA = "inst long, candidate long, score long, is_true int"


def _ranks(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    out = link_prediction_ranks(df, ["inst"], **kw)
    return {(r["inst"], r["candidate"]): r["rank"] for r in out.collect()}


def test_basic_rank(spark):
    # true candidate has the 2nd-best score
    rows = [
        (1, 10, 900, 0),
        (1, 11, 800, 1),
        (1, 12, 700, 0),
        (1, 13, 600, 0),
    ]
    assert _ranks(spark, rows) == {(1, 11): 2}


def test_filtered_discount(spark):
    """A co-true candidate ahead does not worsen the rank (filtered
    protocol): both trues at scores 900/800 rank 1 and 1 — the 800 one
    discounts the true ahead of it."""
    rows = [
        (1, 10, 900, 1),
        (1, 11, 800, 1),
        (1, 12, 700, 0),
    ]
    assert _ranks(spark, rows) == {(1, 10): 1, (1, 11): 1}


def test_tie_breaks_by_candidate(spark):
    # equal scores: candidate asc wins; true at larger id ranks below
    rows = [
        (1, 20, 500, 1),
        (1, 10, 500, 0),
    ]
    assert _ranks(spark, rows) == {(1, 20): 2}


def test_null_score_sorts_last(spark):
    rows = [
        (1, 10, None, 0),
        (1, 11, 100, 1),
    ]
    assert _ranks(spark, rows) == {(1, 11): 1}
    # and a zero-norm true candidate lands last, not first
    rows2 = [
        (1, 10, None, 1),
        (1, 11, 100, 0),
    ]
    assert _ranks(spark, rows2) == {(1, 10): 2}


def test_eval_metrics(spark):
    # two instances: ranks 1 and 4 -> MRR = (1 + 1/4)/2 = 0.625
    rows = [
        (1, 10, 900, 1),
        (1, 11, 800, 0),
        (2, 10, 900, 0),
        (2, 11, 800, 0),
        (2, 12, 700, 0),
        (2, 13, 600, 1),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = link_prediction_eval(df, ["inst"], ks=(1, 3)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_instances"] == 2
    assert r["sum_recip_ppm"] == MRR_SCALE + MRR_SCALE // 4
    assert r["mrr_ppm"] == (MRR_SCALE + MRR_SCALE // 4) // 2
    assert r["hits_1"] == 1 and r["hits_3"] == 1


def test_eval_breakdown_by(spark):
    rows = [
        (1, 10, 900, 1, "a"),
        (1, 11, 800, 0, "a"),
        (2, 10, 900, 0, "b"),
        (2, 11, 800, 1, "b"),
    ]
    df = spark.createDataFrame(
        rows, SCHEMA + ", grp string"
    )
    out = {
        r["grp"]: r["mrr_ppm"]
        for r in link_prediction_eval(df, ["inst"], by=["grp"]).collect()
    }
    assert out == {"a": MRR_SCALE, "b": MRR_SCALE // 2}


def test_layout_invariance(spark):
    rows = [
        (i, c, ((i * 7 + c * 13) % 11) * 100, 1 if c == i % 5 else 0)
        for i in range(20)
        for c in range(5)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    a = link_prediction_eval(df, ["inst"]).collect()[0]
    b = link_prediction_eval(df.repartition(13), ["inst"]).collect()[0]
    assert a.asDict() == b.asDict()
