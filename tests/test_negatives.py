"""Deterministic KG negative sampling (operators/negatives.py) — checked
against a pure-Python replica of the hash-draw semantics, plus the
properties that matter: partition-layout independence, filtered semantics
(no draw is ever a true edge), and the unfiltered variant keeping
self-collisions."""

from __future__ import annotations

import hashlib

import pytest

from omop_concept_automapper_spark.operators.negatives import (
    kg_negative_samples,
)


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_negatives(edges, n_neg, filtered=True):
    e = sorted(set(edges))
    cands = sorted({o for _, o in e})
    n = len(cands)
    true = set(e)
    out = []
    for s, o in e:
        for i in range(1, n_neg + 1):
            neg = cands[_h(f"{s}|{o}|{i}") % n]
            if filtered and (s, neg) in true:
                continue
            out.append((s, o, i, neg))
    return sorted(out)


_EDGES = [
    (1, "apple"),
    (1, "banana"),
    (2, "banana"),
    (3, "cherry"),
    (3, "apple"),
    (4, "durian"),
    (1, "apple"),  # duplicate edge — must not double-sample
]


def _edges_df(spark, rows=None):
    return spark.createDataFrame(rows or _EDGES, "subj long, obj string")


def test_negative_samples_match_python_reference(spark):
    got = sorted(
        (r["subj"], r["obj"], r["neg_rank"], r["neg_obj"])
        for r in kg_negative_samples(_edges_df(spark), n_neg=3).collect()
    )
    assert got == _py_negatives(_EDGES, 3)
    assert got, "fixture must produce negatives"


def test_negative_samples_layout_independent(spark):
    rows = [(i % 17, f"obj_{i % 11}") for i in range(300)]

    def run(d):
        return sorted(map(tuple, kg_negative_samples(d, n_neg=2).collect()))

    assert run(_edges_df(spark, rows).repartition(1)) == run(
        _edges_df(spark, rows).repartition(13)
    ) == _py_negatives(rows, 2)


def test_negative_samples_filtered_never_emits_true_edges(spark):
    rows = [(i % 5, f"o{i % 4}") for i in range(100)]
    true = set(rows)
    out = kg_negative_samples(_edges_df(spark, rows), n_neg=4).collect()
    for r in out:
        assert (r["subj"], r["neg_obj"]) not in true
        assert r["neg_obj"] != r["obj"]


def test_negative_samples_unfiltered_keeps_collisions(spark):
    got = sorted(
        map(
            tuple,
            kg_negative_samples(
                _edges_df(spark), n_neg=2, filtered=False
            ).collect(),
        )
    )
    want = _py_negatives(_EDGES, 2, filtered=False)
    assert got == want
    # unfiltered yields exactly n_neg rows per distinct edge
    assert len(got) == len(set(_EDGES)) * 2


def test_negative_samples_null_rows_dropped_and_validation(spark):
    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (2, None), (2, "b"), (3, "c")],
        "subj long, obj string",
    )
    out = kg_negative_samples(df, n_neg=1).collect()
    assert all(r["subj"] in (1, 2, 3) and r["obj"] in "abc" for r in out)
    with pytest.raises(ValueError):
        kg_negative_samples(df, n_neg=0)
    with pytest.raises(ValueError):
        kg_negative_samples(
            spark.createDataFrame([(1, "only")], "subj long, obj string"),
            n_neg=1,
        )


def test_negative_samples_plan_never_collapses_to_one_task(spark):
    df = _edges_df(spark, [(i, f"o{i % 9}") for i in range(200)])
    plan = (
        kg_negative_samples(df, n_neg=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange SinglePartition" not in plan
