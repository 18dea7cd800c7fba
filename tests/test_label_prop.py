"""Deterministic synchronous label propagation
(graph_analytics.label_propagation): community separation on two bridged
cliques, a Python reference over random graphs, layout invariance, and
the smallest-label tie rule."""

from __future__ import annotations

import random

import pytest

from omop_concept_automapper_spark.operators.graph_analytics import (
    label_propagation,
)


def _run(spark, pairs, iterations):
    df = spark.createDataFrame(pairs, "doc_id_1 long, doc_id_2 long")
    out = label_propagation(df, iterations=iterations).collect()
    return {r["node"]: r["label"] for r in out}


def _ref(pairs, iterations):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    labels = {v: v for v in adj}
    for _ in range(iterations):
        new = {}
        for v in adj:
            votes = {}
            for nb in adj[v]:
                votes[labels[nb]] = votes.get(labels[nb], 0) + 1
            best = min(votes, key=lambda l: (-votes[l], l))
            new[v] = best
        labels = new
    return labels


def test_two_cliques_with_bridge(spark):
    c1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    c2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    pairs = c1 + c2 + [(3, 10)]
    got = _run(spark, pairs, iterations=5)
    # each clique converges to one label; the two differ
    assert len({got[v] for v in range(4)}) == 1
    assert len({got[v] for v in range(10, 14)}) == 1
    assert got[0] != got[13]


def test_tie_breaks_to_smallest_label(spark):
    # node 2 sees labels {0, 1} once each after round 1 start: picks 0
    got = _run(spark, [(0, 2), (1, 2)], iterations=1)
    assert got[2] == 0


@pytest.mark.parametrize("seed", [3, 11])
def test_against_reference_fuzz(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(30))
    pairs = sorted(
        {
            tuple(sorted(rng.sample(nodes, 2)))
            for _ in range(60)
        }
    )
    for iters in (1, 3):
        assert _run(spark, pairs, iters) == _ref(pairs, iters)


def test_layout_invariance(spark):
    rng = random.Random(99)
    pairs = sorted(
        {tuple(sorted(rng.sample(range(40), 2))) for _ in range(80)}
    )
    df = spark.createDataFrame(pairs, "doc_id_1 long, doc_id_2 long")
    a = {
        r["node"]: r["label"]
        for r in label_propagation(df, iterations=3).collect()
    }
    b = {
        r["node"]: r["label"]
        for r in label_propagation(
            df.repartition(17), iterations=3
        ).collect()
    }
    assert a == b
