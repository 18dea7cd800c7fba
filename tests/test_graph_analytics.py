"""Graph analytics: degrees, fixed-iteration PageRank, triangle counts —
each checked against an independent pure-Python reference on deterministic
random graphs, plus structural invariants (rank mass conservation,
orientation-invariance of the triangle set)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from omop_concept_automapper_spark.operators.graph_analytics import (
    degree_distribution,
    degrees,
    pagerank,
    triangle_counts,
)


def _random_pairs(seed: int, n_nodes: int, n_edges: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    pairs = set()
    while len(pairs) < n_edges:
        a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    return sorted(pairs)


def _pairs_df(spark, pairs):
    return spark.createDataFrame(
        pairs, "doc_id_1 long, doc_id_2 long"
    )


def _py_pagerank(pairs, iterations=5, damping=0.85):
    adj: dict[int, list[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    n = len(adj)
    ranks = {v: 1.0 / n for v in adj}
    for _ in range(iterations):
        nxt = {v: (1.0 - damping) / n for v in adj}
        for u, nbrs in adj.items():
            share = damping * ranks[u] / len(nbrs)
            for v in nbrs:
                nxt[v] += share
        ranks = nxt
    return ranks


def _py_triangles(pairs):
    edge_set = set(pairs)
    nbrs: dict[int, set[int]] = {}
    for a, b in pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    counts: dict[int, int] = {}
    for a, b in pairs:
        for c in nbrs[a] & nbrs[b]:
            if (min(a, c), max(a, c)) in edge_set and (
                min(b, c),
                max(b, c),
            ) in edge_set:
                # each triangle found 3x (once per edge); a<b<c dedup
                if c > b:
                    for v in (a, b, c):
                        counts[v] = counts.get(v, 0) + 1
    return counts


@pytest.mark.parametrize("seed", [1, 7])
def test_degrees_match_reference(spark, seed):
    pairs = _random_pairs(seed, 40, 90)
    got = {
        r["node"]: r["degree"] for r in degrees(_pairs_df(spark, pairs)).collect()
    }
    want: dict[int, int] = {}
    for a, b in pairs:
        want[a] = want.get(a, 0) + 1
        want[b] = want.get(b, 0) + 1
    assert got == want
    dist = {
        r["degree"]: r["n_nodes"]
        for r in degree_distribution(_pairs_df(spark, pairs)).collect()
    }
    want_dist: dict[int, int] = {}
    for d in want.values():
        want_dist[d] = want_dist.get(d, 0) + 1
    assert dist == want_dist


@pytest.mark.parametrize("seed", [3, 11])
def test_pagerank_matches_python_reference(spark, seed):
    pairs = _random_pairs(seed, 30, 60)
    got = {
        r["node"]: r["rank"]
        for r in pagerank(_pairs_df(spark, pairs), iterations=5).collect()
    }
    want = _py_pagerank(pairs, iterations=5)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-9)
    # undirected graph, no dangling mass: ranks sum to 1
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_pagerank_star_hub_dominates(spark):
    # star: hub 0 <-> leaves 1..10; hub rank must strictly dominate
    pairs = [(0, i) for i in range(1, 11)]
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(_pairs_df(spark, pairs), iterations=8).collect()
    }
    leaf_ranks = [ranks[i] for i in range(1, 11)]
    assert ranks[0] > max(leaf_ranks) * 3
    # leaves are symmetric: identical ranks
    assert max(leaf_ranks) == pytest.approx(min(leaf_ranks), rel=1e-12)


@pytest.mark.parametrize("seed", [5, 13])
def test_triangle_counts_match_reference(spark, seed):
    pairs = _random_pairs(seed, 25, 80)
    df = _pairs_df(spark, pairs)
    got = {
        r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()
    }
    assert got == _py_triangles(pairs)
    # orientation is an enumeration optimization, never a semantics change
    got_naive = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(df, degree_oriented=False).collect()
    }
    assert got_naive == got


def test_concept_comention_feeds_analytics(spark):
    # the KG enrichment layer: accepted links + per-conv occurrences ->
    # concept pair graph, directly consumable by pagerank/degrees
    from omop_concept_automapper_spark.plans.graph import (
        concept_comention_pairs,
    )

    occ = spark.createDataFrame(
        [
            ("c1", 1, "aspirin"),
            ("c1", 2, "headache"),
            ("c1", 3, "nausea"),
            ("c2", 1, "aspirin"),
            ("c2", 2, "unlinked thing"),
            ("c3", 1, "headache"),
        ],
        "conv_id string, turn_idx int, mention_text string",
    )
    accepted = spark.createDataFrame(
        [
            ("aspirin", 100, None, 9),
            ("headache", 200, None, 10),
            ("nausea", 300, None, 8),
        ],
        "mention_text string, concept_id int, error string, confidence int",
    )
    pairs = concept_comention_pairs(occ, accepted)
    got = {
        (r["concept_id_1"], r["concept_id_2"]) for r in pairs.collect()
    }
    # conv c1 links {100, 200, 300}; c2/c3 add no pairs
    assert got == {(100, 200), (100, 300), (200, 300)}
    ranks = pagerank(
        pairs, src="concept_id_1", dst="concept_id_2", iterations=3
    ).collect()
    # K3 is symmetric: all ranks equal, summing to 1
    vals = [r["rank"] for r in ranks]
    assert len(vals) == 3
    assert max(vals) == pytest.approx(min(vals), rel=1e-12)
    assert sum(vals) == pytest.approx(1.0, rel=1e-9)


def test_triangle_counts_k4(spark):
    # K4: every vertex sits in C(3,2) = 3 triangles
    pairs = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(_pairs_df(spark, pairs)).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def _py_khop(pairs, sources, k):
    nbrs: dict[int, set[int]] = {}
    for a, b in pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    dist = {s: 0 for s in sources}
    frontier = set(sources)
    for d in range(1, k + 1):
        nxt = set()
        for u in frontier:
            for v in nbrs.get(u, ()):
                if v not in dist:
                    dist[v] = d
                    nxt.add(v)
        frontier = nxt
    return dist


def test_k_hop_matches_python_bfs(spark):
    from omop_concept_automapper_spark.operators.graph_analytics import k_hop

    pairs = _random_pairs(31, n_nodes=120, n_edges=200)
    sources = [0, 55]
    got = {
        r["node"]: r["dist"]
        for r in k_hop(
            _pairs_df(spark, pairs),
            spark.createDataFrame([(s,) for s in sources], "node long"),
            k=3,
        ).collect()
    }
    assert got == _py_khop(pairs, sources, 3)


def test_k_hop_early_exit_and_k_zero(spark):
    from omop_concept_automapper_spark.operators.graph_analytics import k_hop

    # two disconnected edges: frontier drains after 1 hop, loop must exit
    pairs = _pairs_df(spark, [(1, 2), (10, 11)])
    srcs = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["dist"] for r in k_hop(pairs, srcs, k=5).collect()}
    assert got == {1: 0, 2: 1}
    got0 = {r["node"]: r["dist"] for r in k_hop(pairs, srcs, k=0).collect()}
    assert got0 == {1: 0}
