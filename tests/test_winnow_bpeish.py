"""Winnowing fingerprints + BPE-ish token counter (round-5 text additions).

The winnowing engine path is pinned against a transparent pure-Python
reference (same md5/packing arithmetic, procedural rightmost-min), plus the
MOSS guarantee property; the BPE-ish counter against hand-computed segment
counts.  Both gates are additionally oracle-checked bit-for-bit by the
all-gate DuckDB mirror in test_entry_contract.py.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from omop_concept_automapper_spark.functions.text import (
    BPEISH_PATTERN,
    bpeish_token_count,
)
from omop_concept_automapper_spark.operators.dedup import (
    WINNOW_POS_MOD,
    winnow_fingerprints,
)


def _py_winnow(text: str, w: int = 4, k: int = 3) -> set[tuple[int, int]]:
    """Reference winnowing: procedural rightmost-min, no packing tricks."""
    toks = text.strip().lower().split()
    if len(toks) >= k:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    else:
        grams = [" ".join(toks)]
    hashes = [
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % WINNOW_POS_MOD
        for g in grams
    ]
    m = len(hashes)
    out: set[tuple[int, int]] = set()
    for start in range(max(m - w, 0) + 1):
        window = hashes[start : start + w]
        best = min(window)
        # rightmost occurrence of the minimum
        rel = max(i for i, h in enumerate(window) if h == best)
        out.add((start + rel, best))
    return out


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "a b"),  # fewer tokens than the shingle size -> one whole-doc gram
    (2, "x x x x x x x x"),  # all-equal hashes exercise the rightmost tie rule
    (3, "alpha beta gamma delta alpha beta gamma delta alpha beta gamma delta"),
    (4, "one two three four five six seven eight nine ten eleven twelve"),
    (5, "  padded   whitespace\ttokens  split the same way  "),
    (6, "solo"),
]


def test_winnow_matches_python_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r.doc_id, r.fp_pos, r.fp_hash)
        for r in winnow_fingerprints(docs, w=4).collect()
    }
    want = {
        (doc_id, pos, h)
        for doc_id, text in DOCS
        for (pos, h) in _py_winnow(text, w=4)
    }
    assert got == want


def test_winnow_matches_python_reference_randomized(spark):
    # 40 seeded random docs over a 12-word alphabet: plenty of repeated
    # grams/hash ties, lengths straddling both the short-doc and the
    # multi-window regimes
    import random

    rng = random.Random("winnow-fuzz")
    words = "a b c d e f g h i j k l".split()
    docs = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(1, 40))))
        for i in range(40)
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.fp_pos, r.fp_hash)
        for r in winnow_fingerprints(sdf, w=4).collect()
    }
    want = {
        (doc_id, pos, h)
        for doc_id, text in docs
        for (pos, h) in _py_winnow(text, w=4)
    }
    assert got == want


def test_winnow_shared_run_guarantee(spark):
    # MOSS guarantee: a shared token run of length >= w + k - 1 (= 6 here)
    # yields at least one shared fingerprint hash.
    shared = "zeta eta theta iota kappa lambda"
    docs = spark.createDataFrame(
        [
            (0, f"left padding words {shared} trailing words here"),
            (1, f"{shared} completely different continuation text"),
        ],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(docs, w=4)
    per_doc = {
        r.doc_id: r.hs
        for r in fp.groupBy("doc_id")
        .agg(F.collect_set("fp_hash").alias("hs"))
        .collect()
    }
    assert set(per_doc[0]) & set(per_doc[1])


def test_winnow_is_map_only(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = (
        winnow_fingerprints(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_bpeish_token_count_fixed_cases(spark):
    cases = [
        (0, "don't", 2),  # [don]["'t"]
        (1, "hello world42!", 4),  # [hello][ world][42][!]
        (2, "", 0),
        (3, "   ", 1),  # one whitespace run
        (4, "I'll re-read it", 6),  # [I]['ll][ re][-][read][ it]
        (5, "a1b2", 4),  # letter/digit alternation splits
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in cases], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id", bpeish_token_count("text").alias("n")
        ).collect()
    }
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)


def test_dedup_clusters_groups_duplicates_and_keeps_singletons(spark):
    from omop_concept_automapper_spark.operators.dedup import dedup_clusters

    dup_a = "the patient reported severe chest pain radiating to the left arm"
    dup_b = "metformin five hundred milligrams twice daily with evening meals"
    docs = spark.createDataFrame(
        [
            (10, dup_a),
            (11, dup_a),  # exact dup of 10
            (12, dup_a + " since early this morning"),  # near dup of 10
            (20, dup_b),
            (21, dup_b),  # exact dup of 20
            (30, "completely unrelated text about spark physical planning"),
            (31, "another standalone document with no duplicate partner"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in dedup_clusters(docs).collect()}
    assert len(rows) == 7
    # duplicates collapse to the min doc_id of their cluster
    assert rows[10].cluster_id == rows[11].cluster_id == 10
    assert rows[12].cluster_id == 10  # near-dup joins via shared shingles
    assert rows[20].cluster_id == rows[21].cluster_id == 20
    # singletons keep their own id and are their own keeper
    for d in (30, 31):
        assert rows[d].cluster_id == d and rows[d].is_keeper == 1
    # exactly one keeper per cluster
    keepers = [r.doc_id for r in rows.values() if r.is_keeper == 1]
    assert sorted(keepers) == [10, 20, 30, 31]


def test_dedup_clusters_empty_candidate_graph(spark):
    # no shared shingles at all -> CC runs on an empty edge set and every
    # doc must come back as its own singleton cluster
    from omop_concept_automapper_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame(
        [
            (1, "alpha bravo charlie delta echo"),
            (2, "zulu yankee xray whiskey victor"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in dedup_clusters(docs).collect()}
    assert rows[1].cluster_id == 1 and rows[1].is_keeper == 1
    assert rows[2].cluster_id == 2 and rows[2].is_keeper == 1


def test_bpeish_pattern_has_no_lookarounds():
    # the oracle runs on RE2 (no lookarounds, no backrefs) — keep the
    # pattern inside the Java∩RE2 dialect
    for banned in ("(?=", "(?!", "(?<", "\\1"):
        assert banned not in BPEISH_PATTERN
