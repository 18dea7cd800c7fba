"""Benchmark decontamination: injected n-gram overlap is found with exact
position counts, disjoint corpora report nothing, short eval items are
protected via the whole-text fallback gram, and the eval side joins as a
broadcast (no shuffle on the corpus scan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from omop_concept_automapper_spark.operators.decontam import (
    decontaminate,
    ngram_hashes,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_injected_contamination_exact_counts(spark):
    # eval doc = 10 tokens e0..e9 -> 3 distinct 8-grams
    eval_docs = _docs(spark, [(100, " ".join(f"e{i}" for i in range(10)))])
    # corpus doc 1 embeds the eval prefix gram e0..e7 once, surrounded by
    # clean tokens -> exactly 1 hit among its 8-gram positions
    clean = " ".join(f"c{i}" for i in range(7))
    contaminated = clean + " " + " ".join(f"e{i}" for i in range(8)) + " " + clean
    corpus = _docs(
        spark,
        [
            (1, contaminated),
            (2, " ".join(f"x{i}" for i in range(20))),  # clean
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in decontaminate(corpus, eval_docs).collect()}
    assert set(out) == {1}
    row = out[1]
    n_tokens = 7 + 8 + 7
    assert row["n_grams"] == n_tokens - 8 + 1
    assert row["n_hits"] == 1
    assert row["n_distinct_hits"] == 1
    assert row["contam_bp"] == round(1 * 10000.0 / row["n_grams"])


def test_repeated_hit_positions_counted_per_position(spark):
    gram = " ".join(f"g{i}" for i in range(8))
    eval_docs = _docs(spark, [(100, gram)])
    # the eval gram occurs twice (back-to-back repeat also creates no
    # accidental extra matches because e.g. 'g7 g0 ...' hashes differ)
    corpus = _docs(spark, [(1, gram + " sep " + gram)])
    row = decontaminate(corpus, eval_docs).collect()[0]
    assert row["n_hits"] == 2
    assert row["n_distinct_hits"] == 1


def test_disjoint_corpora_report_nothing(spark):
    eval_docs = _docs(spark, [(100, " ".join(f"e{i}" for i in range(12)))])
    corpus = _docs(spark, [(1, " ".join(f"c{i}" for i in range(12)))])
    assert decontaminate(corpus, eval_docs).count() == 0


def test_short_eval_doc_protected_by_whole_text_gram(spark):
    # a 3-token eval answer (shorter than n=8) must still be detectable:
    # its whole text is one gram, and any corpus doc ALSO shorter than n
    # with identical text collides on the fallback gram
    eval_docs = _docs(spark, [(100, "alpha beta gamma")])
    corpus = _docs(spark, [(1, "alpha beta gamma"), (2, "alpha beta delta")])
    out = {r["doc_id"] for r in decontaminate(corpus, eval_docs).collect()}
    assert out == {1}


def test_ngram_hashes_are_longs_and_positional(spark):
    docs = _docs(spark, [(1, " ".join(f"t{i}" for i in range(10)))])
    rows = ngram_hashes(docs, n=8).collect()
    assert len(rows) == 3  # 10 - 8 + 1 positions
    assert all(isinstance(r["gram_hash"], int) for r in rows)


def test_eval_side_is_broadcast(spark):
    eval_docs = _docs(spark, [(100, " ".join(f"e{i}" for i in range(10)))])
    corpus = _docs(spark, [(1, " ".join(f"c{i}" for i in range(10)))])
    plan = decontaminate(corpus, eval_docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
