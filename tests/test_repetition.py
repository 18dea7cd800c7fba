"""Within-document repetition metrics (Gopher-style duplicate / top
n-gram fractions) vs a pure-Python reference, plus the map-only plan
guarantee (no shuffle: the whole computation stays inside the row)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from omop_concept_automapper_spark.functions.text import (
    dup_ngram_frac_bp,
    ngram_windows,
    top_ngram_frac_bp,
)
from omop_concept_automapper_spark.operators.dedup import tokens_col


def _py_grams(text: str, n: int) -> list[str]:
    toks = text.strip().lower().split()
    if len(toks) >= n:
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return [" ".join(toks)]


def _half_up(x: float) -> int:
    # Spark F.round / DuckDB ROUND are half-away-from-zero; Python round()
    # is banker's (10000/32 = 312.5 -> 312), so the reference must match
    # the engines, not Python
    import math

    return math.floor(x + 0.5)


def _py_dup_bp(text: str, n: int) -> int:
    g = _py_grams(text, n)
    return _half_up((len(g) - len(set(g))) * 10000.0 / len(g))


def _py_top_bp(text: str, n: int) -> int:
    g = _py_grams(text, n)
    top = max(g.count(x) for x in set(g))
    return _half_up(top * 10000.0 / len(g))


def _metrics(spark, texts, n):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    toks = tokens_col("text")
    out = df.select(
        "doc_id",
        dup_ngram_frac_bp(toks, n).alias("dup_bp"),
        top_ngram_frac_bp(toks, n).alias("top_bp"),
    ).collect()
    return {r["doc_id"]: (r["dup_bp"], r["top_bp"]) for r in out}


def test_handcrafted_cases(spark):
    texts = [
        "a b a b a b",          # bigrams: ab ba ab ba ab -> 3/5 dup, top 3/5
        "x y z w",              # all distinct
        "spam spam spam spam",  # maximal repetition
        "one",                  # shorter than n: single whole-text gram
        "",                     # empty text -> one empty gram
    ]
    got = _metrics(spark, texts, 2)
    assert got[0] == (round(3 * 10000.0 / 5), round(3 * 10000.0 / 5))
    assert got[1] == (0, round(1 * 10000.0 / 3))
    assert got[2] == (round(2 * 10000.0 / 3), 10000)
    assert got[3] == (0, 10000)
    assert got[4] == (0, 10000)


def test_matches_python_reference_fuzz(spark):
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(6)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 40)))
        for _ in range(60)
    ]
    for n in (2, 3):
        got = _metrics(spark, texts, n)
        for i, t in enumerate(texts):
            assert got[i] == (_py_dup_bp(t, n), _py_top_bp(t, n)), (n, t)


def test_repetition_metrics_plan_is_map_only(spark):
    df = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    toks = tokens_col("text")
    plan = (
        df.select(dup_ngram_frac_bp(toks, 2), top_ngram_frac_bp(toks, 2))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_ngram_windows_fallback_and_shape(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    rows = df.select(
        ngram_windows(F.split(F.col("text"), " "), 3).alias("g")
    ).collect()
    assert rows[0]["g"] == ["a b c", "b c d"]
    assert rows[1]["g"] == ["a b"]
