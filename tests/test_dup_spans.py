"""Duplicate-substring spans (dedup.duplicate_ngram_spans): hand-built
cases, the cross_doc distinction, span merging, the short-doc fallback,
and a brute-force Python reference over randomized corpora."""

from __future__ import annotations

import random

import pytest

from omop_concept_automapper_spark.operators.dedup import (
    duplicate_ngram_spans,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _spans(spark, texts, **kw):
    out = duplicate_ngram_spans(_docs(spark, texts), **kw).collect()
    return sorted(
        (r["doc_id"], r["span_from"], r["span_to"], r["n_dup_grams"])
        for r in out
    )


def _ref(texts, n, min_count, cross_doc):
    """Brute-force reference: count grams, mark positions, merge runs."""
    toks = [t.lower().split() for t in texts]

    def grams(tk):
        if len(tk) >= n:
            return [
                (" ".join(tk[i : i + n]), i + 1)
                for i in range(len(tk) - n + 1)
            ]
        return [(" ".join(tk), 1)]

    from collections import Counter

    if cross_doc:
        c = Counter(
            g for d, tk in enumerate(toks) for g in {g for g, _ in grams(tk)}
        )
    else:
        c = Counter(g for tk in toks for g, _ in grams(tk))
    out = []
    for d, tk in enumerate(toks):
        w = min(n, len(tk))
        poss = sorted(p for g, p in grams(tk) if c[g] >= min_count)
        i = 0
        while i < len(poss):
            j = i
            while j + 1 < len(poss) and poss[j + 1] <= poss[j] + w:
                j += 1
            out.append((d, poss[i], poss[j] + w, j - i + 1))
            i = j + 1
    return sorted(out)


def test_shared_gram_two_docs(spark):
    texts = [
        "alpha beta gamma delta unique1 tail1",
        "prefix2 alpha beta gamma delta tail2",
        "nothing shared here at all now",
    ]
    got = _spans(spark, texts, n=4, min_count=2)
    # doc0 gram at pos 1, doc1 gram at pos 2; spans are [pos, pos+4)
    assert got == [(0, 1, 5, 1), (1, 2, 6, 1)]


def test_overlapping_grams_merge(spark):
    texts = [
        "a b c d e x1 y1",
        "z2 a b c d e w2",
    ]
    # 4-grams "a b c d" and "b c d e" both duplicated -> one merged span
    got = _spans(spark, texts, n=4, min_count=2)
    assert got == [(0, 1, 6, 2), (1, 2, 7, 2)]


def test_within_doc_repeat_and_cross_doc_flag(spark):
    texts = ["p q r s junk1 junk2 junk3 p q r s", "totally different words here"]
    # total-count mode: the repeated gram inside doc0 is marked
    got = _spans(spark, texts, n=4, min_count=2)
    assert got == [(0, 1, 5, 1), (0, 8, 12, 1)]
    # cross_doc mode: one doc only -> nothing marked
    assert _spans(spark, texts, n=4, min_count=2, cross_doc=True) == []


def test_short_doc_whole_text_gram(spark):
    texts = ["tiny doc", "tiny doc", "other thing"]
    got = _spans(spark, texts, n=4, min_count=2)
    assert got == [(0, 1, 3, 1), (1, 1, 3, 1)]


def test_validation(spark):
    with pytest.raises(ValueError):
        duplicate_ngram_spans(_docs(spark, ["x"]), n=0)
    with pytest.raises(ValueError):
        duplicate_ngram_spans(_docs(spark, ["x"]), min_count=1)


@pytest.mark.parametrize("cross_doc", [False, True])
def test_against_reference_fuzz(spark, cross_doc):
    rng = random.Random(42 + cross_doc)
    vocab = [f"w{i}" for i in range(12)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(2, 30)))
        for _ in range(40)
    ]
    got = _spans(spark, texts, n=3, min_count=2, cross_doc=cross_doc)
    assert got == _ref(texts, 3, 2, cross_doc)


def test_cut_spans_hand_case(spark):
    from omop_concept_automapper_spark.operators.dedup import cut_spans

    texts = [
        "alpha beta gamma delta unique1 tail1",
        "prefix2 alpha beta gamma delta tail2",
        "no duplicates in this one here",
    ]
    docs = _docs(spark, texts)
    spans = duplicate_ngram_spans(docs, n=4, min_count=2)
    out = {
        r["doc_id"]: (r["text"], r["n_tokens_cut"])
        for r in cut_spans(docs, spans).collect()
    }
    assert out[0] == ("unique1 tail1", 4)
    assert out[1] == ("prefix2 tail2", 4)
    assert out[2] == ("no duplicates in this one here", 0)


def test_cut_spans_fully_covered_doc(spark):
    from omop_concept_automapper_spark.operators.dedup import cut_spans

    texts = ["a b c d", "a b c d"]
    docs = _docs(spark, texts)
    spans = duplicate_ngram_spans(docs, n=4, min_count=2)
    out = {
        r["doc_id"]: (r["text"], r["n_tokens_cut"])
        for r in cut_spans(docs, spans).collect()
    }
    assert out == {0: ("", 4), 1: ("", 4)}


def test_cut_matches_span_token_counts(spark):
    from omop_concept_automapper_spark.operators.dedup import cut_spans

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(10)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(4, 25)))
        for _ in range(30)
    ]
    docs = _docs(spark, texts)
    spans = duplicate_ngram_spans(docs, n=3, min_count=2)
    per_doc_cut = {}
    for d, f, t, _ in sorted(
        (r["doc_id"], r["span_from"], r["span_to"], r["n_dup_grams"])
        for r in spans.collect()
    ):
        per_doc_cut[d] = per_doc_cut.get(d, 0) + (t - f)
    got = {
        r["doc_id"]: r["n_tokens_cut"]
        for r in cut_spans(docs, spans).collect()
    }
    for d in got:
        assert got[d] == per_doc_cut.get(d, 0)
