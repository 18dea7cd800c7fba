"""Streaming ExactSubstr span fold (streaming/spans.py): the spans table
must equal batch duplicate_ngram_spans over the union under arbitrary
arrival order — including retroactive span creation in OLD documents when
a later batch pushes a shared gram across min_count, and span MERGING
when a new duplicate bridges two existing spans — plus replay and
crash-window idempotence."""

from __future__ import annotations

import pytest

from omop_concept_automapper_spark.catalog import Warehouse
from omop_concept_automapper_spark.operators.dedup import (
    duplicate_ngram_spans,
)
from omop_concept_automapper_spark.streaming.spans import (
    SPAN_DOCS_SCHEMA,
    fold_spans_batch,
    stream_duplicate_spans,
)

# doc 100 (wave 1) shares "alpha beta gamma delta" with doc 300 (wave 3):
# no span anywhere until wave 3, then BOTH get one retroactively.
# doc 101's two separate dup grams ("p q r s" with 201, "w x y z" with
# 301) sit 4 apart; wave 3's doc 301 also duplicates the BRIDGE gram
# ("s mid1 mid2 w" with 302) so doc 101's two spans must merge into one.
_W1 = [
    (100, "alpha beta gamma delta tail100"),
    (101, "p q r s mid1 mid2 w x y z"),
    (102, "totally unique text one here"),
]
_W2 = [
    (201, "front201 p q r s back201"),
    (202, "another unique doc two"),
]
_W3 = [
    (300, "pre300 alpha beta gamma delta"),
    (301, "w x y z trail301"),
    (302, "s mid1 mid2 w again302"),
]


def _waves():
    return [_W1, _W2, _W3]


def _union_df(spark):
    rows = [r for w in _waves() for r in w]
    return spark.createDataFrame(rows, SPAN_DOCS_SCHEMA)


def _batch_spans(spark):
    return sorted(
        (r["doc_id"], r["span_from"], r["span_to"], r["n_dup_grams"])
        for r in duplicate_ngram_spans(
            _union_df(spark), n=4, min_count=2
        ).collect()
    )


def _table_spans(wh):
    return sorted(
        (r["doc_id"], r["span_from"], r["span_to"], r["n_dup_grams"])
        for r in wh.table("spans_spans").read().collect()
    )


@pytest.fixture()
def landed(spark, tmp_path):
    landing = str(tmp_path / "landing")
    for rows in _waves():
        spark.createDataFrame(rows, SPAN_DOCS_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(landing)
    return landing


def test_stream_equals_batch_with_retroactive_spans(
    spark, tmp_path, landed
):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    stream_duplicate_spans(
        spark, landed, wh, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    got = _table_spans(wh)
    want = _batch_spans(spark)
    assert got == want
    by_doc = {}
    for d, f, t, g in got:
        by_doc.setdefault(d, []).append((f, t, g))
    # retroactive: wave-1 doc 100 got its span only after wave 3
    assert by_doc[100] == [(1, 5, 1)]
    # merging: doc 101's two early spans + the wave-3 bridge = ONE span
    assert len(by_doc[101]) == 1
    assert by_doc[101][0][0] == 1 and by_doc[101][0][1] == 11
    # unique docs never got spans
    assert 102 not in by_doc and 202 not in by_doc


def test_intermediate_state_is_exact_prefix_answer(spark, tmp_path):
    """After waves 1+2 the table equals the batch operator over JUST
    waves 1+2 (not a superset, not missing the 101~201 dup)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    tbls = (
        wh.table("spans_docs"),
        wh.table("spans_grams"),
        wh.table("spans_spans"),
    )
    for i, rows in enumerate(_waves()[:2]):
        fold_spans_batch(
            spark.createDataFrame(rows, SPAN_DOCS_SCHEMA), i, *tbls,
            n=4, min_count=2,
        )
    got = _table_spans(wh)
    want = sorted(
        (r["doc_id"], r["span_from"], r["span_to"], r["n_dup_grams"])
        for r in duplicate_ngram_spans(
            spark.createDataFrame(_W1 + _W2, SPAN_DOCS_SCHEMA),
            n=4, min_count=2,
        ).collect()
    )
    assert got == want and len(got) == 2  # the 101~201 "p q r s" pair


def test_replay_and_crash_window_idempotence(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    tbls = (
        wh.table("spans_docs"),
        wh.table("spans_grams"),
        wh.table("spans_spans"),
    )

    def apply(i):
        fold_spans_batch(
            spark.createDataFrame(_waves()[i], SPAN_DOCS_SCHEMA), i,
            *tbls, n=4, min_count=2,
        )

    apply(0)
    apply(1)
    s1 = _table_spans(wh)
    # full replay of batch 1: all markers present -> appends skip,
    # recompute converges to the same state
    apply(1)
    assert _table_spans(wh) == s1
    apply(2)
    final = _table_spans(wh)
    assert final == _batch_spans(spark)
    # crash-window replay of batch 2 (appends committed, spans too —
    # plus one more full replay) stays fixed
    apply(2)
    assert _table_spans(wh) == final
