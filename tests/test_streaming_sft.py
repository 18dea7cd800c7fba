"""Streaming SFT pair fold (streaming/sft.py): the pairs table must equal
the batch operator over the union under ARBITRARY arrival order —
including retroactive context rewrites when a turn lands event-time
before an already-paired response — and the fold must be replay- and
crash-replay-idempotent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from omop_concept_automapper_spark.catalog import Warehouse
from omop_concept_automapper_spark.operators.sft import (
    context_response_pairs,
)
from omop_concept_automapper_spark.streaming.sft import (
    TURNS_STREAM_SCHEMA,
    fold_sft_batch,
    stream_sft_pairs,
)


def _waves():
    """Three arrival waves with event-time (turn_idx) SHUFFLED across
    them: conv c1's response at turn 2 arrives before its context turn 1
    (no pair until wave 2), and turn 3 lands last, rewriting the context
    of the turn-4 response that was paired in wave 2."""
    c1 = {
        1: ("user", "hi"),
        2: ("assistant", "hello"),
        3: ("user", "actually wait"),
        4: ("assistant", "sure"),
        5: ("user", "thanks"),
        6: ("assistant", "bye"),
    }
    w1 = [("c1", 2, *c1[2]), ("c1", 5, *c1[5]), ("c2", 1, "assistant", "welcome")]
    w2 = [("c1", 1, *c1[1]), ("c1", 4, *c1[4]), ("c1", 6, *c1[6]),
          ("c2", 2, "user", "ok")]
    w3 = [("c1", 3, *c1[3]), ("c2", 3, "assistant", "great")]
    return [w1, w2, w3]


def _union_df(spark):
    rows = [r for w in _waves() for r in w]
    return spark.createDataFrame(rows, TURNS_STREAM_SCHEMA)


def _batch_pairs_pdf(spark):
    return (
        context_response_pairs(
            _union_df(spark), "conv_id", ["turn_idx"], "role", "text",
            "assistant", k=3,
        )
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )


@pytest.fixture()
def landed(spark, tmp_path):
    landing = str(tmp_path / "landing")
    for rows in _waves():
        spark.createDataFrame(rows, TURNS_STREAM_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(landing)
    return landing


def _pairs_pdf(wh):
    return (
        wh.table("sft_pairs")
        .read()
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )


def test_stream_equals_batch_under_shuffled_arrival(
    spark, tmp_path, landed
):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    stream_sft_pairs(
        spark, landed, wh, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    got = _pairs_pdf(wh)
    want = _batch_pairs_pdf(spark)
    assert got.columns.tolist() == want.columns.tolist()
    assert got.values.tolist() == want.values.tolist()
    # the retroactive rewrite really happened: turn 4's final context
    # includes the wave-3 turn 3
    by_key = {
        (r.conv_id, r.turn_idx): r.context for r in got.itertuples()
    }
    assert "user: actually wait" in by_key[("c1", 4)]
    # and the assistant-first conv-opening turn is not a pair
    assert ("c2", 1) not in by_key


def test_replay_through_fresh_checkpoint_is_noop(spark, tmp_path, landed):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    stream_sft_pairs(
        spark, landed, wh, str(tmp_path / "ckpt1"), max_files_per_trigger=1
    )
    first = _pairs_pdf(wh)
    n_snaps = len(wh.table("sft_pairs").history())
    stream_sft_pairs(
        spark, landed, wh, str(tmp_path / "ckpt2"), max_files_per_trigger=1
    )
    again = _pairs_pdf(wh)
    assert again.values.tolist() == first.values.tolist()
    assert len(wh.table("sft_pairs").history()) == n_snaps


def test_crash_between_appends_replays_identically(spark, tmp_path):
    """Apply batch 0; then replay batch 0 after only its TURNS append
    committed (the crash window) — the recompute must converge to the
    same state, and a full re-apply must change nothing."""
    waves = _waves()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    turns_tbl, pairs_tbl = wh.table("sft_turns"), wh.table("sft_pairs")

    def apply(i):
        fold_sft_batch(
            spark.createDataFrame(waves[i], TURNS_STREAM_SCHEMA), i,
            turns_tbl, pairs_tbl, "conv_id", ["turn_idx"], "role",
            "text", "assistant", 3,
        )

    apply(0)
    state0 = _pairs_pdf(wh).values.tolist()
    apply(0)  # full replay: both markers present -> appends skip
    assert _pairs_pdf(wh).values.tolist() == state0
    apply(1)
    apply(2)
    assert _pairs_pdf(wh).values.tolist() == _batch_pairs_pdf(
        spark
    ).values.tolist()
