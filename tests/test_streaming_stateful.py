"""Stateful streaming dedup + windowed mention counts (availableNow)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from omop_concept_automapper_spark.fixtures.transcripts import transcripts_dataframe
from omop_concept_automapper_spark.fixtures.vocabulary import build_lexicon
from omop_concept_automapper_spark.streaming.stateful import (
    streaming_first_seen_dedup,
    windowed_mention_counts,
)

DOC_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


def test_streaming_first_seen_dedup(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(3, "same text"), (1, "same text"), (2, "other text")], DOC_SCHEMA
    ).write.parquet(landing)
    streaming_first_seen_dedup(spark, landing, DOC_SCHEMA, ckpt, out)
    rows = {r["text"]: r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert rows == {"same text": 1, "other text": 2}  # min doc_id kept

    # second batch: duplicate of an already-seen key is dropped via state
    import glob
    import shutil

    staging = str(tmp_path / "staging")
    spark.createDataFrame(
        [(9, "same text"), (10, "brand new")], DOC_SCHEMA
    ).coalesce(1).write.parquet(staging)
    for i, f in enumerate(glob.glob(os.path.join(staging, "part-*.parquet"))):
        shutil.copy(f, os.path.join(landing, f"b2-{i}.parquet"))
    streaming_first_seen_dedup(spark, landing, DOC_SCHEMA, ckpt, out)
    rows = {r["text"]: r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert rows == {"same text": 1, "other text": 2, "brand new": 10}


def test_windowed_mention_counts(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    transcripts_dataframe(spark, n_conversations=30).write.parquet(landing)
    forms = [e["mention_text"] for e in build_lexicon()]
    windowed_mention_counts(spark, landing, forms, ckpt, out)
    df = spark.read.parquet(out)
    rows = df.collect()
    assert rows, "windows should be emitted once the stream drains"
    # window bounds are 5-minute aligned and counts positive
    for r in rows:
        assert r["n"] >= 1
        assert r["window_start"].minute % 5 == 0
        assert (r["window_end"] - r["window_start"]).total_seconds() == 300
    # totals equal batch ground truth for closed windows: compare against a
    # batch computation over the same input restricted to emitted windows
    from omop_concept_automapper_spark.plans.mentions import (
        extract_mention_occurrences,
    )

    batch = transcripts_dataframe(spark, n_conversations=30)
    occ = extract_mention_occurrences(batch, forms).join(
        batch.select("conv_id", "turn_idx", "ts"), ["conv_id", "turn_idx"]
    )
    batch_counts = {
        (r["ws"], r["mention_text"]): r["n"]
        for r in occ.select(
            F.window("ts", "5 minutes").alias("win"), "mention_text"
        )
        .select(F.col("win.start").alias("ws"), "mention_text")
        .groupBy("ws", "mention_text")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert batch_counts[(r["window_start"], r["mention_text"])] == r["n"]


def test_streaming_dedup_with_state_ttl(spark, tmp_path):
    """Bounded-state dedup (continuous query): within the TTL a duplicate
    is suppressed; a duplicate arriving after the key's TTL elapsed is
    re-emitted — the approximate-dedup tradeoff that keeps state size
    bounded at 10^12-turn streaming scale.  TTL mode runs continuously
    (ProcessingTimeTimeout cannot drain-and-stop), so the test polls the
    sink and stops the returned query."""
    import glob
    import os
    import shutil
    import time

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # generous TTL: the staleness clock runs between BATCH PROCESSING
    # times, and scheduling gaps of a few seconds are normal — a tight TTL
    # would make the "within TTL" leg flaky
    ttl_ms = 12_000
    os.makedirs(landing, exist_ok=True)

    def land(batch, tag):
        staging = str(tmp_path / f"staging-{tag}")
        spark.createDataFrame(batch, DOC_SCHEMA).coalesce(1).write.parquet(
            staging
        )
        for i, f in enumerate(
            glob.glob(os.path.join(staging, "part-*.parquet"))
        ):
            shutil.copy(f, os.path.join(landing, f"{tag}-{i}.parquet"))

    def sink_rows():
        try:
            return sorted(
                (r["text"], r["doc_id"])
                for r in spark.read.parquet(out).collect()
            )
        except Exception:
            return []

    def wait_for(n, deadline_s=90):
        t0 = time.time()
        while time.time() - t0 < deadline_s:
            rows = sink_rows()
            if len(rows) >= n:
                return rows
            time.sleep(0.5)
        raise AssertionError(f"sink never reached {n} rows: {sink_rows()}")

    land([(5, "alpha text"), (2, "alpha text"), (3, "beta text")], "b1")
    q = streaming_first_seen_dedup(
        spark, landing, DOC_SCHEMA, ckpt, out, state_ttl_ms=ttl_ms
    )
    try:
        assert wait_for(2) == [("alpha text", 2), ("beta text", 3)]
        # within TTL: duplicate suppressed (sighting refreshes the TTL)
        land([(9, "alpha text")], "b2")
        time.sleep(4.0)
        assert len(sink_rows()) == 2
        # after TTL: the marker is stale -> the duplicate re-emits
        time.sleep((ttl_ms + 3_000) / 1000)
        land([(11, "alpha text")], "b3")
        rows = wait_for(3)
        assert rows == [
            ("alpha text", 2),
            ("alpha text", 11),
            ("beta text", 3),
        ]
    finally:
        q.stop()
