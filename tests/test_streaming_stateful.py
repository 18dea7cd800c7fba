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
