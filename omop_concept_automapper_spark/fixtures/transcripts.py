"""Deterministic transcripts generator (FIXTURES.md §1, BASELINE.json input_hint).

Schema: (conv_id string, turn_idx int32, role string, text string,
tool string, ts timestamp) — the authoritative input shape.  Generation is
seeded and pure; ``scale`` multiplies the conversation count so the same
generator drives both pytest fixtures (~200 convs) and the bench run.

Skew: a handful of "hot" mentions are embedded into a large fraction of
turns so the mention groupBy exercises salting / AQE skew handling.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from omop_concept_automapper_spark.fixtures.vocabulary import build_lexicon

TRANSCRIPTS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("text", StringType(), False),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)
_TOOLS = ["search", "lookup", "ehr_query"]
_FILLERS = [
    "please review the chart notes",
    "follow up visit scheduled next month",
    "vitals were within expected limits",
    "no new complaints were voiced today",
    "will continue current plan unchanged",
    "summary sent to the referring office",
    "awaiting prior authorization paperwork",
    "spoke with the on call nurse",
]
_TEMPLATES = [
    "Patient reports {m} during the visit.",
    "Assessment notes {m} ongoing.",
    "Plan: monitor {m} closely.",
    "History significant for {m}.",
    "Discussed {m} with the patient.",
]

HOT_MENTION_COUNT = 3  # first N lexicon entries become hot keys (skew)


def _conv_rows(conv_i: int, seed: int, lexicon: list[str]) -> list[tuple]:
    """Rows for one conversation; rng seeded per-conv so the sequential and
    distributed generators emit byte-identical data."""
    rng = random.Random(f"{seed}:{conv_i}")
    hot = lexicon[:HOT_MENTION_COUNT]
    conv_id = f"conv-{conv_i:06d}"
    rows = []
    n_turns = rng.randint(2, 12)
    for turn_idx in range(n_turns):
        if rng.random() < 0.10:
            role, tool = "tool", rng.choice(_TOOLS)
        else:
            role, tool = ("user" if turn_idx % 2 == 0 else "assistant"), None
        n_mentions = rng.choice([0, 1, 1, 2, 2, 3])
        parts = [rng.choice(_FILLERS)]
        for _ in range(n_mentions):
            # hot mentions dominate (skew for salting tests)
            mention = rng.choice(hot) if rng.random() < 0.45 else rng.choice(lexicon)
            parts.append(rng.choice(_TEMPLATES).format(m=mention))
        parts.append(rng.choice(_FILLERS))
        ts = _EPOCH + timedelta(seconds=conv_i * 60 + turn_idx)
        rows.append((conv_id, turn_idx, role, " ".join(parts), tool, ts))
    return rows


def generate_transcript_rows(
    n_conversations: int = 200, seed: int = 42
) -> list[tuple]:
    lexicon = [e["mention_text"] for e in build_lexicon(seed=42)]
    rows = []
    for i in range(n_conversations):
        rows.extend(_conv_rows(i, seed, lexicon))
    return rows


def transcripts_dataframe(
    spark: SparkSession, n_conversations: int = 200, seed: int = 42
) -> DataFrame:
    rows = generate_transcript_rows(n_conversations, seed)
    return spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)


def transcripts_dataframe_distributed(
    spark: SparkSession,
    n_conversations: int,
    seed: int = 42,
    partitions: int | None = None,
    start: int = 0,
) -> DataFrame:
    """Scale-out generator: conversations synthesized on executors via
    mapInPandas over spark.range — identical rows to the sequential
    generator (per-conv rng), so bench data is reproducible at any
    parallelism.  This stands in for the production Iceberg transcripts
    scan (range-partitioned on conv_id: spark.range is already a
    contiguous range partitioning of conv ordinals).  ``start`` offsets the
    conv ordinal range so a delta batch gets ids disjoint from the base
    corpus (the incremental-fold bench)."""
    import pandas as pd

    lexicon = [e["mention_text"] for e in build_lexicon(seed=42)]
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

    def gen(batches):
        for pdf in batches:
            rows = []
            for conv_i in pdf["id"]:
                rows.extend(_conv_rows(int(conv_i), seed, lexicon))
            out = pd.DataFrame(rows, columns=cols)
            out["ts"] = pd.to_datetime(out["ts"], utc=True)
            yield out

    parts = partitions or spark.sparkContext.defaultParallelism * 2
    return spark.range(
        start, start + n_conversations, numPartitions=parts
    ).mapInPandas(gen, schema=TRANSCRIPTS_SCHEMA)
