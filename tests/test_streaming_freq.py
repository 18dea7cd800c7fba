"""Streaming heavy hitters (streaming/freq.py): lane-sharded mergeable
Misra–Gries folds under availableNow — candidate superset law across
shuffled microbatch splits, exact-verify equality with the batch
operator over the union, replay idempotence of the state fold, and
bounded summary size."""

from __future__ import annotations

import glob
import os
import random
import shutil

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from omop_concept_automapper_spark.operators.freq import heavy_hitters
from omop_concept_automapper_spark.streaming.freq import (
    latest_candidates,
    streaming_heavy_hitter_candidates,
    verify_heavy_hitters,
)

SCHEMA = StructType(
    [StructField("row_id", LongType()), StructField("val", StringType())]
)

NUM, DEN = 1, 30


def _rows(seed: int, n: int):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        if rng.random() < 0.35:
            v = rng.choice(["hot_a", "hot_b", "hot_c", "hot_d"])
        else:
            v = f"tail_{rng.randrange(400)}"
        rows.append((i, v))
    return rows


_WAVE_SEQ = iter(range(10_000))


def _land_waves(spark, landing, waves):
    os.makedirs(landing, exist_ok=True)
    for wave in waves:
        wi = next(_WAVE_SEQ)  # unique names across calls — the file
        # source tracks seen FILENAMES, so a reused name would be skipped
        staging = landing + f"_stage{wi}"
        spark.createDataFrame(wave, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        for i, f in enumerate(glob.glob(os.path.join(staging, "part-*"))):
            shutil.copy(f, os.path.join(landing, f"wave{wi}-{i}.parquet"))
        shutil.rmtree(staging)


def test_streaming_candidates_superset_and_exact_verify(spark, tmp_path):
    rows = _rows(5, 6000)
    rng = random.Random(99)
    shuffled = rows[:]
    rng.shuffle(shuffled)  # event-order-hostile split
    third = len(shuffled) // 3
    waves = [shuffled[:third], shuffled[third : 2 * third],
             shuffled[2 * third :]]

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "cand")
    ckpt = str(tmp_path / "ckpt")

    # fold the three waves in three separate drains (wave lands, drain,
    # next wave lands, drain...) — each drain resumes from the checkpoint
    for wave in waves:
        _land_waves(spark, landing, [wave])
        streaming_heavy_hitter_candidates(
            spark, landing, SCHEMA, "val", ckpt, out, NUM, DEN, n_lanes=8
        )

    cands = latest_candidates(spark, out)
    cand_vals = {r["value"] for r in cands.collect()}

    union = spark.createDataFrame(rows, SCHEMA)
    batch = {
        r["val"]: (r["freq"], r["total"])
        for r in heavy_hitters(union, "val", NUM, DEN).collect()
    }
    assert batch, "fixture must produce heavy hitters"
    # superset law: every true heavy hitter of the UNION is a candidate
    assert set(batch) <= cand_vals
    # exact verify over the landed union == the batch operator
    landed = spark.read.schema(SCHEMA).parquet(landing)
    verified = {
        r["val"]: (r["freq"], r["total"])
        for r in verify_heavy_hitters(
            landed, "val", cands, NUM, DEN
        ).collect()
    }
    assert verified == batch
    # bounded state: each lane's summary is at most capacity entries
    from collections import Counter

    per_lane = Counter(r["lane"] for r in cands.collect())
    assert all(c <= 30 for c in per_lane.values())


def test_streaming_candidates_replay_is_idempotent(spark, tmp_path):
    """Re-draining with no new files must add no new sink rows and keep
    the same final summaries (checkpoint replay safety)."""
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "cand")
    ckpt = str(tmp_path / "ckpt")
    _land_waves(spark, landing, [_rows(6, 1200)])
    streaming_heavy_hitter_candidates(
        spark, landing, SCHEMA, "val", ckpt, out, NUM, DEN, n_lanes=4
    )
    before = sorted(
        map(tuple, latest_candidates(spark, out).collect())
    )
    n_before = spark.read.parquet(out).count()
    streaming_heavy_hitter_candidates(
        spark, landing, SCHEMA, "val", ckpt, out, NUM, DEN, n_lanes=4
    )
    assert spark.read.parquet(out).count() == n_before
    assert sorted(map(tuple, latest_candidates(spark, out).collect())) == before


def test_streaming_candidates_null_values_excluded(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "cand")
    ckpt = str(tmp_path / "ckpt")
    _land_waves(
        spark, landing, [[(1, "x"), (2, None), (3, "x"), (4, None)]]
    )
    streaming_heavy_hitter_candidates(
        spark, landing, SCHEMA, "val", ckpt, out, 1, 2, n_lanes=2
    )
    cands = latest_candidates(spark, out)
    assert {r["value"] for r in cands.collect()} == {"x"}
    landed = spark.read.schema(SCHEMA).parquet(landing)
    got = verify_heavy_hitters(landed, "val", cands, 1, 2).collect()
    assert [(r["val"], r["freq"], r["total"]) for r in got] == [("x", 2, 2)]
