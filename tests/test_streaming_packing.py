"""Streaming corpus assembly (streaming/packing.py): pack offsets and
mixture sequence numbers must continue exactly across microbatches, be
replay-idempotent, and agree with the batch operators when arrival order
respects event time."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from omop_concept_automapper_spark.catalog import Warehouse
from omop_concept_automapper_spark.streaming.packing import (
    DOCS_STREAM_SCHEMA,
    stream_mixture_interleave,
    stream_pack_sequences,
)

T0 = datetime.datetime(2026, 1, 1)


def _doc_rows(n_waves: int = 3, start: int = 0):
    """Arrival waves; ts strictly increases with doc_id so batch
    operators (ordered by doc_id) and the stream (ordered by ts, doc_id)
    see the same total order.  'junk' is outside the mixture spec."""
    srcs = ["web", "wiki", "code", "junk"]
    waves = []
    did = start
    for wave in range(n_waves):
        rows = []
        for i in range(40):
            text = " ".join(f"tok{j}" for j in range((did % 17) + 1))
            rows.append(
                (
                    did,
                    srcs[did % 4],
                    text if did % 11 else "   ",  # some zero-token docs
                    T0 + datetime.timedelta(seconds=did),
                )
            )
            did += 1
        waves.append(rows)
    return waves


@pytest.fixture()
def landed(spark, tmp_path):
    landing = str(tmp_path / "landing")
    for rows in _doc_rows():
        spark.createDataFrame(rows, DOCS_STREAM_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(landing)
    return landing


def test_stream_pack_continues_offsets_and_is_exactly_once(
    spark, tmp_path, landed
):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    tbl = wh.table("packed")
    stream_pack_sequences(
        spark, landed, tbl, str(tmp_path / "ckpt"), chunk_tokens=32,
        max_files_per_trigger=1,
    )

    got = tbl.read().orderBy("doc_id").toPandas()
    # multiple microbatches really ran (one per landed file)
    assert len(tbl.applied_stream_batch_ids()) == 3

    # pandas oracle: union sorted by (ts, doc_id), zero-token docs dropped
    import pandas as pd

    rows = [r for wave in _doc_rows() for r in wave]
    exp = pd.DataFrame(rows, columns=["doc_id", "source", "text", "ts"])
    exp["n_tokens"] = exp["text"].str.strip().str.split().map(len)
    exp = exp[exp["n_tokens"] > 0].sort_values(["ts", "doc_id"])
    exp["start_off"] = exp["n_tokens"].cumsum() - exp["n_tokens"]
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["n_tokens"].tolist() == exp["n_tokens"].tolist()
    assert got["start_off"].tolist() == exp["start_off"].tolist()
    ends = exp["start_off"] + exp["n_tokens"]
    assert got["first_chunk"].tolist() == (exp["start_off"] // 32).tolist()
    assert got["last_chunk"].tolist() == ((ends - 1) // 32).tolist()

    # replay the whole arrival history through a FRESH checkpoint: every
    # batch id is already marked on the table, nothing double-appends
    stream_pack_sequences(
        spark, landed, tbl, str(tmp_path / "ckpt2"), chunk_tokens=32,
        max_files_per_trigger=1,
    )
    assert tbl.read().count() == len(got)
    again = tbl.read().orderBy("doc_id").toPandas()
    assert again["start_off"].tolist() == got["start_off"].tolist()


def test_stream_mixture_continues_source_seq(spark, tmp_path, landed):
    from omop_concept_automapper_spark.operators.packing import (
        mixture_interleave,
    )

    weights = {"web": 5, "wiki": 2, "code": 1}
    wh = Warehouse(spark, str(tmp_path / "wh"))
    tbl = wh.table("schedule")
    stream_mixture_interleave(
        spark, landed, tbl, str(tmp_path / "ckpt"), weights,
        max_files_per_trigger=1,
    )
    got = tbl.read().orderBy("doc_id").toPandas()

    # batch twin over the union (doc_id order == ts order by construction)
    rows = [r for wave in _doc_rows() for r in wave]
    union = spark.createDataFrame(rows, DOCS_STREAM_SCHEMA)
    want = (
        mixture_interleave(union, weights).orderBy("doc_id").toPandas()
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["source_seq"].tolist() == want["source_seq"].tolist()
    assert got["interleave_key"].tolist() == want["interleave_key"].tolist()
    assert "junk" not in set(got["source"])

    # replay with fresh checkpoint: exactly-once via table markers
    stream_mixture_interleave(
        spark, landed, tbl, str(tmp_path / "ckpt2"), weights,
        max_files_per_trigger=1,
    )
    assert tbl.read().count() == len(got)


def _pandas_pack_oracle(rows):
    import pandas as pd

    exp = pd.DataFrame(rows, columns=["doc_id", "source", "text", "ts"])
    exp["n_tokens"] = exp["text"].str.strip().str.split().map(len)
    exp = exp[exp["n_tokens"] > 0].sort_values(["ts", "doc_id"])
    exp["start_off"] = exp["n_tokens"].cumsum() - exp["n_tokens"]
    return exp


def test_pack_watermark_survives_maintenance(spark, tmp_path, landed):
    """Compact + expire used to fold forward only stream-batch markers,
    losing the tokens_through watermark — the next batch then restarted
    offsets at 0 over committed history (silent corruption).  Run the fold
    with manifest bounding after EVERY batch, then a caller-scheduled
    compact+expire(keep_last=1), land a fourth wave, drain again: offsets
    must continue exactly, replay must stay exactly-once."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    tbl = wh.table("packed")
    stream_pack_sequences(
        spark, landed, tbl, str(tmp_path / "ckpt"), chunk_tokens=32,
        max_files_per_trigger=1, keep_manifests=1,
    )
    hist = tbl.history()
    # per-batch expire really bounded the manifest history without
    # touching data or the replay guard
    assert len(hist) == 1
    assert len(tbl.applied_stream_batch_ids()) == 3

    # caller-scheduled data compaction: the harshest maintenance cycle
    tbl.compact()
    tbl.expire_snapshots(keep_last=1)

    wave4 = _doc_rows(n_waves=1, start=120)[0]
    spark.createDataFrame(wave4, DOCS_STREAM_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(landed)
    stream_pack_sequences(
        spark, landed, tbl, str(tmp_path / "ckpt"), chunk_tokens=32,
        max_files_per_trigger=1, keep_manifests=1,
    )

    got = tbl.read().orderBy("doc_id").toPandas()
    rows = [r for wave in _doc_rows() for r in wave] + wave4
    exp = _pandas_pack_oracle(rows)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["start_off"].tolist() == exp["start_off"].tolist()

    # replay the full history through a fresh checkpoint: nothing doubles
    stream_pack_sequences(
        spark, landed, tbl, str(tmp_path / "ckpt2"), chunk_tokens=32,
        max_files_per_trigger=1, keep_manifests=1,
    )
    assert tbl.read().count() == len(got)


def test_mixture_watermark_survives_maintenance(spark, tmp_path, landed):
    """Same maintenance hazard for the per-source sequence map: after
    per-batch expire plus a caller compact+expire, a fourth wave must
    continue each source's numbering, matching the batch twin over the
    union."""
    from omop_concept_automapper_spark.operators.packing import (
        mixture_interleave,
    )

    weights = {"web": 5, "wiki": 2, "code": 1}
    wh = Warehouse(spark, str(tmp_path / "wh"))
    tbl = wh.table("schedule")
    stream_mixture_interleave(
        spark, landed, tbl, str(tmp_path / "ckpt"), weights,
        max_files_per_trigger=1, keep_manifests=1,
    )
    assert len(tbl.history()) == 1
    tbl.compact()
    tbl.expire_snapshots(keep_last=1)

    wave4 = _doc_rows(n_waves=1, start=120)[0]
    spark.createDataFrame(wave4, DOCS_STREAM_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(landed)
    stream_mixture_interleave(
        spark, landed, tbl, str(tmp_path / "ckpt"), weights,
        max_files_per_trigger=1, keep_manifests=1,
    )

    got = tbl.read().orderBy("doc_id").toPandas()
    rows = [r for wave in _doc_rows() for r in wave] + wave4
    union = spark.createDataFrame(rows, DOCS_STREAM_SCHEMA)
    want = mixture_interleave(union, weights).orderBy("doc_id").toPandas()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["source_seq"].tolist() == want["source_seq"].tolist()
    assert got["interleave_key"].tolist() == want["interleave_key"].tolist()


def test_stream_mixture_rejects_bad_weights(spark, tmp_path, landed):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    with pytest.raises(ValueError):
        stream_mixture_interleave(
            spark, landed, wh.table("s"), str(tmp_path / "c"), {"web": -1}
        )
