"""Corpus-assembly operator tests: distributed running total vs a pandas
cumsum, sequence-packing invariants, mixture-interleave proportionality,
and the no-single-task-window plan gate."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from omop_concept_automapper_spark.operators.packing import (
    global_running_total,
    mixture_interleave,
    pack_sequences,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_global_running_total_matches_pandas(spark):
    df = spark.range(5000).select(
        F.col("id").alias("k"),
        (F.pmod(F.xxhash64("id"), F.lit(97)) + 1).alias("v"),
    )
    got = (
        global_running_total(df, "v", ["k"])
        .orderBy("k")
        .toPandas()
    )
    assert got["_cum"].tolist() == got["v"].cumsum().tolist()


def test_global_running_total_grouped_matches_pandas(spark):
    df = spark.range(4000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("g"), F.pmod("id", F.lit(3)).cast("string")).alias("g"),
        (F.pmod(F.xxhash64("id"), F.lit(11)) + 1).alias("v"),
    )
    got = (
        global_running_total(df, "v", ["k"], group_cols=["g"])
        .orderBy("k")
        .toPandas()
    )
    want = got.groupby("g")["v"].cumsum()
    assert got["_cum"].tolist() == want.tolist()


def test_global_running_total_spans_partitions(spark):
    """The stitched total must be correct across EVERY partition boundary
    (the whole point of the offsets pass)."""
    df = spark.range(3000).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    # pin the range-exchange width so AQE can't coalesce the tiny fixture
    # into one partition and dodge the stitching under test
    out = global_running_total(df, "v", ["k"], num_partitions=6)
    got = out.orderBy("k").select("_cum").toPandas()["_cum"].tolist()
    assert got == list(range(1, 3001))
    # the staged layout really had several partitions' worth of offsets
    staged = (
        df.repartitionByRange(6, "k")
        .withColumn("_pid", F.spark_partition_id())
        .select("_pid").distinct().count()
    )
    assert staged > 1


def test_pack_sequences_invariants(spark, docs):
    packed = (
        pack_sequences(docs, chunk_tokens=256).orderBy("doc_id").toPandas()
    )
    assert len(packed) > 0
    # the stream is contiguous: each doc starts where the previous ended
    ends = packed["start_off"] + packed["n_tokens"]
    assert packed["start_off"].iloc[0] == 0
    assert (packed["start_off"].iloc[1:].to_numpy() ==
            ends.iloc[:-1].to_numpy()).all()
    # chunk arithmetic
    assert (packed["first_chunk"] == packed["start_off"] // 256).all()
    assert (packed["last_chunk"] == (ends - 1) // 256).all()
    assert (packed["n_tokens"] > 0).all()


def test_pack_sequences_plan_has_no_single_partition_window(spark, docs):
    """The naive global cumsum is an Exchange SinglePartition feeding a
    Window — the one-task shape this operator exists to avoid."""
    plan = pack_sequences(docs, chunk_tokens=256)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_chunk_manifest_covers_stream_exactly(spark, docs):
    """Every chunk except the last must receive exactly chunk_tokens
    tokens; each doc's slices are in-bounds, contiguous, and concatenate
    to the whole doc — the writer-side law of packing."""
    from omop_concept_automapper_spark.operators.packing import (
        chunk_manifest,
    )

    L = 64
    packed = pack_sequences(docs, chunk_tokens=L)
    m = chunk_manifest(packed, L).toPandas()
    assert len(m) > 0
    assert ((m["tok_from"] >= 0) & (m["tok_to"] > m["tok_from"])).all()

    # chunk law: all chunks full except the last
    per_chunk = m.groupby("chunk_id").apply(
        lambda g: (g["tok_to"] - g["tok_from"]).sum(), include_groups=False
    )
    assert (per_chunk.iloc[:-1] == L).all()
    assert 0 < per_chunk.iloc[-1] <= L

    # doc law: slices per doc are contiguous from 0 to n_tokens
    p = packed.toPandas().set_index("doc_id")
    for doc_id, g in m.sort_values(["doc_id", "chunk_id"]).groupby("doc_id"):
        assert g["tok_from"].iloc[0] == 0
        assert g["tok_to"].iloc[-1] == p.loc[doc_id, "n_tokens"]
        assert (g["tok_from"].iloc[1:].to_numpy() ==
                g["tok_to"].iloc[:-1].to_numpy()).all()


def test_materialize_chunks_reassembles_the_stream(spark, docs):
    """The assembled chunks ARE the concatenated doc-order token stream
    cut every chunk_tokens: all chunks full except the last, and the
    concatenation of chunk token arrays equals the concatenation of every
    surviving doc's tokens."""
    from omop_concept_automapper_spark.operators.packing import (
        materialize_chunks,
    )

    L = 64
    got = (
        materialize_chunks(docs, chunk_tokens=L)
        .orderBy("chunk_id")
        .toPandas()
    )
    assert len(got) > 1
    assert (got["n_tokens"].iloc[:-1] == L).all()
    assert 0 < got["n_tokens"].iloc[-1] <= L
    assert (got["tokens"].map(len) == got["n_tokens"]).all()
    assert got["chunk_id"].tolist() == list(range(len(got)))

    stream = [t for arr in got["tokens"] for t in arr]
    exp = []
    for r in docs.orderBy("doc_id").select("text").collect():
        exp.extend(r["text"].strip().split())
    assert stream == exp


def test_materialize_chunks_plan_shape(spark, docs):
    """Chunk assembly must never collapse to one task, and the chunk
    delivery aggregation must have a map-side partial (partial_collect_
    list) so only grouped pieces cross the chunk_id exchange."""
    from omop_concept_automapper_spark.operators.packing import (
        materialize_chunks,
    )

    plan = (
        materialize_chunks(docs, 256)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan
    assert "partial_collect_list" in plan


def test_mixture_interleave_is_proportional_and_deterministic(spark):
    rows = [(i, ["web", "wiki", "code"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    weights = {"web": 6, "wiki": 3, "code": 1}
    got = (
        mixture_interleave(df, weights)
        .orderBy("interleave_key", "source", "doc_id")
        .toPandas()
    )
    # sources outside the spec never appear; all requested ones do
    assert set(got["source"]) == set(weights)
    # exact key law: k * scale DIV w
    k = got["source_seq"]
    w = got["source"].map(weights)
    assert (got["interleave_key"] == (k * 1_000_000) // w).all()
    # proportionality: inside any schedule prefix long enough to smooth
    # granularity, source shares track weights (each source has 1000 rows,
    # so the head of the schedule is weight-limited, not supply-limited)
    head = got.head(600)
    shares = head.groupby("source").size()
    assert abs(shares["web"] / shares["wiki"] - 2.0) < 0.15
    assert abs(shares["wiki"] / shares["code"] - 3.0) < 0.35


def test_mixture_interleave_rejects_bad_weights(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError):
        mixture_interleave(df, {"a": 0})


def test_global_running_total_multi_group_binding(spark):
    """Offsets schema must follow group_cols order, not DataFrame column
    order — columns here are deliberately laid out (b, a, ...) while the
    call groups by ['a', 'b'] to catch wrong-field binding."""
    df = spark.createDataFrame(
        [(f"b{i % 2}", f"a{i % 3}", i, 1) for i in range(600)],
        "b string, a string, k long, v int",
    )
    got = (
        global_running_total(df, "v", ["k"], group_cols=["a", "b"])
        .orderBy("k")
        .toPandas()
    )
    want = got.groupby(["a", "b"])["v"].cumsum()
    assert got["_cum"].tolist() == want.tolist()


def test_global_running_total_rejects_fractional_values(spark):
    """The driver-side offset fold is exact long arithmetic; fractional
    value columns must be rejected, not silently truncated."""
    df = spark.createDataFrame([(1, 0.5)], "k long, v double")
    with pytest.raises(TypeError):
        global_running_total(df, "v", ["k"])


def test_assemble_corpus_invariants(spark, docs):
    """The composed pipeline (plans/corpus.py): survivors are exactly the
    quality-gated cluster keepers of in-spec sources, and the packed
    stream is contiguous in schedule order."""
    from omop_concept_automapper_spark.plans.corpus import (
        DEFAULT_MIXTURE_WEIGHTS,
        assemble_corpus,
        quality_survivors,
    )
    from omop_concept_automapper_spark.operators.dedup import dedup_clusters

    out = (
        assemble_corpus(docs)
        .orderBy("interleave_key", "source", "doc_id")
        .toPandas()
    )
    assert len(out) > 0
    assert set(out["source"]) <= set(DEFAULT_MIXTURE_WEIGHTS)

    # membership law: exactly the quality survivors that are their own
    # cluster keeper, carry an in-spec source, and have at least one token
    q = quality_survivors(docs, 5000)
    keep = dedup_clusters(q).where(F.col("is_keeper") == 1).select("doc_id")
    want = {
        r["doc_id"]
        for r in q.join(keep, "doc_id")
        .where(F.col("source").isin(*DEFAULT_MIXTURE_WEIGHTS))
        .where(F.trim("text") != "")
        .collect()
    }
    assert set(out["doc_id"]) == want

    # the packed stream is gapless and chunk routing is exact
    ends = out["start_off"] + out["n_tokens"]
    assert out["start_off"].iloc[0] == 0
    assert (out["start_off"].iloc[1:].to_numpy() ==
            ends.iloc[:-1].to_numpy()).all()
    assert (out["first_chunk"] == out["start_off"] // 256).all()
    assert (out["last_chunk"] == (ends - 1) // 256).all()


def test_assemble_corpus_plan_shape(spark, docs):
    """The composition must inherit the primitives' scale shape: no stage
    may collapse to one task (Exchange SinglePartition).

    The eager localCheckpoint inside global_running_total truncates
    lineage to a LogicalRDD, so ONE end-to-end executedPlan cannot see the
    upstream stages — assert the two plan fragments separately: (a) the
    pre-checkpoint range stage feeding the first running total, whose
    lineage covers scan -> quality gate -> keeper join -> tokenize -> range
    exchange, and (b) the post-checkpoint plan of the full composition
    (broadcast joins + pid-keyed windows).  The dedup internals between
    them carry their own plan gates (test_physical_plans / dedup tests)."""
    from omop_concept_automapper_spark.operators.packing import _range_stage
    from omop_concept_automapper_spark.plans.corpus import (
        assemble_corpus,
        kept_docs,
    )

    # kept_docs IS the production stage-1 lineage (assemble_corpus calls
    # it), so this plan can't silently drift from the real pipeline
    ones = kept_docs(docs, 5000).select(
        "source", "doc_id", "n_tokens"
    ).withColumn("_one", F.lit(1).cast("long"))
    staged = _range_stage(ones, ["source", "doc_id"])
    pre = staged._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in pre
    assert "rangepartitioning" in pre.lower()  # the balanced exchange ran

    post = (
        assemble_corpus(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in post


def test_write_corpus_chunks_coverage_law_and_lineage(spark, docs, tmp_path):
    """The corpus chunk sink (r5 verdict ask #7).  Three laws:

    1. chunks table ≡ chunk_manifest slices: per chunk, the table's token
       count equals the manifest's summed span widths, chunk ids match
       exactly, and every chunk holds exactly chunk_tokens tokens except
       the single last one;
    2. stream equality: concatenating the table's chunks in ascending
       chunk_id order reproduces the kept docs' tokens concatenated in
       schedule order (the sink cannot reorder or drop tokens);
    3. the commit records per-partition lineage plus the assembly config.
    """
    from omop_concept_automapper_spark.catalog import Warehouse
    from omop_concept_automapper_spark.operators.packing import chunk_manifest
    from omop_concept_automapper_spark.plans.corpus import (
        assemble_corpus,
        write_corpus_chunks,
    )

    L = 64
    wh = Warehouse(spark, str(tmp_path / "wh"))
    snap, chunks_df = write_corpus_chunks(wh, docs, chunk_tokens=L)
    chunks = sorted(
        (int(r["chunk_id"]), int(r["n_tokens"]), list(r["tokens"]))
        for r in chunks_df.collect()
    )
    assert len(chunks) > 1

    # law 1: ids and sizes match the manifest's slices exactly
    packed = assemble_corpus(docs, chunk_tokens=L)
    man = (
        chunk_manifest(packed, L)
        .groupBy("chunk_id")
        .agg(F.sum(F.col("tok_to") - F.col("tok_from")).alias("w"))
        .collect()
    )
    man_w = {int(r["chunk_id"]): int(r["w"]) for r in man}
    assert {c for c, _, _ in chunks} == set(man_w)
    for cid, n, toks in chunks:
        assert n == man_w[cid] == len(toks)
    last = max(man_w)
    for cid, n, _ in chunks:
        assert n == L or cid == last, (cid, n)

    # law 2: chunk stream == schedule-order token stream
    rows = packed.orderBy("interleave_key", "source", "doc_id").collect()
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.where(F.trim("text") != "").collect()
    }
    want = []
    for r in rows:
        want.extend(texts[r["doc_id"]].strip().split())
    got = [t for _, _, toks in chunks for t in toks]
    assert got == want

    # law 3: lineage + config on the snapshot
    m = snap.metrics
    assert m["chunk_tokens"] == L
    assert m["n_docs_packed"] == len(rows)
    assert "mixture_weights" in m and "min_quality_bp" in m
    assert m["lineage"]["n_files"] >= 1
    assert sum(m["lineage"]["rows_per_partition"].values()) == len(chunks)
