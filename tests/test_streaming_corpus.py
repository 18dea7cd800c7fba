"""Streaming near-dup keeper fold + end-to-end streaming corpus assembly
(streaming/corpus.py): the clusters state must equal batch dedup_clusters
over the union INCLUDING retroactive keeper demotion when a later batch
bridges two previously-distinct clusters; the sealed corpus must equal
batch assemble_corpus under arbitrarily shuffled arrival; folds must be
replay-idempotent and survive table maintenance."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from omop_concept_automapper_spark.catalog import Warehouse
from omop_concept_automapper_spark.operators.dedup import (
    dedup_clusters,
    lsh_candidate_pairs,
    minhash_signatures,
)
from omop_concept_automapper_spark.plans.corpus import assemble_corpus
from omop_concept_automapper_spark.streaming.corpus import (
    seal_corpus,
    stream_assemble_corpus,
    stream_corpus_ingest,
)
from omop_concept_automapper_spark.streaming.packing import DOCS_STREAM_SCHEMA

T0 = datetime.datetime(2026, 1, 1)
WEIGHTS = {"web": 5, "wiki": 2, "code": 1}

# Two unrelated base texts and their concatenation: C shares every shingle
# of A and of B, so for a deterministic seed some LSH band of C collides
# with A and some other band with B while A and B themselves never collide
# — the premise is asserted, not assumed, in _assert_bridge_premise.
_A_TEXT = " ".join(f"alpha0k{i} beta0k{i} gamma0k{i}" for i in range(8))
_B_TEXT = " ".join(f"delta0q{i} epsil0q{i} zeta0q{i}" for i in range(8))
_C_TEXT = _A_TEXT + " " + _B_TEXT


def _waves():
    """Three arrival waves, doc order inside each wave SHUFFLED (not
    doc_id order), with: an exact cross-batch duplicate (doc 203 of 101),
    an exact within-batch duplicate (205 of 204), a junk-source keeper
    shadowing an in-spec dup (301 junk < 302 web, same text), and the
    bridge chain A(100, wave1) ~ C(300, wave3) ~ B(200, wave2)."""

    def row(did, src, text):
        return (did, src, text, T0 + datetime.timedelta(seconds=did))

    uniq = lambda i: " ".join(f"u{i}w{j} v{i}x{j}" for j in range(6))
    w1 = [
        row(104, "code", uniq(104)),
        row(100, "web", _A_TEXT),
        row(101, "wiki", uniq(101)),
        row(103, "junk", uniq(103)),
    ]
    w2 = [
        row(203, "web", uniq(101)),   # exact dup of wave-1 doc 101
        row(200, "wiki", _B_TEXT),
        row(205, "web", uniq(204)),   # exact dup, same batch as its keeper
        row(204, "code", uniq(204)),
        row(302, "web", uniq(301)),
    ]
    w3 = [
        row(300, "web", _C_TEXT),     # bridges 100's and 200's clusters
        row(301, "junk", uniq(301)),  # junk keeper (301 < 302) of 302
        row(303, "wiki", uniq(303)),
    ]
    return [w1, w2, w3]


def _union_df(spark, waves):
    rows = [r for w in waves for r in w]
    return spark.createDataFrame(rows, DOCS_STREAM_SCHEMA)


def _assert_bridge_premise(spark, waves):
    """The fixture must actually produce a cross-batch bridge: LSH pairs
    (100, 300) and (200, 300) present, (100, 200) absent."""
    pairs = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in lsh_candidate_pairs(
            minhash_signatures(_union_df(spark, waves))
        ).collect()
    }
    assert (100, 300) in pairs, "fixture lost the A~C collision"
    assert (200, 300) in pairs, "fixture lost the B~C collision"
    assert (100, 200) not in pairs, "A and B must not collide directly"


@pytest.fixture()
def landed(spark, tmp_path):
    landing = str(tmp_path / "landing")
    for rows in _waves():
        spark.createDataFrame(rows, DOCS_STREAM_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(landing)
    return landing


def _clusters_pdf(tbl):
    return (
        tbl.read()
        .orderBy("doc_id")
        .select("doc_id", "cluster_id", "is_keeper")
        .toPandas()
    )


def test_stream_clusters_equal_batch_with_bridge_merge(
    spark, tmp_path, landed
):
    _assert_bridge_premise(spark, _waves())
    wh = Warehouse(spark, str(tmp_path / "wh"))
    stream_corpus_ingest(
        spark, landed, wh, str(tmp_path / "ckpt"), min_quality_bp=0,
        max_files_per_trigger=1,
    )
    clusters = wh.table("corpus_clusters")
    assert len(clusters.applied_stream_batch_ids()) == 3

    got = _clusters_pdf(clusters)
    want = (
        dedup_clusters(_union_df(spark, _waves()))
        .orderBy("doc_id")
        .toPandas()
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["cluster_id"].tolist() == want["cluster_id"].tolist()
    assert got["is_keeper"].tolist() == want["is_keeper"].tolist()

    # the bridge really demoted doc 200 retroactively: it was its
    # cluster's keeper when it arrived (wave 2), and the wave-3 bridge
    # doc merged it under doc 100's label
    by_doc = dict(zip(got["doc_id"], zip(got["cluster_id"], got["is_keeper"])))
    assert by_doc[200] == (100, 0)
    assert by_doc[300] == (100, 0)
    assert by_doc[100] == (100, 1)
    # cross-batch exact dup dropped, junk-source keeper shadows 302
    assert by_doc[203] == (101, 0)
    assert by_doc[302] == (301, 0)

    # replay the whole history through a FRESH checkpoint: exactly-once
    stream_corpus_ingest(
        spark, landed, wh, str(tmp_path / "ckpt2"), min_quality_bp=0,
        max_files_per_trigger=1,
    )
    again = _clusters_pdf(clusters)
    assert again.equals(got)
    # bands table holds exactly n_bands rows per doc, not doubled by replay
    n_docs = minhash_signatures(_union_df(spark, _waves())).count()
    assert wh.table("corpus_bands").read().count() == n_docs * 4


def test_stream_assemble_corpus_equals_batch_shuffled_arrival(
    spark, tmp_path, landed
):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    sealed = stream_assemble_corpus(
        spark, landed, wh, str(tmp_path / "ckpt"), weights=WEIGHTS,
        chunk_tokens=32, min_quality_bp=0, max_files_per_trigger=1,
    )
    got = sealed.orderBy("doc_id").toPandas()
    want = (
        assemble_corpus(
            _union_df(spark, _waves()), weights=WEIGHTS, chunk_tokens=32,
            min_quality_bp=0,
        )
        .orderBy("doc_id")
        .toPandas()
    )
    for col in (
        "doc_id", "source", "n_tokens", "interleave_key", "start_off",
        "first_chunk", "last_chunk",
    ):
        assert got[col].tolist() == want[col].tolist(), col
    # the dropped rows are exactly the non-keepers + junk sources
    assert 203 not in set(got["doc_id"])
    assert 200 not in set(got["doc_id"])  # bridged away retroactively
    assert 103 not in set(got["doc_id"])  # junk source, mixture spec


def test_stream_corpus_survives_maintenance(spark, tmp_path, landed):
    """Compact + expire on all three state tables between waves must not
    lose markers or keeper state; a fourth wave continues exactly."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    stream_corpus_ingest(
        spark, landed, wh, str(tmp_path / "ckpt"), min_quality_bp=0,
        max_files_per_trigger=1, keep_manifests=1,
    )
    for name in ("corpus_bands", "corpus_docs", "corpus_clusters"):
        tbl = wh.table(name)
        assert len(tbl.history()) == 1  # per-batch expire bounded manifests
        tbl.compact()
        tbl.expire_snapshots(keep_last=1)

    def row(did, src, text):
        return (did, src, text, T0 + datetime.timedelta(seconds=did))

    # wave 4: an exact dup of doc 303 (must be dropped) + a fresh doc
    wave4 = [
        row(400, "web", " ".join(f"u303w{j} v303x{j}" for j in range(6))),
        row(401, "code", "brand new text tokens here"),
    ]
    spark.createDataFrame(wave4, DOCS_STREAM_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(landed)
    stream_corpus_ingest(
        spark, landed, wh, str(tmp_path / "ckpt"), min_quality_bp=0,
        max_files_per_trigger=1, keep_manifests=1,
    )

    got = seal_corpus(wh, weights=WEIGHTS, chunk_tokens=32).orderBy(
        "doc_id"
    ).toPandas()
    want = (
        assemble_corpus(
            _union_df(spark, _waves() + [wave4]), weights=WEIGHTS,
            chunk_tokens=32, min_quality_bp=0,
        )
        .orderBy("doc_id")
        .toPandas()
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["start_off"].tolist() == want["start_off"].tolist()
    assert 400 not in set(got["doc_id"])
    assert 401 in set(got["doc_id"])

    # replay everything through a fresh checkpoint: nothing doubles
    n_docs = wh.table("corpus_docs").read().count()
    stream_corpus_ingest(
        spark, landed, wh, str(tmp_path / "ckpt2"), min_quality_bp=0,
        max_files_per_trigger=1, keep_manifests=1,
    )
    assert wh.table("corpus_docs").read().count() == n_docs
