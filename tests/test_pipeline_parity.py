"""End-to-end golden parity: the distributed pipeline's accepted triples
must match the sequential reference-algorithm oracle with P/R >= 0.95
(BASELINE.json) — in practice exactly, since both sides share deterministic
model stand-ins."""

from __future__ import annotations

import pytest

from omop_concept_automapper_spark.catalog import Warehouse
from omop_concept_automapper_spark.fixtures.transcripts import transcripts_dataframe
from omop_concept_automapper_spark.fixtures.vocabulary import (
    build_lexicon,
    vocab_dataframes,
)
from omop_concept_automapper_spark.plans.oracle import oracle_link
from omop_concept_automapper_spark.plans.runner import Pipeline, PipelineConfig

N_CONV = 120


@pytest.fixture(scope="module")
def pipeline_outputs(spark, tmp_path_factory):
    wh = Warehouse(spark, str(tmp_path_factory.mktemp("warehouse")))
    transcripts = transcripts_dataframe(spark, n_conversations=N_CONV)
    concept, rel, anc = vocab_dataframes(spark)
    lexicon = build_lexicon()
    pipe = Pipeline(spark, wh, PipelineConfig())
    out = pipe.run(transcripts, concept, rel, anc, lexicon)
    return out, wh


@pytest.fixture(scope="module")
def golden():
    return oracle_link(n_conversations=N_CONV)


def _edge_key(e):
    return (e["mention_text"], e["pred"], int(e["obj"]), int(e["confidence"]))


def test_precision_recall_vs_golden(pipeline_outputs, golden):
    out, _ = pipeline_outputs
    got = {
        (r["mention_text"], r["pred"], int(r["obj"]), int(r["confidence"]))
        for r in out["edges"].collect()
    }
    want = {_edge_key(e) for e in golden["edges"]}
    assert want, "golden edge set must be non-empty"
    tp = len(got & want)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(want)
    assert precision >= 0.95, f"precision {precision} (got {len(got)}, tp {tp})"
    assert recall >= 0.95, f"recall {recall} (want {len(want)}, tp {tp})"
    # with shared deterministic models parity should be exact
    assert got == want


def test_mapping_methods_and_preds(pipeline_outputs, golden):
    out, _ = pipeline_outputs
    rows = out["edges"].collect()
    preds = {r["pred"] for r in rows}
    assert "maps-to" in preds
    assert "maps-to-value" in preds  # drug + ATC7 path exercised
    methods = {r["mapping_method"] for r in rows}
    assert methods == {
        e["mapping_method"] for e in golden["edges"]
    }


def test_rejections_match_oracle(pipeline_outputs, golden):
    out, _ = pipeline_outputs
    links = {
        r["mention_text"]: r["confidence"] for r in out["links"].collect()
    }
    for r in golden["results"]:
        if r.get("status") == "rejected":
            assert links[r["mention_text"]] == r["confidence"]
            assert links[r["mention_text"]] < 8


def test_canonical_components_match_oracle(pipeline_outputs, golden):
    out, _ = pipeline_outputs
    nodes = out["nodes"].collect()
    mention_rows = [n for n in nodes if n["node_type"] == "mention_entity"]
    by_canonical: dict[str, set[str]] = {}
    for n in mention_rows:
        by_canonical.setdefault(n["canonical_id"], set()).add(n["label"])
    got_groups = {frozenset(v) for v in by_canonical.values()}
    want_groups = {
        frozenset(v) for v in golden["components"].values()
    }
    assert got_groups == want_groups
    # concept nodes are their own canonical
    for n in nodes:
        if n["node_type"] == "concept":
            assert n["canonical_id"] == n["node_id"]


def test_mention_freq_matches_oracle(pipeline_outputs, golden):
    out, _ = pipeline_outputs
    got = {r["mention_text"]: r["freq"] for r in out["mentions"].collect()}
    assert got == golden["freq"]


def test_parity_holds_for_alternate_seed(spark, tmp_path):
    """Exactness is not a seed-42 artifact: regenerate every fixture with a
    different seed and require the same exact pipeline/oracle agreement."""
    from omop_concept_automapper_spark.fixtures.transcripts import (
        transcripts_dataframe,
    )
    from omop_concept_automapper_spark.fixtures.vocabulary import (
        build_lexicon,
        vocab_dataframes,
    )
    from omop_concept_automapper_spark.plans.runner import Pipeline

    seed, n_conv = 7, 50
    wh = Warehouse(spark, str(tmp_path / "wh7"))
    out = Pipeline(spark, wh, PipelineConfig()).run(
        transcripts_dataframe(spark, n_conversations=n_conv, seed=seed),
        *vocab_dataframes(spark, seed=seed),
        build_lexicon(seed=seed),
    )
    golden7 = oracle_link(seed=seed, n_conversations=n_conv)
    got = {
        (r["mention_text"], r["pred"], int(r["obj"]), int(r["confidence"]))
        for r in out["edges"].collect()
    }
    want = {_edge_key(e) for e in golden7["edges"]}
    assert want and got == want


def test_vocab_embeddings_excludes_nonstandard(pipeline_outputs, golden):
    out, _ = pipeline_outputs
    rows = out["vocab_embeddings"].collect()
    assert len(rows) == golden["n_standard"]
    names = {r["concept_name"] for r in rows}
    assert not any("non standard" in n for n in names)
    assert not any("box" in n or "marketed" in n for n in names)


def test_star_canonicalization_equals_general_cc(pipeline_outputs, spark):
    """The star-graph canonicalization fast path (one groupBy + one join;
    taken whenever every mention maps to a single concept, which the links
    table guarantees by construction) must be BITWISE identical to the
    general iterative-CC path — components, canonical ids, and stored
    component labels included.  A synthetic multi-mapping input must fall
    back to CC and still agree with it."""
    from pyspark.sql import functions as F

    from omop_concept_automapper_spark.plans.graph import (
        _build_nodes_cc,
        _build_nodes_star,
        accepted_mappings,
        build_nodes,
    )

    _, wh = pipeline_outputs
    acc = accepted_mappings(wh.table("links").read()).select(
        "mention_id", "mention_id2", "mention_text", "concept_id"
    )

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(_build_nodes_star(acc)) == rows(_build_nodes_cc(acc))
    # degree-1 holds -> the dispatcher takes the star path (same rows)
    assert rows(build_nodes(acc)) == rows(_build_nodes_cc(acc))

    # a mention mapped to TWO concepts: star precondition broken ->
    # build_nodes must route through CC and match it (the forked mention
    # fuses two concept stars into one component)
    forked = acc.unionByName(
        acc.limit(1).withColumn("concept_id", F.col("concept_id") + 1)
    )
    assert rows(build_nodes(forked)) == rows(_build_nodes_cc(forked))
