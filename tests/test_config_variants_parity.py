"""Parity under non-default configs: vocab domain filter (P3) and a custom
confidence threshold (P5) — both must track the sequential oracle exactly."""

from __future__ import annotations

from omop_concept_automapper_spark.catalog import Warehouse
from omop_concept_automapper_spark.fixtures.transcripts import transcripts_dataframe
from omop_concept_automapper_spark.fixtures.vocabulary import (
    build_lexicon,
    vocab_dataframes,
)
from omop_concept_automapper_spark.plans.oracle import oracle_link
from omop_concept_automapper_spark.plans.runner import Pipeline, PipelineConfig

N_CONV = 50


def _edges(out):
    return {
        (r["mention_text"], r["pred"], int(r["obj"]), int(r["confidence"]))
        for r in out["edges"].collect()
    }


def _golden_edges(g):
    return {
        (e["mention_text"], e["pred"], int(e["obj"]), int(e["confidence"]))
        for e in g["edges"]
    }


def test_vocab_domain_filter_parity(spark, tmp_path):
    """P3: only Condition concepts are embedded; everything else must have
    no in-index target."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    cfg = PipelineConfig(domain_filter="Condition")
    out = Pipeline(spark, wh, cfg).run(
        transcripts_dataframe(spark, n_conversations=N_CONV),
        *vocab_dataframes(spark),
        build_lexicon(),
    )
    golden = oracle_link(n_conversations=N_CONV, domain_filter="Condition")
    got, want = _edges(out), _golden_edges(golden)
    assert want and got == want
    concept, _, _ = vocab_dataframes(spark)
    domains = {r["concept_id"]: r["domain_id"] for r in concept.collect()}
    assert all(domains[obj] == "Condition" for (_m, _p, obj, _c) in got)


def test_custom_threshold_parity(spark, tmp_path):
    """P5: threshold 10 accepts only perfect-confidence mappings."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    out = Pipeline(spark, wh, PipelineConfig(confidence_threshold=10)).run(
        transcripts_dataframe(spark, n_conversations=N_CONV),
        *vocab_dataframes(spark),
        build_lexicon(),
    )
    golden = oracle_link(n_conversations=N_CONV, threshold=10)
    got, want = _edges(out), _golden_edges(golden)
    assert want and got == want
    assert all(conf == 10 for (_m, _p, _o, conf) in got)
    # stricter threshold accepts a strict subset of the default run
    golden8 = oracle_link(n_conversations=N_CONV, threshold=8)
    assert want < _golden_edges(golden8)
