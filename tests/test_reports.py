"""Reporting-query tests over pipeline outputs (J2/J8/A3/A5/A6/O3 analogs)."""

from __future__ import annotations

import pytest

from omop_concept_automapper_spark.catalog import Warehouse
from omop_concept_automapper_spark.fixtures.transcripts import transcripts_dataframe
from omop_concept_automapper_spark.fixtures.vocabulary import (
    build_lexicon,
    vocab_dataframes,
)
from omop_concept_automapper_spark.plans.reports import (
    atc7_summary,
    distinct_mapping_methods,
    mapped_review,
    mapping_statistics,
    recent_mappings,
)
from omop_concept_automapper_spark.plans.runner import Pipeline, PipelineConfig
from omop_concept_automapper_spark.plans.vocab_prep import derive_atc7


@pytest.fixture(scope="module")
def out(spark, tmp_path_factory):
    wh = Warehouse(spark, str(tmp_path_factory.mktemp("wh_reports")))
    pipe = Pipeline(spark, wh, PipelineConfig())
    return pipe.run(
        transcripts_dataframe(spark, n_conversations=40),
        *vocab_dataframes(spark),
        build_lexicon(),
    )


def test_mapping_statistics(out):
    rows = {r["mapping_method"]: r for r in mapping_statistics(out["links"]).collect()}
    assert set(rows) == {"auto_standard", "auto_drug"}
    for r in rows.values():
        assert 1 <= r["min_confidence"] <= r["max_confidence"] <= 10
        assert r["min_confidence"] <= r["avg_confidence"] <= r["max_confidence"]


def test_mapped_review_join(spark, out):
    concept, _, _ = vocab_dataframes(spark)
    review = mapped_review(out["edges"], out["mentions"], concept)
    rows = review.collect()
    assert len(rows) == out["edges"].count()
    assert all(r["concept_name"] and r["freq"] >= 1 for r in rows)


def test_recent_and_distinct(out):
    top = recent_mappings(out["edges"], n=5).collect()
    assert len(top) == 5
    methods = [r["mapping_method"] for r in distinct_mapping_methods(out["links"]).collect()]
    assert methods == sorted(methods)


def test_embedding_status(spark, out):
    from omop_concept_automapper_spark.plans.reports import embedding_status
    from omop_concept_automapper_spark.plans.vocab_prep import standard_embeddable

    concept, _, _ = vocab_dataframes(spark)
    embeddable = standard_embeddable(concept)
    full = embedding_status(embeddable, out["vocab_embeddings"])
    assert full["pending"] == 0 and full["pct_complete"] == 100.0
    partial = embedding_status(
        embeddable, out["vocab_embeddings"].limit(50)
    )
    assert partial["embedded"] == 50
    assert partial["pending"] == partial["total"] - 50


def test_atc7_summary(spark):
    concept, rel, anc = vocab_dataframes(spark)
    row = atc7_summary(derive_atc7(concept, rel, anc)).collect()[0]
    assert row["n_concepts"] > 0
    assert row["avg_codes"] >= 1.0
