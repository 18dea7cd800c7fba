"""Interactive search tests (lifecycle 3.3): filter semantics (MatchValue /
MatchAny / array-overlap), top-k shape, pipeline agreement."""

from __future__ import annotations

import pytest

from omop_concept_automapper_spark.fixtures.vocabulary import vocab_dataframes
from omop_concept_automapper_spark.operators.knn import build_vocab_index
from omop_concept_automapper_spark.plans.search import search_similar_concepts
from omop_concept_automapper_spark.plans.vocab_prep import build_vocab_embeddings


@pytest.fixture(scope="module")
def index(spark):
    vocab_pdf = build_vocab_embeddings(*vocab_dataframes(spark)).toPandas()
    return build_vocab_index(vocab_pdf)


def test_exact_name_ranks_first(index):
    res = search_similar_concepts(index, "atrial fibrillation", k=5)
    assert res[0]["concept_name"] == "atrial fibrillation"
    assert res[0]["score"] == pytest.approx(1.0, abs=1e-5)
    assert len(res) == 5


def test_domain_matchany(index):
    res = search_similar_concepts(
        index, "metformin", k=20, domains=["Condition", "Measurement"]
    )
    assert res and all(r["domain_id"] in {"Condition", "Measurement"} for r in res)


def test_vocabulary_matchvalue(index):
    res = search_similar_concepts(index, "metformin", k=20, vocabulary_id="RxNorm")
    assert res and all(r["vocabulary_id"] == "RxNorm" for r in res)


def test_atc7_array_overlap(index):
    res = search_similar_concepts(
        index, "metformin tablet", k=50, atc7_codes=["A10BA02"]
    )
    assert res
    assert all("A10BA02" in r["atc7_codes"] for r in res)
    assert all("metformin" in r["concept_name"] for r in res)


def test_zero_hits_empty_list(index):
    res = search_similar_concepts(index, "anything", atc7_codes=["Z99ZZ99"])
    assert res == []


def test_unknown_filter_field_raises(index):
    from omop_concept_automapper_spark.plans.search import _filter_mask

    with pytest.raises(KeyError):
        _filter_mask(index, {"nope": "x"})
