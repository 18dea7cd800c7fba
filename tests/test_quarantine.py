"""Per-row failure quarantine: the reference swallows per-concept exceptions
and continues (auto_mapper.py:207-211); the engine's analog routes failed
rows into the quarantine table with the error, never failing the job."""

from __future__ import annotations

import pandas as pd

from omop_concept_automapper_spark.functions.embedder import embed_texts
from omop_concept_automapper_spark.operators import knn as knn_mod
from omop_concept_automapper_spark.operators.knn import build_vocab_index, link_batch


def _index():
    names = ["acute bronchitis", "chronic sinusitis"]
    return build_vocab_index(
        pd.DataFrame(
            {
                "concept_id": [1, 2],
                "concept_name": names,
                "domain_id": ["Condition", "Condition"],
                "atc7_codes": [[], []],
                "vector": list(embed_texts(names)),
            }
        )
    )


def test_row_error_lands_in_quarantine_not_job_failure(monkeypatch):
    real = knn_mod.rerank_scores

    def boom(text, names):
        if text == "poison pill":
            raise RuntimeError("model exploded")
        return real(text, names)

    monkeypatch.setattr(knn_mod, "rerank_scores", boom)
    pdf = pd.DataFrame(
        {
            "mention_id": [1, 2],
            "mention_text": ["acute bronchitis", "poison pill"],
            "is_drug": [False, False],
            "atc7": ["", ""],
        }
    )
    out = link_batch(pdf, _index())
    ok = out[out["error"].isnull()]
    bad = out[out["error"].notnull()]
    assert len(ok) == 1 and ok.iloc[0]["concept_id"] == 1
    assert len(bad) == 1
    assert "model exploded" in bad.iloc[0]["error"]
    assert bad.iloc[0]["confidence"] == 0  # never passes the accept gate
