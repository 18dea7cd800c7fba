"""Broadcast cosine top-k retrieval + rerank — the linker's heart (J9/O4/U-RRK).

Reference semantics reproduced (SURVEY.md §2.3 J9, §2.6 O4, §2.9 U-RRK):

* query = embedded mention text; collection = embedded standard concepts
  (always filtered to ``type=standard`` — our index only CONTAINS standard
  embeddable concepts, mirroring the always-on filter,
  reference src/backend/auto_mapper.py:49);
* optional ``domain_id`` filter = Qdrant MatchAny over scalar payload
  (reference src/backend/llms/vector_store.py:141-156);
* optional ``atc7_codes`` filter = MatchAny against an ARRAY payload field,
  i.e. any-overlap semantics (SURVEY.md hard part (b));
* k = 30 for the drug path, 15 otherwise (reference auto_mapper.py:69);
* zero hits after filtering -> no output row (reference auto_mapper.py:76-77);
* rerank = deterministic scorer over candidate names, 0-indexed selection,
  first-candidate/confidence-1 fallback (reference reranker.py:42-58).

Spark-first design: the vocabulary index is a numpy matrix broadcast to
executors; scoring is a blocked matrix multiply inside ``mapInPandas``
(Arrow batches, no per-row Python in the hot loop).  Retrieval and rerank
happen in the SAME task — no extra shuffle between stages.  At 100 TB /
full-OMOP scale the matrix (~4M x 1024 float32 ≈ 16 GB) exceeds a single
broadcast: ``block_rows`` already bounds working memory, and the index dict
is shard-able (score per shard, union partial top-k, re-reduce — exact
semantics preserved; tie-break (-score, concept_id) makes shard merges
order-stable, SURVEY.md hard part (f)).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from omop_concept_automapper_spark.functions.embedder import embed_texts
from omop_concept_automapper_spark.functions.reranker import (
    confidence_from_score,
    rerank_scores,
)

LINK_RESULT_SCHEMA = (
    "mention_id long, mention_text string, is_drug boolean, atc7 string, "
    "concept_id int, concept_name string, score float, confidence int, "
    "k_used int, n_candidates int, mapping_method string, "
    "candidate_ids array<int>, error string"
)

_LINK_COLUMNS = [
    "mention_id", "mention_text", "is_drug", "atc7", "concept_id",
    "concept_name", "score", "confidence", "k_used", "n_candidates",
    "mapping_method", "candidate_ids", "error",
]


def build_vocab_index(vocab_pdf: pd.DataFrame) -> dict:
    """Build the broadcastable index from the vocab_embeddings table
    (columns: concept_id, concept_name, domain_id, atc7_codes, vector).

    Rows are sorted by concept_id so every executor sees the identical
    layout (deterministic tie-breaks).
    """
    pdf = vocab_pdf.sort_values("concept_id").reset_index(drop=True)
    matrix = np.asarray([np.asarray(v, dtype=np.float32) for v in pdf["vector"]])
    # L2-normalize defensively; cosine == dot on unit rows
    norms = np.linalg.norm(matrix, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    matrix = (matrix / norms).astype(np.float32)

    atc7_inverted: dict[str, list[int]] = {}
    for i, codes in enumerate(pdf["atc7_codes"]):
        for code in codes if codes is not None else []:
            atc7_inverted.setdefault(code, []).append(i)

    return {
        "matrix": matrix,
        "concept_id": pdf["concept_id"].to_numpy(np.int64),
        "concept_name": pdf["concept_name"].to_numpy(object),
        "domain_id": pdf["domain_id"].to_numpy(object),
        "atc7_inverted": {k: np.asarray(v) for k, v in atc7_inverted.items()},
    }


def _topk_masked(
    scores: np.ndarray, concept_ids: np.ndarray, k: int
) -> np.ndarray:
    """Exact top-k indices with deterministic (-score, concept_id) order.

    Boundary ties are resolved by selecting ALL rows scoring >= the kth
    score, sorting by (-score, concept_id), then truncating — so the result
    never depends on argpartition's arbitrary tie placement (SURVEY.md hard
    part (f): order-stable shard merges need a pinned tie rule).
    """
    valid = np.flatnonzero(scores > -np.inf)
    if valid.size == 0:
        return valid
    if valid.size > k:
        kth = np.partition(scores[valid], valid.size - k)[valid.size - k]
        part = valid[scores[valid] >= kth]
    else:
        part = valid
    order = np.lexsort((concept_ids[part], -scores[part]))
    return part[order][:k]


def _score_block(q: np.ndarray, matrix: np.ndarray, block_rows: int) -> np.ndarray:
    """Blocked Q @ M.T so executor memory stays bounded at any vocab size."""
    n = matrix.shape[0]
    out = np.empty((q.shape[0], n), dtype=np.float32)
    for start in range(0, n, block_rows):
        end = min(start + block_rows, n)
        out[:, start:end] = q @ matrix[start:end].T
    return out


def link_batch(
    pdf: pd.DataFrame,
    index: dict,
    k_standard: int = 15,
    k_drug: int = 30,
    target_domains: list[str] | None = None,
    block_rows: int = 65536,
) -> pd.DataFrame:
    """Retrieve + rerank one Arrow batch of mentions.

    Expects columns: mention_id, mention_text, is_drug, atc7 ('' if none).
    """
    matrix = index["matrix"]
    concept_ids = index["concept_id"]
    names = index["concept_name"]
    out_rows: list[tuple] = []
    if len(pdf) == 0:
        return pd.DataFrame(columns=_LINK_COLUMNS)

    q = embed_texts(pdf["mention_text"].tolist())
    base_mask = None
    if target_domains:
        base_mask = np.isin(index["domain_id"], np.asarray(target_domains, object))

    scores_all = _score_block(q, matrix, block_rows)
    if base_mask is not None:
        scores_all[:, ~base_mask] = -np.inf

    for row_i, (mention_id, text, is_drug, atc7) in enumerate(
        zip(pdf["mention_id"], pdf["mention_text"], pdf["is_drug"], pdf["atc7"])
    ):
        is_drug = bool(is_drug)
        k = k_drug if is_drug else k_standard
        method = "auto_drug" if is_drug else "auto_standard"
        try:
            row_scores = scores_all[row_i]
            if is_drug and atc7:
                # MatchAny over the atc7_codes ARRAY payload = any-overlap:
                # restrict candidates to concepts carrying this code
                allowed = index["atc7_inverted"].get(atc7)
                restricted = np.full_like(row_scores, -np.inf)
                if allowed is not None and allowed.size:
                    restricted[allowed] = row_scores[allowed]
                    if base_mask is not None:
                        restricted[~base_mask] = -np.inf
                row_scores = restricted
            top = _topk_masked(row_scores, concept_ids, k)
            if top.size == 0:
                continue  # zero hits -> no mapping (auto_mapper.py:76-77)
            cand_names = [str(names[j]) for j in top]
            rr = rerank_scores(str(text), cand_names)
            sel = max(range(len(rr)), key=lambda i: (rr[i], -i))
            confidence = confidence_from_score(rr[sel])
            chosen = top[sel]
            out_rows.append(
                (
                    int(mention_id), str(text), is_drug, str(atc7 or ""),
                    int(concept_ids[chosen]), str(names[chosen]),
                    float(row_scores[chosen]), int(confidence), int(k),
                    int(top.size), method,
                    [int(concept_ids[j]) for j in top], None,
                )
            )
        except Exception as exc:  # per-row quarantine (auto_mapper.py:207-211)
            out_rows.append(
                (
                    int(mention_id), str(text), is_drug, str(atc7 or ""),
                    None, None, None, 0, int(k), 0, method, None,
                    f"{type(exc).__name__}: {exc}",
                )
            )
    return pd.DataFrame(out_rows, columns=_LINK_COLUMNS)


def link_mentions(
    spark: SparkSession,
    mentions: DataFrame,
    vocab_pdf: pd.DataFrame,
    k_standard: int = 15,
    k_drug: int = 30,
    target_domains: list[str] | None = None,
) -> DataFrame:
    """Distributed retrieve+rerank: one ``mapInPandas`` pass over mentions."""
    index_bc = spark.sparkContext.broadcast(build_vocab_index(vocab_pdf))
    domains = list(target_domains) if target_domains else None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        index = index_bc.value
        for pdf in batches:
            yield link_batch(
                pdf, index, k_standard=k_standard, k_drug=k_drug,
                target_domains=domains,
            )

    cols = ["mention_id", "mention_text", "is_drug", "atc7"]
    return mentions.select(*cols).mapInPandas(run, schema=LINK_RESULT_SCHEMA)
