"""Parity oracle: sequential deterministic port of the reference algorithm.

This is the golden-output generator (FIXTURES.md §5): a faithful,
single-threaded re-implementation of ``automap_all``
(reference src/backend/auto_mapper.py:83-225) over the fixture transcripts,
using the SAME deterministic embedder/reranker as the Spark pipeline.  The
pipeline's distributed output must match this oracle's edges with
P/R >= 0.95 (BASELINE.json) — in practice exactly.

Faithfully ported decision points:
* k = 30 drug / 15 standard (auto_mapper.py:69);
* always-on type=standard filter (auto_mapper.py:49) — the index only holds
  standard embeddable concepts;
* domain filter only when target_domains non-empty (auto_mapper.py:40-41);
* ATC7 MatchAny-over-array filter only when codes were extracted
  (auto_mapper.py:46-47, vector_store.py:148-156);
* drug path without ATC7 still uses k=30 + drug method (auto_mapper.py:142-161);
* zero retrieval hits -> no mapping (auto_mapper.py:76-77);
* accept iff confidence >= threshold, default 8 (auto_mapper.py:165-167);
* canonical entity = min mention_id among mentions accepted to the same
  concept (star components, FIXTURES.md §5).
"""

from __future__ import annotations

import re
from functools import lru_cache

import numpy as np

from omop_concept_automapper_spark.fixtures.transcripts import (
    generate_transcript_rows,
)
from omop_concept_automapper_spark.fixtures.vocabulary import (
    build_lexicon,
    build_mini_vocab,
)
from omop_concept_automapper_spark.functions.embedder import embed_texts
from omop_concept_automapper_spark.functions.mentions import (
    compile_lexicon,
    detect_mentions_py,
)
from omop_concept_automapper_spark.functions.reranker import (
    confidence_from_score,
    rerank_scores,
)

_ATC7_RE = re.compile(r"^([A-Z]\d{2}[A-Z]{2}\d{2})")
ATC_RELATIONSHIP_IDS = {"Maps to", "RxNorm has ing", "Mapped from"}


def oracle_atc7(vocab) -> dict[int, list[str]]:
    """Two-path ATC7 derivation (reference utils.py:63-113)."""
    by_id = {c[0]: c for c in vocab.concept_rows}
    hits: dict[int, set[str]] = {}

    def add(drug_id: int, code: str):
        if len(code) == 7:
            hits.setdefault(drug_id, set()).add(code)

    for (c1, c2, rel, _s, _e, invalid) in vocab.relationship_rows:
        if rel in ATC_RELATIONSHIP_IDS and invalid is None:
            a, b = by_id.get(c1), by_id.get(c2)
            if a and b and a[2] == "Drug" and a[5] == "S" and b[3] == "ATC":
                add(c1, b[6])
    for (anc, desc, _mn, _mx) in vocab.ancestor_rows:
        a, b = by_id.get(desc), by_id.get(anc)
        if a and b and a[2] == "Drug" and a[5] == "S" and b[3] == "ATC":
            add(desc, b[6])
    return {k: sorted(v) for k, v in hits.items()}


def oracle_standard_embeddable(vocab, domain_filter: str | None = None):
    rows = []
    for c in vocab.concept_rows:
        (_cid, _name, domain, _v, cls, std, *_rest) = c
        if std != "S":
            continue
        low = cls.lower()
        if "box" in low or "marketed" in low:
            continue
        if domain_filter and domain != domain_filter:
            continue
        rows.append(c)
    return sorted(rows, key=lambda r: r[0])  # concept_id order = index order


@lru_cache(maxsize=4)
def oracle_link_default(n_conversations: int = 200) -> dict:
    """Memoized default-config oracle run (gate fixtures + golden edges
    both consume it; the embedding pass is the expensive part)."""
    return oracle_link(n_conversations=n_conversations)


def oracle_link(
    seed: int = 42,
    n_conversations: int = 200,
    target_domains: list[str] | None = None,
    threshold: int = 8,
    k_standard: int = 15,
    k_drug: int = 30,
    domain_filter: str | None = None,
) -> dict:
    """Run the full sequential reference algorithm; return golden outputs."""
    vocab = build_mini_vocab(seed)
    lexicon = build_lexicon(seed)
    atc7_map = oracle_atc7(vocab)
    std = oracle_standard_embeddable(vocab, domain_filter)

    concept_ids = np.asarray([c[0] for c in std], dtype=np.int64)
    names = [c[1] for c in std]
    domains = np.asarray([c[2] for c in std], dtype=object)
    matrix = embed_texts(names)

    # mention detection over transcripts (same kernel as the pipeline UDF)
    pattern, canon = compile_lexicon([e["mention_text"] for e in lexicon])
    freq: dict[str, int] = {}
    for (_cid, _ti, _role, text, _tool, _ts) in generate_transcript_rows(
        n_conversations, seed
    ):
        for m in detect_mentions_py(text, pattern, canon):
            freq[m] = freq.get(m, 0) + 1

    is_drug_map = {e["mention_text"]: bool(e["is_drug"]) for e in lexicon}
    results, edges = [], []
    for mention in sorted(freq):  # sequential loop like automap_all
        is_drug = is_drug_map.get(mention, False)
        m = _ATC7_RE.match(mention.strip().upper())
        atc7 = m.group(1) if m else ""
        k = k_drug if is_drug else k_standard

        scores = matrix @ embed_texts([mention])[0]
        mask = np.ones(len(std), dtype=bool)
        if target_domains:
            mask &= np.isin(domains, np.asarray(target_domains, object))
        if is_drug and atc7:
            atc_mask = np.asarray(
                [atc7 in atc7_map.get(int(cid), []) for cid in concept_ids]
            )
            mask &= atc_mask
        masked = np.where(mask, scores, -np.inf)

        valid = np.flatnonzero(masked > -np.inf)
        if valid.size == 0:
            results.append({"mention_text": mention, "status": "no_hits"})
            continue
        if valid.size > k:
            kth = np.partition(masked[valid], valid.size - k)[valid.size - k]
            part = valid[masked[valid] >= kth]
        else:
            part = valid
        order = np.lexsort((concept_ids[part], -masked[part]))
        top = part[order][:k]

        cand_names = [names[j] for j in top]
        rr = rerank_scores(mention, cand_names)
        sel = max(range(len(rr)), key=lambda i: (rr[i], -i))
        confidence = confidence_from_score(rr[sel])
        chosen = int(top[sel])
        row = {
            "mention_text": mention,
            "concept_id": int(concept_ids[chosen]),
            "concept_name": names[chosen],
            "confidence": confidence,
            "is_drug": is_drug,
            "atc7": atc7,
            "mapping_method": "auto_drug" if is_drug else "auto_standard",
            "freq": freq[mention],
            "status": "accepted" if confidence >= threshold else "rejected",
        }
        results.append(row)
        if row["status"] == "accepted":
            edges.append(
                {
                    "mention_text": mention,
                    "pred": "maps-to-value" if (is_drug and atc7) else "maps-to",
                    "obj": row["concept_id"],
                    "confidence": confidence,
                    "mapping_method": row["mapping_method"],
                }
            )

    # canonical components: mentions sharing an accepted concept
    by_concept: dict[int, list[str]] = {}
    for e in edges:
        by_concept.setdefault(e["obj"], []).append(e["mention_text"])
    components = [sorted(v) for v in by_concept.values()]

    return {
        "results": results,
        "edges": edges,
        "components": {cid: sorted(v) for cid, v in by_concept.items()},
        "freq": freq,
        "n_standard": len(std),
    }
