"""PII detection / redaction / pseudonymization (JVM-side, codegen-safe).

A training-data pipeline over conversation transcripts (BASELINE.json
input_hint) must scrub personally identifiable information before corpus
assembly.  This module provides the three standard surfaces:

- ``detect_pii``     -> exploded (id, pii_type, match, pseudo) rows — the
  audit table a privacy review reads;
- ``redact_pii``     -> the text column with every match replaced by a
  ``<TYPE>`` placeholder — the form that enters the training corpus;
- ``pii_summary``    -> per-document match counts for quality gating.

Everything is a pure ``pyspark.sql.functions`` composition (regexp_replace
/ regexp_extract_all / md5) — no Python UDFs, so detection fuses with the
scan as map-only work: zero shuffle, and at 10^12 turns the cost is the
regex pass itself.  Patterns are restricted to syntax Java's regex engine
and RE2 (the DuckDB oracle) treat identically: no lookarounds, ASCII
classes, bounded quantifiers, ``\\b`` word boundaries.

Pseudonyms are ``substr(md5(match), 1, 12)`` — deterministic, so the same
address maps to the same token corpus-wide and downstream joins (e.g. "all
turns mentioning this email") survive redaction without storing the raw
value next to the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: replacement applies top-down, and the placeholder of an earlier
# type contains no digits, so later numeric patterns can't partially match
# inside an already-redacted span.  CARD precedes PHONE/SSN so a 16-digit
# grouped number is consumed whole before the shorter patterns run.
PII_PATTERNS: list[tuple[str, str]] = [
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("CARD", r"\b\d{4}-\d{4}-\d{4}-\d{4}\b"),
    ("SSN", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("PHONE", r"\b\d{3}-\d{3}-\d{4}\b"),
    ("IPV4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]

PSEUDO_LEN = 12


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with its ``<TYPE>`` placeholder.

    Sequential ``regexp_replace`` in ``PII_PATTERNS`` order; the output
    contains no substring matching any of the patterns (law pinned in
    tests/test_pii.py).
    """
    out = _c(col)
    for name, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{name}>")
    return out


def pseudonym(col: Column | str) -> Column:
    """Stable pseudonym for a raw PII value: md5 prefix, corpus-wide."""
    return F.substring(F.md5(_c(col)), 1, PSEUDO_LEN)


def detect_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exploded PII audit rows: (id, pii_type, match, pseudo).

    One ``regexp_extract_all`` per type on the ORIGINAL text, unioned via a
    stacked array so the plan stays a single map-only projection (explode of
    a literal-typed array of (type, matches) structs — no shuffle, no join).
    Duplicate occurrences within a document are preserved (the audit wants
    counts); aggregate with ``pii_summary`` for the per-doc rollup.
    """
    typed = F.array(
        *[
            F.struct(
                F.lit(name).alias("pii_type"),
                F.regexp_extract_all(
                    _c(text_col), F.lit(pat), F.lit(0)
                ).alias("matches"),
            )
            for name, pat in PII_PATTERNS
        ]
    )
    return (
        df.select(F.col(id_col), F.explode(typed).alias("t"))
        .select(
            id_col,
            F.col("t.pii_type").alias("pii_type"),
            F.explode(F.col("t.matches")).alias("match"),
        )
        .withColumn("pseudo", pseudonym("match"))
    )


def scrub_documents(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus pre-stage: replace the text column with its redacted form,
    all other columns untouched.  Compose ahead of assembly —
    ``assemble_corpus(scrub_documents(docs), ...)`` — so no raw PII can
    reach a packed chunk; still map-only, fused with the scan."""
    return docs.withColumn(text_col, redact_pii(text_col))


def n_pii(col: Column | str) -> Column:
    """Total PII match count in a text column (map-only, all types)."""
    total = None
    for _, pat in PII_PATTERNS:
        c = F.size(F.regexp_extract_all(_c(col), F.lit(pat), F.lit(0)))
        total = c if total is None else total + c
    return total.cast("int")


def pii_summary(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document PII counts, one column per type plus a total.

    Map-only (a size() per pattern); the quality-gate input for "drop or
    quarantine documents with excessive PII density".
    """
    out = df.select(
        id_col,
        *[
            F.size(
                F.regexp_extract_all(_c(text_col), F.lit(pat), F.lit(0))
            ).alias(f"n_{name.lower()}")
            for name, pat in PII_PATTERNS
        ],
    )
    total = None
    for name, _ in PII_PATTERNS:
        col = F.col(f"n_{name.lower()}")
        total = col if total is None else total + col
    return out.withColumn("n_pii", total.cast("int"))
