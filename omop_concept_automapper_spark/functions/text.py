"""Column-expression scalar functions (JVM-side, whole-stage-codegen safe).

Everything here is a pure ``pyspark.sql.functions`` composition — no Python
UDFs — mirroring the reference's scalar SQL surface (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ATC7 pattern: letter, 2 digits, 2 letters, 2 digits, anchored at start
# (reference src/backend/db/methods/utils.py:152-164)
ATC7_PATTERN = r"^([A-Z]\d{2}[A-Z]{2}\d{2})"


def atc7_extract(col: Column | str) -> Column:
    """Extract the leading ATC7 code from a source value ('' if none).

    Reference: ``extract_atc7_codes_from_source`` strips + uppercases, then
    anchors the regex at position 0 and returns at most one code.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(F.upper(F.trim(c)), ATC7_PATTERN, 1)


def atc7_extract_array(col: Column | str) -> Column:
    """Array form (0- or 1-element), matching the reference's list return."""
    code = atc7_extract(col)
    return F.when(code != "", F.array(code)).otherwise(
        F.array().cast("array<string>")
    )


def normalize_text(col: Column | str) -> Column:
    """lower + trim + collapse internal whitespace (document fingerprint prep)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of normalized text."""
    return F.md5(normalize_text(col))


def token_count(col: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"[A-Za-z0-9 ]", "")
    return F.when(F.length(c) > 0, F.length(stripped) / F.length(c)).otherwise(
        F.lit(0.0)
    )


def quality_score(col: Column | str) -> Column:
    """Simple document quality heuristic in [0,1]: rewards moderate length,
    penalizes punctuation soup.  Pure column arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    length_term = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    return F.round(length_term * (F.lit(1.0) - punct_ratio(c)), 4)
