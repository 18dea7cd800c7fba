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


# GPT-2-style pre-tokenizer regex, restricted to syntax Java's regex engine
# and RE2 (the DuckDB oracle) treat identically: no lookarounds, ASCII
# classes, leftmost-first alternation (both engines are leftmost-first, so
# "don't" splits [don]["'t"] the same way).  Contractions, then
# space-prefixed letter/digit/punct runs, then residual whitespace runs.
BPEISH_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
)


def bpeish_token_count(col: Column | str) -> Column:
    """Count of GPT-2-ish pre-tokenizer segments (whole-match
    regexp_extract_all; 0 for the empty string).  A cheap, deterministic
    stand-in for a real BPE token count in pipeline budgeting — the segment
    count upper-bounds the BPE token count at merge ratio 1."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPEISH_PATTERN), F.lit(0)))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"[A-Za-z0-9 ]", "")
    return F.when(F.length(c) > 0, F.length(stripped) / F.length(c)).otherwise(
        F.lit(0.0)
    )


# Language-ID heuristic: tiny per-language stopword lists; prediction =
# language with the strictly highest distinct-stopword hit count, checked
# in fixed order (en, es, fr, de, zh) so ties resolve deterministically —
# the same case/when chain is expressible in ANSI SQL for the oracle.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "los", "por", "una"],
    "fr": ["le", "la", "et", "les", "des", "une", "dans", "pour"],
    "de": ["der", "die", "und", "das", "ein", "mit", "von", "nicht"],
    "zh": ["de", "shi", "le", "zai", "you", "wo", "ta", "men"],
}
LANG_ORDER = ["en", "es", "fr", "de", "zh"]


def lang_id(col: Column | str) -> Column:
    """Predict language by distinct-stopword overlap; 'und' if no hits."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.array_distinct(F.split(F.trim(F.lower(c)), r"\s+"))
    scores = {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
        )
        for lang, words in LANG_STOPWORDS.items()
    }
    best = F.greatest(*[scores[lang] for lang in LANG_ORDER])
    expr = F.lit("und")
    for lang in reversed(LANG_ORDER):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(
            expr
        )
    return expr


def ngram_windows(toks: Column, n: int) -> Column:
    """Sliding word n-grams (space-joined) over a token-array column;
    documents shorter than ``n`` tokens yield their whole text as one
    gram.  ``toks`` should be a materialized attribute when the result is
    exploded (see dedup._shingles for the re-evaluation caveat)."""
    cnt = F.size(toks)
    return F.when(
        cnt >= n,
        F.transform(
            F.sequence(F.lit(1), cnt - n + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def dup_ngram_frac_bp(toks: Column, n: int) -> Column:
    """Fraction of n-gram positions that are repeats of an earlier gram
    in the SAME document, in basis points (Gopher-style repetition
    filter, Rae et al. 2021 §A1.1 "duplicate n-gram fraction").

    Map-only: size/array_distinct arithmetic, no shuffle, no explode.
    """
    grams = ngram_windows(toks, n)
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return (
        F.round((total - distinct) * 10000.0 / total, 0).cast("long")
    )


def top_ngram_frac_bp(toks: Column, n: int) -> Column:
    """Fraction of n-gram positions covered by the single most frequent
    n-gram of the document, in basis points (the companion Gopher rule:
    a doc whose top bigram covers >18% of it is boilerplate).

    The per-document mode is computed WITHOUT a shuffle: sort the gram
    array, then one ``aggregate`` pass tracks the longest run of equal
    adjacent elements.  A groupBy formulation would shuffle one row per
    (doc, gram) — this stays inside the row.
    """
    grams = F.array_sort(ngram_windows(toks, n))
    longest_run = F.aggregate(
        grams,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return (
        F.round(longest_run * 10000.0 / F.size(grams), 0).cast("long")
    )


def quality_score(col: Column | str) -> Column:
    """Simple document quality heuristic in [0,1]: rewards moderate length,
    penalizes punctuation soup.  Pure column arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    length_term = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    # no intermediate rounding: keeps the expression bit-identical with the
    # ANSI-SQL oracle (engines differ in round-to-N-digit ulp behavior)
    return length_term * (F.lit(1.0) - punct_ratio(c))
