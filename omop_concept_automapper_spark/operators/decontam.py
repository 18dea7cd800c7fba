"""Benchmark decontamination: n-gram overlap between a training corpus
and a held-out evaluation set.

The standard pretraining hygiene step (GPT-3 appendix C / PaLM-style
13-gram filtering): a training document is contaminated if it shares any
word n-gram with any eval document.  This module computes, per training
doc, how many of its n-gram positions collide with the eval set — the
downstream policy (drop the doc, excise the span, or just report) is the
caller's.

Scale shape (the only one that works at 100 TB):

* the corpus side is MAP-ONLY — tokens -> sliding n-gram windows ->
  one md5 per gram, truncated to a 60-bit integer key (15 hex chars, so
  the join key is a long, not a 32-char string);
* the eval side is tiny by construction (benchmarks are O(10^3..10^6)
  grams), so its distinct gram-hash set is BROADCAST — the corpus scan
  streams through a hash lookup with zero shuffle;
* the only shuffle is the final per-doc aggregation of hit counts, with
  map-side partial aggregation.

Nothing here is a Python UDF; the gram/hash pipeline is the same
codegen-friendly array-HOF + md5 composition as operators/dedup.py, so a
DuckDB oracle reproduces it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from omop_concept_automapper_spark.functions.text import ngram_windows
from omop_concept_automapper_spark.operators.dedup import tokens_col

# 15 hex chars = 60 bits: fits a signed 64-bit long in both Spark
# (conv(_, 16, 10) cast long) and DuckDB (('0x' || h)::BIGINT) with no
# overflow or sign ambiguity.  Short docs (< n tokens) contribute their
# whole text as one gram (ngram_windows' fallback), so short eval items
# (quiz answers, single phrases) are still protected.
_GRAM_HASH_HEX_LEN = 15


def ngram_hashes(
    docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per n-gram POSITION: (id_col, gram_hash long).

    Positions, not distinct grams — the per-doc hit count then measures
    how much of the document overlaps, not just whether it does.
    """
    return (
        docs.select(id_col, tokens_col(text_col).alias("_toks"))
        .select(id_col, F.explode(ngram_windows(F.col("_toks"), n)).alias("_g"))
        .select(
            id_col,
            F.conv(F.substring(F.md5("_g"), 1, _GRAM_HASH_HEX_LEN), 16, 10)
            .cast("long")
            .alias("gram_hash"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-corpus-doc contamination report against an eval set.

    Returns one row per corpus document that shares at least one word
    n-gram with any eval document:

    ``(doc_id, n_grams, n_hits, n_distinct_hits, contam_bp)``

    * ``n_grams``          — total n-gram positions in the doc
    * ``n_hits``           — positions whose gram appears in the eval set
    * ``n_distinct_hits``  — distinct contaminated grams
    * ``contam_bp``        — round(n_hits / n_grams * 10000), basis points

    The eval gram set is distinct-ed and explicitly ``broadcast()`` — the
    corpus side never shuffles until the per-doc count aggregation.
    """
    eval_grams = (
        ngram_hashes(eval_docs, n=n, text_col=text_col, id_col=id_col)
        .select("gram_hash")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    corpus_grams = ngram_hashes(corpus, n=n, text_col=text_col, id_col=id_col)
    joined = corpus_grams.join(F.broadcast(eval_grams), "gram_hash", "left")
    agg = joined.groupBy(id_col).agg(
        F.count("*").alias("n_grams"),
        F.count("_hit").alias("n_hits"),
        F.count_distinct(
            F.when(F.col("_hit").isNotNull(), F.col("gram_hash"))
        ).alias("n_distinct_hits"),
    )
    return agg.where(F.col("n_hits") > 0).select(
        id_col,
        "n_grams",
        "n_hits",
        "n_distinct_hits",
        F.round(F.col("n_hits") * 10000.0 / F.col("n_grams"), 0)
        .cast("long")
        .alias("contam_bp"),
    )
