"""Audit / review reporting queries (SURVEY.md J2, J8, A3, A5, A6, O3).

These mirror the reference's statistics and review-page queries over the
engine's own tables (links = auto_mapping_audit analog, edges =
source_standard_map analog)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mapping_statistics(links: DataFrame) -> DataFrame:
    """Per-method confidence stats (reference utils.py:167-207, A3)."""
    return (
        links.where(F.col("error").isNull())
        .groupBy("mapping_method")
        .agg(
            F.count(F.lit(1)).alias("mapping_count"),
            F.avg("confidence").alias("avg_confidence"),
            F.min("confidence").alias("min_confidence"),
            F.max("confidence").alias("max_confidence"),
        )
        .orderBy(F.desc("mapping_count"))
    )


def recent_mappings(edges: DataFrame, n: int = 20) -> DataFrame:
    """Recent-audit top-n (reference utils.py:210-254, O3)."""
    return edges.orderBy(F.desc("created_at"), F.asc("subj")).limit(n)


def mapped_review(
    edges: DataFrame, mentions: DataFrame, concept: DataFrame
) -> DataFrame:
    """Review/export join (reference mapping.py:51-80, J2): mention-entity
    edges joined back to mention metadata and the broadcast concept dim."""
    from omop_concept_automapper_spark.plans.graph import _subj_col

    m = mentions.select(
        _subj_col().alias("subj"),
        "mention_text",
        "freq",
    )
    c = concept.select(
        F.col("concept_id").alias("obj"), "concept_name", "domain_id",
        "vocabulary_id",
    )
    return (
        edges.drop("mention_text")
        .join(m, "subj")
        .join(F.broadcast(c), "obj")
        .select(
            "subj", "mention_text", "freq", "pred", "obj", "concept_name",
            "domain_id", "vocabulary_id", "confidence", "mapping_method",
        )
    )


def embedding_status(
    embeddable: DataFrame, vocab_embeddings: DataFrame
) -> dict:
    """A2: total/embedded/pending/pct via a conditional count over a left
    join against the embedded set (reference embeddings.py:115-147)."""
    joined = embeddable.select("concept_id").join(
        vocab_embeddings.select(F.col("concept_id").alias("emb_id")),
        F.col("concept_id") == F.col("emb_id"),
        "left",
    )
    row = joined.agg(
        F.count(F.lit(1)).alias("total"),
        F.count("emb_id").alias("embedded"),
    ).collect()[0]
    total, embedded = int(row["total"]), int(row["embedded"])
    return {
        "total": total,
        "embedded": embedded,
        "pending": total - embedded,
        "pct_complete": round(100.0 * embedded / total, 2) if total else 100.0,
    }


def atc7_summary(concept_atc7: DataFrame) -> DataFrame:
    """A5: count + avg array length of the ATC7 side index
    (reference utils.py:257-267)."""
    return concept_atc7.agg(
        F.count(F.lit(1)).alias("n_concepts"),
        F.avg(F.size("atc7_codes")).alias("avg_codes"),
    )


def distinct_mapping_methods(links: DataFrame) -> DataFrame:
    """A6 analog: distinct methods, ordered (reference utils.py:270-278)."""
    return links.select("mapping_method").distinct().orderBy("mapping_method")
