"""Vocabulary preparation: ATC7 derivation + standard-concept embedding.

Re-expresses reference lifecycle B (SURVEY.md §3.2):

* ATC7 side-index = two-path graph query (J5 relationship path + J6
  ancestor path, UNION DISTINCT, LENGTH(code)=7, ARRAY_AGG DISTINCT) —
  reference src/backend/db/methods/utils.py:63-113.  Pure joins + agg; the
  reference's ``WITH RECURSIVE`` wrapper is vestigial (closure table is
  pre-materialized) so no iteration is needed.
* embeddable filter — standard ('S') concepts excluding concept classes
  containing 'box'/'marketed' (reference embeddings.py:29-37), optional
  domain filter.
* deterministic embedding UDF (scalar-iterator pandas UDF, Arrow batches)
  -> ``vocab_embeddings`` table.

Scale: ``concept`` is a dimension (~10M rows full OMOP) — ATC7 joins
broadcast the ATC side (tiny); the embedding pass is embarrassingly
parallel map work.  Incremental re-embeds use a left_anti join against the
already-embedded manifest (reference embeddings.py:24-28) via the runner.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

from omop_concept_automapper_spark.functions.embedder import embed_texts

ATC_RELATIONSHIP_IDS = ["Maps to", "RxNorm has ing", "Mapped from"]


def derive_atc7(
    concept: DataFrame, relationship: DataFrame, ancestor: DataFrame
) -> DataFrame:
    """(concept_id, atc7_codes sorted array<string>) for Drug standard concepts."""
    drugs = concept.where(
        (F.col("domain_id") == "Drug") & (F.col("standard_concept") == "S")
    ).select(F.col("concept_id").alias("drug_concept_id"))
    atc = concept.where(F.col("vocabulary_id") == "ATC").select(
        F.col("concept_id").alias("atc_concept_id"),
        F.col("concept_code").alias("atc_code"),
    )

    rel_path = (
        drugs.join(
            relationship.where(
                F.col("relationship_id").isin(ATC_RELATIONSHIP_IDS)
                & F.col("invalid_reason").isNull()
            ),
            drugs["drug_concept_id"] == relationship["concept_id_1"],
        )
        .join(F.broadcast(atc), F.col("concept_id_2") == atc["atc_concept_id"])
        .select("drug_concept_id", "atc_code")
    )
    anc_path = (
        drugs.join(
            ancestor, drugs["drug_concept_id"] == ancestor["descendant_concept_id"]
        )
        .join(
            F.broadcast(atc.where(F.length("atc_code") == 7)),
            F.col("ancestor_concept_id") == atc["atc_concept_id"],
        )
        .select("drug_concept_id", "atc_code")
    )
    both = rel_path.union(anc_path).where(F.length("atc_code") == 7).distinct()
    return both.groupBy("drug_concept_id").agg(
        F.sort_array(F.collect_set("atc_code")).alias("atc7_codes")
    ).withColumnRenamed("drug_concept_id", "concept_id")


def standard_embeddable(
    concept: DataFrame, domain_filter: str | None = None
) -> DataFrame:
    """P1+P2+P3: standard, embeddable-class, optional domain filter."""
    out = concept.where(
        (F.col("standard_concept") == "S")
        & ~F.lower(F.col("concept_class_id")).contains("box")
        & ~F.lower(F.col("concept_class_id")).contains("marketed")
    )
    if domain_filter:
        out = out.where(F.col("domain_id") == domain_filter)
    return out


@F.pandas_udf(ArrayType(FloatType()))
def embed_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for texts in batches:
        mat = embed_texts(texts.tolist())
        yield pd.Series(list(mat))


def build_vocab_embeddings(
    concept: DataFrame,
    relationship: DataFrame,
    ancestor: DataFrame,
    domain_filter: str | None = None,
    already_embedded: DataFrame | None = None,
) -> DataFrame:
    """Produce the vocab_embeddings table (lifecycle 3.2).

    ``already_embedded`` (concept_id) enables incremental resume — the
    left_anti mirror of the reference's embedded_concepts checkpoint.
    """
    atc7 = derive_atc7(concept, relationship, ancestor)
    base = standard_embeddable(concept, domain_filter).join(
        F.broadcast(atc7), "concept_id", "left"
    )
    if already_embedded is not None:
        base = base.join(
            already_embedded.select("concept_id"), "concept_id", "left_anti"
        )
    return base.select(
        "concept_id",
        "concept_name",
        "domain_id",
        "vocabulary_id",
        "concept_class_id",
        "concept_code",
        F.coalesce(F.col("atc7_codes"), F.array().cast("array<string>")).alias(
            "atc7_codes"
        ),
        embed_udf(F.col("concept_name")).alias("vector"),
    )
