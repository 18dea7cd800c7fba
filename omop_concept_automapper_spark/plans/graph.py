"""Graph stage: canonicalization + (subj, pred, obj) triple materialization.

* Accepted mappings (confidence >= threshold, reference auto_mapper.py:165-167)
  become edges ``(subj="m:<mention_id>", pred, obj=concept_id)`` with audit
  columns mirroring the reference's ``auto_mapping_audit``
  (seed.sql:100-115): confidence, mapping_method, target_domains.
  pred = ``maps-to-value`` for drug mentions linked through the ATC7 value
  filter, ``maps-to`` otherwise.
* Canonicalization: mention-entities sharing an accepted concept collapse
  into one component via large-star/small-star connected components
  (operators/connected_components.py); canonical entity id = min mention_id
  in the component (FIXTURES.md §5).

Node-id encoding for the CC node space: concept nodes = ``concept_id << 1``
(even), mention nodes = ``(mention_id << 1) | 1`` (odd) — disjoint by
parity, no overflow checks triggered (pure bitwise ops).  The mapping back
to mention ids is carried by join, never by decoding, so hash-bit loss in
the shift is irrelevant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from omop_concept_automapper_spark.operators.connected_components import (
    connected_components,
)


def accepted_mappings(link_results: DataFrame, threshold: int = 8) -> DataFrame:
    return link_results.where(
        F.col("error").isNull() & (F.col("confidence") >= F.lit(threshold))
    )


def build_edges(accepted: DataFrame, target_domains: list[str] | None) -> DataFrame:
    domains = F.array(*[F.lit(d) for d in (target_domains or [])]).cast(
        "array<string>"
    )
    return accepted.select(
        F.concat(F.lit("m:"), F.col("mention_id").cast("string")).alias("subj"),
        F.when(
            F.col("is_drug") & (F.col("atc7") != ""), F.lit("maps-to-value")
        ).otherwise(F.lit("maps-to")).alias("pred"),
        F.col("concept_id").alias("obj"),
        "mention_text",
        F.col("confidence").cast("decimal(5,3)").alias("confidence"),
        "mapping_method",
        domains.alias("target_domains"),
        F.current_timestamp().alias("created_at"),
    )


def build_nodes(accepted: DataFrame) -> DataFrame:
    """Canonicalized node table over mention-entities + concepts."""
    mention_node = F.expr("shiftleft(mention_id, 1) + 1")
    concept_node = F.expr("shiftleft(cast(concept_id as long), 1)")
    cc_edges = accepted.select(
        mention_node.alias("src"), concept_node.alias("dst")
    )
    labels = connected_components(cc_edges)

    mention_map = accepted.select(
        mention_node.alias("node"), "mention_id", "mention_text"
    ).distinct()
    concept_map = accepted.select(
        concept_node.alias("node"), "concept_id"
    ).distinct()

    mention_labels = labels.join(mention_map, "node")
    canonical = mention_labels.groupBy("component").agg(
        F.min("mention_id").alias("canonical_mention_id")
    )
    mention_nodes = (
        mention_labels.join(canonical, "component")
        .select(
            F.concat(F.lit("m:"), F.col("mention_id").cast("string")).alias(
                "node_id"
            ),
            F.lit("mention_entity").alias("node_type"),
            F.concat(
                F.lit("m:"), F.col("canonical_mention_id").cast("string")
            ).alias("canonical_id"),
            F.col("mention_text").alias("label"),
        )
    )
    concept_labels = labels.join(concept_map, "node")
    concept_nodes = concept_labels.select(
        F.concat(F.lit("c:"), F.col("concept_id").cast("string")).alias("node_id"),
        F.lit("concept").alias("node_type"),
        F.concat(F.lit("c:"), F.col("concept_id").cast("string")).alias(
            "canonical_id"
        ),
        F.col("concept_id").cast("string").alias("label"),
    ).distinct()
    return mention_nodes.unionByName(concept_nodes)
