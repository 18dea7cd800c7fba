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

Node-id encoding for the CC node space: a two-field struct ``(n1, n2)``,
disjoint by the parity of ``n1`` — concept nodes = ``(concept_id << 1, 0)``
(even), mention nodes = ``((mention_id << 1) | 1, mention_id2)`` (odd).
The second field carries the second half of the 128-bit mention key, so two
distinct mentions colliding on the 64-bit ``mention_id`` stay distinct CC
nodes (a single-long encoding would silently fuse their components — the
10^9-scale birthday hazard).  Struct columns are fully orderable in Spark
(lexicographic), so ``connected_components`` runs on them unchanged.  The
mapping back to mention ids is carried by join, never by decoding, so
hash-bit loss in the shift is irrelevant.

Edge subjects likewise carry both halves: ``subj = "m:<id>:<id2>"`` — subj
is the graph's entity identity and must be 128-bit collision-safe too.
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


def _subj_col():
    """128-bit collision-safe subject id: both halves of the mention key."""
    return F.concat(
        F.lit("m:"),
        F.col("mention_id").cast("string"),
        F.lit(":"),
        F.col("mention_id2").cast("string"),
    )


def build_edges(accepted: DataFrame, target_domains: list[str] | None) -> DataFrame:
    domains = F.array(*[F.lit(d) for d in (target_domains or [])]).cast(
        "array<string>"
    )
    return accepted.select(
        _subj_col().alias("subj"),
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
    mention_node = F.struct(
        F.expr("shiftleft(mention_id, 1) + 1").alias("n1"),
        F.col("mention_id2").alias("n2"),
    )
    concept_node = F.struct(
        F.expr("shiftleft(cast(concept_id as long), 1)").alias("n1"),
        F.lit(0).cast("long").alias("n2"),
    )
    cc_edges = accepted.select(
        mention_node.alias("src"), concept_node.alias("dst")
    )
    labels = connected_components(cc_edges)

    mention_map = accepted.select(
        mention_node.alias("node"), "mention_id", "mention_id2", "mention_text"
    ).distinct()
    concept_map = accepted.select(
        concept_node.alias("node"), "concept_id"
    ).distinct()

    mention_labels = labels.join(mention_map, "node")
    # canonical entity = min 128-bit mention key in the component
    # (lexicographic struct min; equals min mention_id except on the very
    # collisions the wide key exists to keep apart)
    canonical = mention_labels.groupBy("component").agg(
        F.min(F.struct("mention_id", "mention_id2")).alias("cm")
    )
    mention_nodes = (
        mention_labels.join(canonical, "component")
        .select(
            _subj_col().alias("node_id"),
            F.lit("mention_entity").alias("node_type"),
            F.concat(
                F.lit("m:"),
                F.col("cm.mention_id").cast("string"),
                F.lit(":"),
                F.col("cm.mention_id2").cast("string"),
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
