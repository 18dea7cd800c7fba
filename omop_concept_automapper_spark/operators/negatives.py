"""Deterministic negative sampling over KG edges — the training-data op
that turns a knowledge graph into (positive, negative) contrast pairs for
embedding models (TransE-style corruption: keep the subject, replace the
object with a random-but-not-linked candidate).

Everything is a pure function of the data — the "random" draw is the
60-bit md5 hash of (subj, obj, draw-index) modulo the candidate count, so
a re-run, a retry, or a different partition layout produces byte-identical
samples, and a DuckDB oracle reproduces them bit-for-bit (same discipline
as operators/sketches.kmv_hash / operators/freq.sample_by_hash).

Scale shape:

* The candidate vocabulary (distinct objects) is indexed 1..n via the
  same two-phase distributed running total that sequence packing uses —
  a ``row_number() OVER (ORDER BY obj)`` would be an
  ``Exchange SinglePartition``; the two-phase fold never collapses a
  stage.  Only one scalar (the candidate count) reaches the driver.
* The draw explode is map-side (n_neg per edge); the candidate fetch is
  an equi-join on the drawn slot — candidate vocabularies are typically
  dim-sized (concept targets), so AQE broadcasts them, but nothing
  REQUIRES it: the join stays a plain keyed join at any size.
* Filtered sampling (drop corruptions that happen to be true edges) is
  one left_anti join against the edge list on (subj, candidate).

Reference provenance: the reference (a mapping UI) has no training
surface; this extends the corpus family (packing, mixture, decontam)
with the KG-side op a link-prediction pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from omop_concept_automapper_spark.operators.sketches import kmv_hash


def kg_negative_samples(
    edges: DataFrame,
    n_neg: int,
    subj_col: str = "subj",
    obj_col: str = "obj",
    filtered: bool = True,
) -> DataFrame:
    """For every (subj, obj) edge, up to ``n_neg`` corrupted-object
    negatives.  Output: subj col + obj col + ``neg_rank int`` (1-based
    draw index) + ``neg_obj`` (same type as the object column).

    Draw ``i`` for an edge replaces the object with the candidate at
    slot ``md5hash(subj || '|' || obj || '|' || i) mod n_candidates``
    in the by-value-ordered distinct-object vocabulary.  With
    ``filtered=True`` (the default, standard for link-prediction
    training) a draw is DROPPED when it lands on the positive object
    itself or on any other true object of the same subject — so an edge
    can yield fewer than ``n_neg`` rows; deterministic re-draw loops are
    deliberately avoided (they turn one pass into an unbounded chain of
    anti-joins).  Rows with a NULL subj or obj are excluded up front.

    ``subj_col``/``obj_col`` should be string or integer columns — the
    draw hash stringifies them, and float renderings differ across
    engines (see kmv_hash).
    """
    from omop_concept_automapper_spark.operators.packing import (
        global_running_total,
    )

    if n_neg <= 0:
        raise ValueError("n_neg must be positive")
    # The deduped edge set feeds THREE consumers (the candidate
    # vocabulary, the draw explode, and the filtered anti-join's right
    # side) plus the n_candidates scalar action below — snapshot it once
    # (lazy; the scalar action materializes it) so the caller's edge
    # derivation doesn't re-execute per consumer.
    e = (
        edges.select(subj_col, obj_col)
        .na.drop()
        .distinct()
        .localCheckpoint(eager=False)
    )
    cand = e.select(obj_col).distinct()
    # 1-based dense index without a single-partition window: each distinct
    # object contributes 1, the running total over obj-order IS the index
    indexed = (
        global_running_total(
            cand.withColumn("_one", F.lit(1)), "_one", order_cols=[obj_col]
        )
        .select(
            F.col(obj_col).alias("_neg_obj"), F.col("_cum").alias("_slot")
        )
    )
    n_cand = indexed.agg(F.max("_slot")).collect()[0][0] or 0
    if n_cand < 2:
        raise ValueError(
            "need at least 2 distinct objects to draw negatives from"
        )
    drawn = (
        e.select(
            "*",
            F.explode(
                F.array(*[F.lit(i) for i in range(1, n_neg + 1)])
            ).alias("neg_rank"),
        )
        .withColumn(
            "_slot",
            F.pmod(
                kmv_hash(
                    F.concat_ws(
                        "|",
                        F.col(subj_col).cast("string"),
                        F.col(obj_col).cast("string"),
                        F.col("neg_rank").cast("string"),
                    )
                ),
                F.lit(int(n_cand)),
            )
            + F.lit(1),
        )
        .join(indexed, "_slot")
        .drop("_slot")
    )
    if filtered:
        # one anti-join removes BOTH self-hits (the positive edge is in
        # ``e``) and draws that land on another true object of the subject
        drawn = drawn.join(
            e.select(
                F.col(subj_col).alias(subj_col), F.col(obj_col).alias("_neg_obj")
            ),
            on=[subj_col, "_neg_obj"],
            how="left_anti",
        )
    return drawn.select(
        subj_col, obj_col, "neg_rank", F.col("_neg_obj").alias("neg_obj")
    )
