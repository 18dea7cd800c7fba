"""Corpus assembly: the training-data pipeline composed end to end.

One documented, gate-checked composition of the four families this engine
already ships separately — exactly the chain a pretraining data job runs
over a raw document dump:

1. **quality gate** — ``functions.text.quality_score`` (length/punct
   heuristic), thresholded on exact basis points so the cut is
   bit-identical across engines;
2. **near-duplicate dedup** — ``operators.dedup.dedup_clusters``
   (MinHash -> LSH banding -> connected components), keeping one
   canonical doc per cluster (min doc_id);
3. **mixture schedule** — ``operators.packing.mixture_interleave``
   assigns each surviving doc its deterministic interleave key from
   integer source weights (sources outside the weight spec are dropped:
   the weights table IS the mixture spec);
4. **sequence packing** — a global running token total in schedule order
   cuts the concatenated stream into fixed ``chunk_tokens`` windows and
   annotates each doc with its offset and first/last chunk.

The reference pipeline has no corpus stage (it maps one vocabulary at a
time; cf. reference src/backend/automapper for its single-table scope) —
this module belongs to the task's training-data addendum, but reuses the
same Spark-first primitives the KG path is built on.

Scale shape (the part that must survive 100 TB):

- the quality gate is a map-only column expression — it reaches the
  parquet scan as a projection + filter, no shuffle;
- dedup shuffles only the LSH *candidate* graph (orders of magnitude
  smaller than the corpus) through connected components; signatures are
  map-only;
- the keeper restriction is a self-equijoin on ``doc_id`` — long-keyed,
  AQE-coalesced, and skew-free by construction (doc_id is unique);
- the mixture schedule and the pack offsets each run the two-phase
  distributed running total (``operators.packing.global_running_total``):
  range partition, per-partition partials, O(n_partitions) driver prefix,
  broadcast offsets — at no point does the plan contain an
  ``Exchange SinglePartition`` (pinned by tests/test_physical_plans.py).

Everything downstream of the gate is keyed by ``doc_id`` / partition id,
never by the (skewed) source value, so one hot source cannot serialize
the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from omop_concept_automapper_spark.functions.text import (
    quality_score,
    token_count,
)
from omop_concept_automapper_spark.operators.dedup import dedup_clusters
from omop_concept_automapper_spark.operators.packing import (
    chunk_manifest,
    chunk_route_cols,
    chunks_from_manifest,
    global_running_total,
    mixture_interleave,
)

DEFAULT_MIXTURE_WEIGHTS = {
    "src0": 5,
    "src1": 3,
    "src2": 2,
    "src3": 1,
    "src4": 1,
}


def quality_survivors(docs: DataFrame, min_quality_bp: int) -> DataFrame:
    """Docs whose quality score (rounded to basis points) clears the bar.

    The threshold compares a ROUNDED long, not the raw double: both
    engines compute the same double expression, and rounding to bp before
    the compare removes any risk of a doc sitting on an ulp boundary.
    """
    qbp = F.round(quality_score("text") * 10000).cast("long")
    return docs.where(qbp >= int(min_quality_bp))


def kept_docs(docs: DataFrame, min_quality_bp: int) -> DataFrame:
    """Stage 1+2 of the assembly, tokenized: quality survivors restricted
    to their cluster keepers, with ``n_tokens`` computed ON the keeper
    rows, once — the schedule carries it through (mixture_interleave
    keep_cols), so the corpus scan + quality gate + keeper join run a
    single time, inside the mixture's materialized running total, instead
    of once per downstream branch.

    Split out so the plan test can range-stage THIS production lineage
    (tests/test_packing.py) — a test that re-derived the stage by hand
    would keep passing after the pipeline changed shape.
    """
    q = quality_survivors(docs, min_quality_bp)
    keepers = dedup_clusters(q).where(F.col("is_keeper") == 1).select("doc_id")
    return q.join(keepers, "doc_id").withColumn(
        "n_tokens", token_count("text").cast("long")
    )


def schedule_and_pack(
    kept: DataFrame,
    weights: dict[str, int],
    chunk_tokens: int,
) -> DataFrame:
    """Stages 3+4 over an already-deduplicated keeper set carrying
    ``(doc_id, source, n_tokens)``: mixture schedule, then pack offsets in
    schedule order.  Shared verbatim by the batch chain and the streaming
    seal (streaming/corpus.py), so the two surfaces cannot diverge — the
    output is a pure function of the keeper SET (all ordering is
    data-determined), never of arrival order.
    """
    # numbering runs over ALL kept docs (zero-token docs consume schedule
    # slots); only the packed stream excludes them — same as the oracle
    sched = mixture_interleave(kept, weights, keep_cols=["n_tokens"])
    base = sched.where(F.col("n_tokens") > 0)

    order_cols = ["interleave_key", "source", "doc_id"]
    cum = global_running_total(base, "n_tokens", order_cols)
    return cum.select(
        "doc_id",
        "source",
        "n_tokens",
        "interleave_key",
        *chunk_route_cols(chunk_tokens),
    )


def assemble_corpus(
    docs: DataFrame,
    weights: dict[str, int] | None = None,
    chunk_tokens: int = 256,
    min_quality_bp: int = 5000,
) -> DataFrame:
    """Run the full assembly chain; one row per doc that survives every
    stage, annotated with its mixture position and chunk routing.

    Returns columns ``(doc_id, source, n_tokens, interleave_key,
    start_off, first_chunk, last_chunk)``.  ``start_off`` is the doc's
    global token offset in the packed stream laid out in ascending
    ``(interleave_key, source, doc_id)`` order — a total order, since
    doc_id is unique.  Chunk arithmetic is exact long division (``DIV``),
    never floating floor.
    """
    weights = weights or DEFAULT_MIXTURE_WEIGHTS
    kept = kept_docs(docs, min_quality_bp)
    return schedule_and_pack(kept, weights, chunk_tokens)


def write_corpus_chunks(
    wh,
    docs: DataFrame,
    weights: dict[str, int] | None = None,
    chunk_tokens: int = 256,
    min_quality_bp: int = 5000,
):
    """Terminal sink of the assembly (r5 verdict ask #7): materialize the
    actual fixed-``chunk_tokens`` token chunks IN THE CORPUS LAYOUT —
    ascending (interleave_key, source, doc_id) over quality+dedup
    survivors — and commit them to the ``corpus_chunks`` catalog table.

    The commit's snapshot records per-partition lineage (the catalog does
    this for every commit) plus the assembly config that produced it
    (chunk_tokens, quality bar, mixture weights, docs packed), so a
    training job can audit exactly which knob setting a chunk set came
    from.  Returns ``(snapshot, chunks_df)`` where ``chunks_df`` reads the
    table back.

    Coverage law (tests/test_packing.py): the table's chunks are EXACTLY
    the chunk_manifest slices reassembled — every chunk holds
    ``chunk_tokens`` tokens except the single last one, and the
    concatenation over ascending chunk_id equals the kept docs' token
    streams concatenated in schedule order.

    Scale shape: one extra equi-join (manifest spans to token arrays —
    the manifest side carries no text) and one chunk_id-keyed delivery
    shuffle, uniform by construction; the table write itself partitions
    however the delivery groupBy left the data, O(total_tokens) once.
    """
    weights = weights or DEFAULT_MIXTURE_WEIGHTS
    packed = assemble_corpus(docs, weights, chunk_tokens, min_quality_bp)
    # the SAME whitespace tokenization token_count counted: the packed
    # layout's offsets index these arrays position-for-position
    toks = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("_toks")
    )
    man = chunk_manifest(packed, chunk_tokens, keep_cols=["start_off"])
    chunks = chunks_from_manifest(man, toks)
    tbl = wh.table("corpus_chunks")
    snap = tbl.overwrite(
        chunks,
        metrics={
            "chunk_tokens": int(chunk_tokens),
            "min_quality_bp": int(min_quality_bp),
            "mixture_weights": dict(sorted(weights.items())),
            "n_docs_packed": packed.count(),
        },
    )
    return snap, tbl.read()
