"""Incremental transcript ingestion via Structured Streaming.

The reference's only incremental pattern is the resumable embedding batch
loop (ST1, reference src/backend/db/methods/embeddings.py:14-50).  The
engine's primary resume mechanism is the stage-manifest anti-join
(plans/runner.py) — this module adds the Structured-Streaming variant for
continuously-arriving transcripts: a file-source stream with
``Trigger.AvailableNow`` drains whatever landed since the last checkpoint
and stops, giving exactly-once ingestion into the transcripts table plus a
per-microbatch mention-occurrence extraction if requested.

At production scale the same code points at an object-store landing zone;
the checkpoint dir provides the offset log (the analog of the reference's
``embedded_concepts`` marker table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from omop_concept_automapper_spark.fixtures.transcripts import TRANSCRIPTS_SCHEMA


def ingest_available_now(
    spark: SparkSession,
    landing_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    transform=None,
) -> None:
    """Drain all unprocessed files from ``landing_dir`` into ``target_dir``.

    ``transform``: optional DataFrame -> DataFrame applied per microbatch
    (e.g. mention extraction) — must be deterministic for exactly-once
    replays to be idempotent.
    """
    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(landing_dir)
    )
    if transform is not None:
        stream = transform(stream)
    query = (
        stream.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    query.awaitTermination()


def stream_into_kg(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    pipeline,
    concept: DataFrame,
    relationship: DataFrame,
    ancestor: DataFrame,
    lexicon: list[dict],
    compact_every: int = 8,
) -> None:
    """Continuously fold newly-landed transcript files into the KG.

    ``foreachBatch`` + ``Trigger.AvailableNow``: each microbatch of new
    conversations runs ``Pipeline.run_incremental`` (append occurrences,
    delta-merge the mention dim, relink only new mentions, bucket-scoped
    graph merge).  Exactly-once under replay: the occurrence append records
    the microbatch id in its snapshot metrics and a replayed batch skips
    the append while still driving the resumable downstream stages to
    completion.  Invariant (tests/test_sources_streaming.py): streaming
    batches in produces exactly the from-scratch KG over the union, and a
    re-trigger with no new files changes nothing.

    Maintenance cadence: every ``compact_every`` applied microbatches the
    append-heavy ``mention_occurrences`` table is compacted and its old
    snapshots expired, so file count stays bounded instead of growing one
    data dir per batch forever (Iceberg's rewrite_data_files +
    expire_snapshots housekeeping).  The trigger counts batches since the
    LAST compaction (a ``compacted_through`` marker in the compact
    snapshot's metrics), not ``len(applied) % compact_every`` — the modulo
    form re-fired on every replayed microbatch while the count sat at a
    multiple, and on tables with zero markers (r4 advice).  Safe under
    replay: compaction folds applied stream_batch_id markers forward into
    the surviving snapshot (catalog.Table.compact / expire_snapshots), so
    the exactly-once guard outlives maintenance.  ``compact_every <= 0``
    disables it.
    """

    def fold(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        occ_tbl = pipeline.wh.table("mention_occurrences")
        replay = (
            occ_tbl.exists()
            and int(batch_id) in occ_tbl.applied_stream_batch_ids()
        )
        pipeline.run_incremental(
            batch_df, concept, relationship, ancestor, lexicon,
            batch_id=int(batch_id),
        )
        if compact_every <= 0 or replay or not occ_tbl.exists():
            return
        n_applied = len(occ_tbl.applied_stream_batch_ids())
        done_through = max(
            (
                int((s.metrics or {}).get("compacted_through", 0))
                for s in occ_tbl.history()
            ),
            default=0,
        )
        if n_applied - done_through >= compact_every:
            occ_tbl.compact(metrics={"compacted_through": n_applied})
            occ_tbl.expire_snapshots(keep_last=1)

    query = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(landing_dir)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def streaming_mention_counts(
    spark: SparkSession,
    landing_dir: str,
    surface_forms: list[str],
    checkpoint_dir: str,
    output_dir: str,
) -> None:
    """Windowless streaming aggregation demo: detect mentions per microbatch
    and append occurrence rows; counts are derived downstream (append mode
    keeps the sink idempotent under replay)."""
    from omop_concept_automapper_spark.plans.mentions import (
        extract_mention_occurrences,
    )

    ingest_available_now(
        spark,
        landing_dir,
        output_dir,
        checkpoint_dir,
        transform=lambda df: extract_mention_occurrences(df, surface_forms),
    )
