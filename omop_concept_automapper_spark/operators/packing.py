"""Training-corpus assembly operators: a distributed running total, GPT-style
sequence packing, and a deterministic weighted mixture interleave.

The reference pipeline has no corpus-assembly stage (it maps one vocabulary
at a time); these belong to the task's training-data-pipeline addendum,
built Spark-first like the dedup/ANN family.

Scale design.  Both operators need a GLOBAL running total over a total
order — the textbook formulation (a window with no ``partitionBy``) pulls
the entire table through ONE task (``Exchange SinglePartition`` in the
plan), which is exactly the shape that cannot survive a 100x scale-up.
:func:`global_running_total` instead runs the classic two-phase scan:

1. range-partition by the order key (group-major when grouped) and pin the
   layout with an eager localCheckpoint, so every subsequent job sees the
   SAME partition ids;
2. one balanced aggregation computes per-(partition, group) partials;
3. the driver prefix-sums the partials — O(n_partitions + n_groups) rows,
   never data-sized, because range partitioning keeps each group's rows on
   a contiguous partition span;
4. a broadcast join ships each partition its starting offset and a window
   keyed by the PINNED partition id finishes locally.

Keying the final window by partition id (not by the grouping column) is
the skew story: a per-``source`` window would put each hot source into one
task, while partition ids are balanced by construction regardless of how
skewed the group values are.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from omop_concept_automapper_spark.functions.text import token_count


def _range_stage(
    df: DataFrame,
    part_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Phase 1 of the running total, PRE-checkpoint: range-partition on the
    (group-major) order key, sort within partitions, stamp partition ids.
    Split out so plan tests can inspect the full upstream lineage — the
    eager localCheckpoint in :func:`global_running_total` truncates it to a
    LogicalRDD, which would make an end-to-end plan assertion vacuous.

    An explicit partition count pins the range-exchange width (AQE may
    otherwise coalesce small inputs); at scale, size it so a partition's
    rows fit one task comfortably.
    """
    ranged = (
        df.repartitionByRange(num_partitions, *part_cols)
        if num_partitions
        else df.repartitionByRange(*part_cols)
    )
    return ranged.sortWithinPartitions(*part_cols).withColumn(
        "_pid", F.spark_partition_id()
    )


def global_running_total(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    group_cols: list[str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a ``_cum`` column: the inclusive running total of ``value_col``
    over rows ordered by ``order_cols`` (within ``group_cols`` when given),
    without ever collapsing the data into a single task.

    ``order_cols`` must be a total order (a unique key such as doc_id) —
    ties straddling a partition boundary would make the split ambiguous.
    ``value_col`` must be integral: the driver-side offset fold is exact
    long arithmetic, and a fractional column would silently truncate per-
    partition totals (callers sum token counts and row counts; cast a
    fractional weight to a fixed-point integer first).  The driver
    materializes only the per-(partition, group) partial sums.

    NULL group values are a group like any other (the offset join is
    null-safe), so rows with a NULL in ``group_cols`` get a running total
    instead of silently vanishing through a null-unsafe equi-join.
    """
    group_cols = list(group_cols or [])
    vtype = dict(df.dtypes)[value_col]
    if vtype not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"global_running_total needs an integral value_col; {value_col} "
            f"is {vtype} (cast fractional weights to fixed-point longs)"
        )
    part_cols = group_cols + list(order_cols)
    # r7: snapshot the input once — repartitionByRange runs a separate
    # boundary-SAMPLING pass before the exchange, so an un-cached input
    # lineage (the corpus chain's quality+dedup+join, or a prior running
    # total's window) would execute twice; the sampling pass materializes
    # this cache and the exchange reads it back.
    df = df.localCheckpoint(eager=False)
    # pin the layout: repartitionByRange re-samples its boundaries per job,
    # and the partials job + the final window must agree on partition ids.
    # The checkpoint is LAZY (r7): the partials collect right below is the
    # first action through it and materializes it — an eager checkpoint
    # here cost one extra job per running total for the same guarantee
    # (every later job reads the same cached RDD either way).
    staged = _range_stage(df, part_cols, num_partitions).localCheckpoint(
        eager=False
    )

    keys = ["_pid"] + group_cols
    partials = (
        staged.groupBy(*keys)
        .agg(F.sum(value_col).alias("_part_total"))
        .collect()
    )
    running: dict[tuple, int] = {}
    rows = []
    # ascending pid is the only order that matters: offsets accumulate
    # per group independently, and range partitioning already guarantees
    # each group's rows span ascending-contiguous pids
    for r in sorted(partials, key=lambda r: r["_pid"]):
        g = tuple(r[c] for c in group_cols)
        rows.append(tuple(r[c] for c in keys) + (int(running.get(g, 0)),))
        running[g] = running.get(g, 0) + int(r["_part_total"])

    spark = df.sparkSession
    # schema fields MUST follow group_cols order — the row tuples do, and
    # a schema in DataFrame-column order would silently bind multi-column
    # groups to the wrong fields
    ftypes = {f.name: f.dataType.simpleString() for f in staged.schema.fields}
    gfields = ", ".join(f"{c} {ftypes[c]}" for c in group_cols)
    schema = "_pid int" + (", " + gfields if gfields else "") + ", _offset long"
    off_df = spark.createDataFrame(rows, schema)

    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # null-safe equality on the group columns: a NULL group is a group,
    # not a row to drop (a plain equi-join would silently discard it)
    off_rn = off_df.select(
        [F.col(c).alias(f"_off_{c}") for c in keys] + [F.col("_offset")]
    )
    cond = (staged["_pid"] == off_rn["_off__pid"])
    for c in group_cols:
        cond = cond & staged[c].eqNullSafe(off_rn[f"_off_{c}"])
    return (
        staged.join(F.broadcast(off_rn), cond)
        .withColumn("_cum", F.sum(F.col(value_col)).over(w) + F.col("_offset"))
        .drop("_pid", "_offset", *[f"_off_{c}" for c in keys])
    )


def chunk_route_cols(chunk_tokens: int, base: int = 0) -> list[Column]:
    """The chunk-routing triple over an inclusive ``_cum`` running total of
    ``n_tokens``: global ``start_off`` plus the first/last fixed-size chunk
    the doc lands in.  THE single definition of the routing arithmetic —
    batch packing, the composed corpus plan, and the streaming fold all
    select these columns, so the three surfaces cannot silently diverge.

    ``base`` shifts the stream origin (streaming folds continue from the
    committed ``tokens_through`` watermark).  Arithmetic is Spark ``DIV``
    (exact long division; DuckDB twin ``//``) — never floating floor,
    which loses exactness past 2^53 token offsets.
    """
    L = int(chunk_tokens)
    b = int(base)
    return [
        (F.lit(b) + F.col("_cum") - F.col("n_tokens")).alias("start_off"),
        F.expr(f"({b} + _cum - n_tokens) DIV {L}").alias("first_chunk"),
        F.expr(f"({b} + _cum - 1) DIV {L}").alias("last_chunk"),
    ]


def pack_sequences(
    docs: DataFrame,
    chunk_tokens: int,
    order_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
) -> DataFrame:
    """Concatenate-and-chunk sequence packing — the standard pretraining
    batch assembly: documents are laid end-to-end in ``order_col`` order
    and the token stream is cut into fixed ``chunk_tokens`` windows.

    Each surviving document (zero-token docs occupy no stream space and
    are dropped) is annotated with its global token offset and the first /
    last chunk it lands in, so a downstream writer can route every doc to
    its chunk files without ever materializing the concatenated stream.
    Token weight defaults to the whitespace ``token_count`` (same SQL twin
    as the text-quality gates); pass ``token_col`` to use a precomputed
    count (e.g. ``bpeish_token_count``).

    Chunk arithmetic uses Spark's ``DIV`` (exact integer division on
    longs; DuckDB twin ``//``) — never floating floor, which loses
    exactness past 2^53 token offsets.
    """
    if token_col is None:
        toks = docs.select(
            order_col, token_count(text_col).cast("long").alias("n_tokens")
        )
    else:
        toks = docs.select(
            order_col, F.col(token_col).cast("long").alias("n_tokens")
        )
    toks = toks.where(F.col("n_tokens") > 0)
    cum = global_running_total(toks, "n_tokens", [order_col])
    return cum.select(order_col, "n_tokens", *chunk_route_cols(chunk_tokens))


def chunk_manifest(
    packed: DataFrame,
    chunk_tokens: int,
    order_col: str = "doc_id",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Explode a packed layout (``pack_sequences`` / ``assemble_corpus``
    output) into the per-chunk slices a chunk writer materializes: one row
    per (chunk_id, doc) giving the half-open token span ``[tok_from,
    tok_to)`` — doc-relative — that the doc contributes to that chunk.

    This is the read side of GPT-style packing: a writer groups the
    manifest by ``chunk_id`` and concatenates each doc's ``text[tok_from:
    tok_to)`` tokens to obtain exactly ``chunk_tokens`` tokens per chunk
    (the final partial chunk excepted) without ever materializing the
    concatenated stream.

    Scale shape: a pure map-side explode — no shuffle, no window.  The
    fan-out per doc is ``n_tokens/chunk_tokens + 1`` rows, so the manifest
    is O(total_tokens / chunk_tokens + n_docs) regardless of layout; a
    downstream writer shuffles once, keyed by chunk_id, which is uniform
    by construction (every chunk holds the same token count).
    """
    L = int(chunk_tokens)
    # drop keep_cols the output selects anyway — a duplicate selection
    # would make the second projection's references ambiguous
    keep_cols = [
        c for c in (keep_cols or []) if c not in ("chunk_id", order_col)
    ]
    return packed.select(
        F.explode(F.sequence("first_chunk", "last_chunk")).alias("chunk_id"),
        order_col,
        "start_off",
        "n_tokens",
        *[c for c in keep_cols if c not in ("start_off", "n_tokens")],
    ).select(
        "chunk_id",
        order_col,
        F.expr(f"greatest(0L, chunk_id * {L} - start_off)").alias("tok_from"),
        F.expr(f"least(n_tokens, (chunk_id + 1) * {L} - start_off)").alias(
            "tok_to"
        ),
        *keep_cols,
    )


def materialize_chunks(
    docs: DataFrame,
    chunk_tokens: int,
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assemble the actual fixed-size training chunks: one row per
    ``chunk_id`` with its token array (length exactly ``chunk_tokens``,
    final partial chunk excepted) — the full pack-and-write path, without
    ever materializing the concatenated token stream on one node.

    Plan shape: tokens cross the network twice — once co-partitioning the
    token arrays with their routing rows (the ``order_col`` equi-join;
    the manifest side carries no text), once delivering each SLICED piece
    to its chunk.  The delivery shuffle is keyed by ``chunk_id``, uniform
    by construction (every chunk holds the same token count), so neither
    doc-length nor source skew can concentrate a task.  Within a chunk,
    pieces are reassembled in stream order by their global offset using
    array HOFs (sort + flatten), all JVM-side.
    """
    L = int(chunk_tokens)
    # tokenize ONCE: pack_sequences would otherwise regex-split every
    # doc's text a second time via token_count — feed it the size of the
    # same array the slicer consumes (identical count by construction)
    toks = docs.select(
        order_col,
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_toks"),
        token_count(text_col).cast("long").alias("_n"),
    )
    packed = pack_sequences(toks, L, order_col=order_col, token_col="_n")
    man = chunk_manifest(packed, L, order_col, keep_cols=["start_off"])
    return chunks_from_manifest(man, toks, order_col=order_col)


def chunks_from_manifest(
    man: DataFrame, toks: DataFrame, order_col: str = "doc_id"
) -> DataFrame:
    """Reassemble fixed-size chunks from manifest slices + token arrays —
    the shared delivery half of :func:`materialize_chunks` and the corpus
    chunk sink (plans/corpus.py write_corpus_chunks).

    ``man``: chunk_manifest output carrying (chunk_id, order_col,
    tok_from, tok_to, start_off).  ``toks``: (order_col, _toks
    array<string>) whose arrays the manifest's spans index — the SAME
    tokenization that produced the packed layout's token counts, or the
    spans will slice past array ends.  One equi-join co-partitions spans
    with their arrays, one chunk_id-keyed shuffle (uniform by
    construction) delivers sliced pieces; pieces reassemble in stream
    order by global offset via JVM array HOFs.
    """
    pieces = man.join(toks, order_col).select(
        "chunk_id",
        (F.col("start_off") + F.col("tok_from")).alias("_piece_off"),
        F.expr("slice(_toks, tok_from + 1, tok_to - tok_from)").alias(
            "_piece"
        ),
    )
    return (
        pieces.groupBy("chunk_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_piece_off", "_piece"))
                    ),
                    lambda x: x["_piece"],
                )
            ).alias("tokens")
        )
        .select(
            "chunk_id",
            F.size("tokens").cast("long").alias("n_tokens"),
            "tokens",
        )
    )


def mixture_interleave(
    docs: DataFrame,
    weights: dict[str, int],
    source_col: str = "source",
    order_col: str = "doc_id",
    scale: int = 1_000_000,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic weighted interleave of corpus sources — the mixture
    schedule a pretraining dataloader consumes.

    The k-th row of source s (1-based, in ``order_col`` order) gets
    ``interleave_key = k * scale DIV weight_s``; reading rows in ascending
    (interleave_key, source, order) order yields every prefix with sources
    represented proportionally to their integer weights — a pure function
    of the data, no RNG.  Sources absent from ``weights`` are excluded
    (an inner join against the broadcast weights table IS the mixture
    spec).  Consuming the schedule is an ordinary distributed sort on the
    emitted key; no global rank is materialized, so no single-task stage.

    ``scale`` bounds exactness: keys stay within int64 for up to
    ~9.2e18/scale rows per source (9.2e12 at the default), checked by
    Spark's ANSI overflow semantics rather than silently wrapping.

    ``keep_cols`` names extra input columns to carry through unchanged, so
    a composed pipeline (plans/corpus.py) can ride the schedule's already-
    materialized lineage instead of re-joining — and re-scanning — the
    corpus for per-doc attributes it computed upstream.
    """
    keep_cols = list(keep_cols or [])
    w_rows = [(s, int(w)) for s, w in sorted(weights.items())]
    if any(w <= 0 for _, w in w_rows):
        raise ValueError("mixture weights must be positive integers")
    off_df = docs.sparkSession.createDataFrame(
        w_rows, f"{source_col} string, _weight long"
    )
    ones = docs.select(source_col, order_col, *keep_cols).withColumn(
        "_one", F.lit(1).cast("long")
    )
    cum = global_running_total(
        ones, "_one", [order_col], group_cols=[source_col]
    )
    return (
        cum.join(F.broadcast(off_df), source_col)
        .select(
            order_col,
            source_col,
            F.col("_cum").alias("source_seq"),
            F.expr(f"_cum * {int(scale)} DIV _weight").alias("interleave_key"),
            *keep_cols,
        )
    )
