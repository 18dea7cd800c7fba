"""Source/sink operators mirroring the reference's ingest surface (SURVEY §2.1).

S1  CSV source-concept import   (reference src/backend/db/methods/imports.py:10-117)
S2  OMOP vocab bulk upsert      (imports.py:182-283)
S3  vocab full replace          (imports.py:286-343)
S6  mapped-concepts CSV export  (src/frontend/ui/commit.py:60-68)
S7  vocabulary delete           (imports.py:441-452)

All re-expressed as declarative reads + snapshot-table writes; the
reference's manual drop-index/COPY/recreate-index dance (X2) disappears —
columnar appends have no incremental index to maintain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from omop_concept_automapper_spark.catalog import Table

REQUIRED_SOURCE_COLUMNS = ["source_value", "source_concept_name", "freq"]


def read_source_concepts_csv(
    spark: SparkSession, path: str, source_vocabulary_id: int
) -> DataFrame:
    """S1: CSV import with the reference's cleaning rules.

    * required columns validated (imports.py:15-26);
    * ``freq`` NaN -> 1, cast int (imports.py:18-19);
    * deterministic ``(source_id, source_id2)`` two-column 128-bit key =
      xxhash64(value, name, vocab) / xxhash64(1, value, name, vocab) —
      resume-stable, unlike SERIAL, and collision-safe at 10^9+ distinct
      sources (a lone 64-bit hash silently merges rows at that scale).
    """
    df = spark.read.csv(path, header=True, inferSchema=False)
    missing = [c for c in REQUIRED_SOURCE_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"missing required columns: {missing}")
    out = df.select(
        F.xxhash64(
            F.col("source_value"),
            F.col("source_concept_name"),
            F.lit(source_vocabulary_id),
        ).alias("source_id"),
        F.xxhash64(
            F.lit(1),
            F.col("source_value"),
            F.col("source_concept_name"),
            F.lit(source_vocabulary_id),
        ).alias("source_id2"),
        "source_value",
        "source_concept_name",
        F.lit(source_vocabulary_id).alias("source_vocabulary_id"),
        F.coalesce(F.col("freq").cast("int"), F.lit(1)).alias("freq"),
        F.col("concept_id") if "concept_id" in df.columns else F.lit(None).cast(
            "string"
        ).alias("concept_id"),
    )
    return out


def parse_premapped_concept_ids(
    source_concepts: DataFrame, concept: DataFrame
) -> DataFrame:
    """Semicolon-separated pre-mappings -> validated (source_id, concept_id).

    Mirrors imports.py:42-49 (split + per-token trim, digit check) and
    imports.py:83-97 (keep only ids that exist in ``concept`` — a semi-join).
    Carries both halves of the 128-bit source key so downstream joins never
    key on the collision-prone single hash.
    """
    exploded = (
        source_concepts.where(F.col("concept_id").isNotNull())
        .select(
            "source_id",
            "source_id2",
            F.explode(
                F.transform(F.split("concept_id", ";"), lambda x: F.trim(x))
            ).alias("cid"),
        )
        .where(F.col("cid").rlike("^[0-9]+$"))
        .select(
            "source_id", "source_id2", F.col("cid").cast("int").alias("concept_id")
        )
    )
    return exploded.join(
        concept.select("concept_id"), "concept_id", "left_semi"
    ).select("source_id", "source_id2", "concept_id").distinct()


def bulk_load_vocab_csv(
    spark: SparkSession, path: str, schema
) -> DataFrame:
    """S2/S3 read side: OMOP vocabulary TSV (tab-separated, header,
    quote disabled via an unused control char — mirrors the reference's
    COPY ... DELIMITER E'\\t' QUOTE E'\\b', imports.py:207)."""
    return (
        spark.read.option("sep", "\t")
        .option("header", True)
        .option("quote", "\b")
        .schema(schema)
        .csv(path)
    )


def upsert_concepts(table: Table, fresh: DataFrame) -> None:
    """S2: MERGE-style upsert on concept_id (ON CONFLICT DO UPDATE)."""
    table.merge_upsert(fresh, keys=["concept_id"])


def replace_table(table: Table, fresh: DataFrame) -> None:
    """S3: TRUNCATE + COPY == snapshot overwrite."""
    table.overwrite(fresh)


def delete_vocabulary(table: Table, source_vocabulary_id: int) -> None:
    """S7: row-level delete of one source vocabulary."""
    table.delete_where(F.col("source_vocabulary_id") == source_vocabulary_id)


def export_mapped_csv(mapped: DataFrame, path: str) -> None:
    """S6: export the review join (small result) as a single CSV."""
    mapped.coalesce(1).write.mode("overwrite").option("header", True).csv(path)


CORPUS_JSONL_SCHEMA = (
    "chunk_id bigint, n_tokens bigint, text string"
)


def export_corpus_jsonl(chunks: DataFrame, path: str) -> None:
    """Training-corpus handoff: one ``{"chunk_id", "n_tokens", "text"}``
    JSON object per line (the format every trainer's data loader reads).

    ``chunks`` is materialize_chunks/write_corpus_chunks output
    (chunk_id, n_tokens, tokens array); tokens re-join with single
    spaces — the same reversible rendering the pack_chunks gate pins.
    The write keeps the incoming (uniform, chunk_id-keyed) partitioning:
    one JSONL part file per partition, no single-writer bottleneck.
    """
    chunks.select(
        "chunk_id",
        "n_tokens",
        F.concat_ws(" ", F.col("tokens")).alias("text"),
    ).write.mode("overwrite").json(path)


def read_corpus_jsonl(spark, path: str) -> DataFrame:
    """Read the JSONL corpus back with the EXPLICIT schema — schema
    inference is a full extra pass over 100 TB and can widen types."""
    return spark.read.schema(CORPUS_JSONL_SCHEMA).json(path)
