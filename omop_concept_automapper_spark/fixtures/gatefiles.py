"""Deterministic on-disk fixtures for the driver's correctness gate.

The gate queries in ``__spark_entry__.py`` exercise reference operators that
run over *vocabulary/import/links* inputs rather than the TPC-H-ish driver
tables (S1 CSV import, J5/J6/A4 ATC7 derivation, P5 confidence gate,
J4 checkpoint anti-join, S2/ST2 merge-upsert).  Both engines — the Spark
query and the DuckDB oracle — must see identical inputs, so this module
materializes the package's pure-Python fixture builders
(fixtures/vocabulary.py, plans/oracle.py) as parquet/CSV files under a
shared directory.  Writing is idempotent and atomic (tmp + rename), and all
content is a pure function of the fixture seed — no wall clock, no RNG at
write time.
"""

from __future__ import annotations

import os
import uuid

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

GATE_FIXTURE_DIR = "/tmp/ocas_gate_fixtures"


def _atomic_write_bytes(path: str, data: bytes) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def _write_parquet(path: str, table: pa.Table) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def _source_concepts_csv_text() -> str:
    """S1 import fixture: covers freq-NaN->1, semicolon pre-mappings,
    non-digit tokens, and missing values (reference imports.py:10-117)."""
    from omop_concept_automapper_spark.fixtures.vocabulary import build_lexicon

    lines = ["source_value,source_concept_name,freq,concept_id"]
    for i, entry in enumerate(build_lexicon()):
        name = entry["mention_text"]
        freq = "" if i % 5 == 0 else str((i * 7) % 50 + 1)
        if i % 4 == 0:
            premap = f"{1000 + i};{1001 + i}; {1002 + i} "
        elif i % 4 == 1:
            premap = f"abc;{1000 + i}x;12.5"  # non-digit tokens -> dropped
        else:
            premap = ""
        lines.append(f"SRC-{i:04d},{name},{freq},{premap}")
    return "\n".join(lines) + "\n"


def ivf_embedding_rows(
    n: int = 2000, dim: int = 32, n_centers: int = 16, seed: int = 11
) -> tuple:
    """Clustered INTEGER-valued embedding fixture for the IVF recall gate.

    Integer coordinates make every dot product / squared distance exactly
    representable in float64 under any summation order, so the approximate
    path's recall is bitwise-deterministic across partitionings — pinnable
    as golden VALUES (operators/similarity.py integer_kmeans)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.integers(-40, 41, size=(n_centers, dim))
    vec_ids = np.arange(n, dtype=np.int64)
    vectors = np.empty((n, dim), dtype=np.float64)
    for i in range(n):
        # noise ±15 vs center spread ±40: clusters overlap enough that true
        # neighborhoods cross list boundaries, so the gate's recalls land in
        # [0.6, 1.0] — the approximate knob is actually observable
        vectors[i] = centers[i % n_centers] + rng.integers(-15, 16, size=dim)
    return vec_ids, vectors


def write_gate_fixtures(root: str = GATE_FIXTURE_DIR) -> dict[str, str]:
    """Write every gate fixture file; returns name -> absolute path."""
    from omop_concept_automapper_spark.fixtures.vocabulary import build_mini_vocab
    from omop_concept_automapper_spark.plans.oracle import oracle_link_default

    os.makedirs(root, exist_ok=True)
    paths = {
        "transcripts": os.path.join(root, "transcripts.parquet"),
        "source_concepts_csv": os.path.join(root, "source_concepts.csv"),
        "concept": os.path.join(root, "concept.parquet"),
        "concept_relationship": os.path.join(root, "concept_relationship.parquet"),
        "concept_ancestor": os.path.join(root, "concept_ancestor.parquet"),
        "links": os.path.join(root, "links.parquet"),
        "embedded_manifest": os.path.join(root, "embedded_manifest.parquet"),
        "edges_base": os.path.join(root, "edges_base.parquet"),
        "edges_delta": os.path.join(root, "edges_delta.parquet"),
        "ivf_embeddings": os.path.join(root, "ivf_embeddings.parquet"),
    }

    vec_ids, vectors = ivf_embedding_rows()
    ivf = pd.DataFrame(
        {
            "vec_id": pd.Series(vec_ids, dtype="int64"),
            "embedding": [[float(x) for x in v] for v in vectors],
        }
    )
    _write_parquet(
        paths["ivf_embeddings"], pa.Table.from_pandas(ivf, preserve_index=False)
    )

    _atomic_write_bytes(
        paths["source_concepts_csv"], _source_concepts_csv_text().encode()
    )

    # transcripts fixture (40 conversations — same slice the kg gate links)
    from omop_concept_automapper_spark.fixtures.transcripts import (
        generate_transcript_rows,
    )

    tr = pd.DataFrame(
        generate_transcript_rows(40),
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )
    tr["turn_idx"] = tr["turn_idx"].astype("int32")
    # micros, not pandas-default nanos: Spark cannot read TIMESTAMP(NANOS)
    tr["ts"] = (
        pd.to_datetime(tr["ts"], utc=True).dt.tz_localize(None).astype("datetime64[us]")
    )
    _write_parquet(paths["transcripts"], pa.Table.from_pandas(tr, preserve_index=False))

    v = build_mini_vocab()
    concept = pd.DataFrame(
        v.concept_rows,
        columns=[
            "concept_id", "concept_name", "domain_id", "vocabulary_id",
            "concept_class_id", "standard_concept", "concept_code",
            "valid_start_date", "valid_end_date", "invalid_reason",
        ],
    )
    concept["concept_id"] = concept["concept_id"].astype("int32")
    relationship = pd.DataFrame(
        v.relationship_rows,
        columns=[
            "concept_id_1", "concept_id_2", "relationship_id",
            "valid_start_date", "valid_end_date", "invalid_reason",
        ],
    )
    for c in ("concept_id_1", "concept_id_2"):
        relationship[c] = relationship[c].astype("int32")
    ancestor = pd.DataFrame(
        v.ancestor_rows,
        columns=[
            "ancestor_concept_id", "descendant_concept_id",
            "min_levels_of_separation", "max_levels_of_separation",
        ],
    ).astype("int32")
    for name, pdf in (
        ("concept", concept),
        ("concept_relationship", relationship),
        ("concept_ancestor", ancestor),
    ):
        _write_parquet(paths[name], pa.Table.from_pandas(pdf, preserve_index=False))

    # links-stage output fixture (P5 input): every linked mention from the
    # sequential oracle, plus two quarantined rows that the confidence gate
    # must exclude regardless of score (error IS NOT NULL)
    golden = oracle_link_default(n_conversations=40)["results"]
    rows = []
    for i, r in enumerate(sorted(
        (r for r in golden if r.get("status") != "no_hits"),
        key=lambda r: r["mention_text"],
    )):
        rows.append(
            (
                i, r["mention_text"], bool(r["is_drug"]), r["atc7"],
                int(r["concept_id"]), int(r["confidence"]),
                r["mapping_method"], None,
            )
        )
    rows.append((10_000, "broken row a", False, "", 1000, 10, "auto_standard",
                 "RuntimeError: boom"))
    rows.append((10_001, "broken row b", True, "A10BA02", 1001, 9, "auto_drug",
                 "ValueError: bad"))
    links = pd.DataFrame(
        rows,
        columns=[
            "mention_id", "mention_text", "is_drug", "atc7",
            "concept_id", "confidence", "mapping_method", "error",
        ],
    )
    links["mention_id"] = links["mention_id"].astype("int64")
    links["concept_id"] = links["concept_id"].astype("int32")
    links["confidence"] = links["confidence"].astype("int32")
    _write_parquet(paths["links"], pa.Table.from_pandas(links, preserve_index=False))

    # J4 checkpoint manifest: every third standard concept already embedded
    std_ids = sorted(
        int(c[0]) for c in v.concept_rows
        if c[5] == "S"
        and "box" not in c[4].lower()
        and "marketed" not in c[4].lower()
    )
    manifest = pd.DataFrame(
        {"concept_id": pd.Series([i for i in std_ids if i % 3 == 0], dtype="int32")}
    )
    _write_parquet(
        paths["embedded_manifest"], pa.Table.from_pandas(manifest, preserve_index=False)
    )

    # S2/ST2 merge fixture: delta overlaps base on subj 30..49
    base = pd.DataFrame(
        {
            "subj": [f"m:{i}" for i in range(50)],
            "obj": pd.Series([1000 + i for i in range(50)], dtype="int32"),
            "ver": pd.Series([1] * 50, dtype="int32"),
        }
    )
    delta = pd.DataFrame(
        {
            "subj": [f"m:{i}" for i in range(30, 60)],
            "obj": pd.Series([2000 + i for i in range(30, 60)], dtype="int32"),
            "ver": pd.Series([2] * 30, dtype="int32"),
        }
    )
    _write_parquet(paths["edges_base"], pa.Table.from_pandas(base, preserve_index=False))
    _write_parquet(paths["edges_delta"], pa.Table.from_pandas(delta, preserve_index=False))
    return paths
