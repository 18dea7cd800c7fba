"""JSONL corpus handoff (sources/imports.py export_corpus_jsonl /
read_corpus_jsonl) and the scrub-then-assemble composition: round-trip
equality, valid JSONL lines, and the no-PII-reaches-a-chunk law."""

from __future__ import annotations

import glob
import json
import re

import pytest
from pyspark.sql import functions as F

from omop_concept_automapper_spark.functions.pii import (
    PII_PATTERNS,
    scrub_documents,
)
from omop_concept_automapper_spark.operators.packing import (
    materialize_chunks,
)
from omop_concept_automapper_spark.sources.imports import (
    export_corpus_jsonl,
    read_corpus_jsonl,
)

TEXTS = [
    "alpha beta gamma delta epsilon zeta eta theta",
    "one two three four five six seven eight nine ten " * 4,
    "contact me at jane@ex.org or 555-123-4567 thanks a lot",
    "short doc",
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_jsonl_round_trip(spark, tmp_path):
    chunks = materialize_chunks(_docs(spark), 6)
    path = str(tmp_path / "corpus")
    export_corpus_jsonl(chunks, path)
    back = read_corpus_jsonl(spark, path)
    want = {
        (r["chunk_id"], r["n_tokens"], " ".join(r["tokens"]))
        for r in chunks.collect()
    }
    got = {
        (r["chunk_id"], r["n_tokens"], r["text"]) for r in back.collect()
    }
    assert got == want and len(got) > 1


def test_jsonl_lines_are_valid_json(spark, tmp_path):
    chunks = materialize_chunks(_docs(spark), 6)
    path = str(tmp_path / "corpus2")
    export_corpus_jsonl(chunks, path)
    n = 0
    for f in glob.glob(f"{path}/part-*"):
        with open(f) as fh:
            for line in fh:
                obj = json.loads(line)
                assert set(obj) == {"chunk_id", "n_tokens", "text"}
                n += 1
    assert n == chunks.count()


def test_scrubbed_corpus_has_no_pii(spark, tmp_path):
    scrubbed = scrub_documents(_docs(spark))
    chunks = materialize_chunks(scrubbed, 6)
    path = str(tmp_path / "corpus3")
    export_corpus_jsonl(chunks, path)
    texts = [r["text"] for r in read_corpus_jsonl(spark, path).collect()]
    assert any("<EMAIL>" in t or "<PHONE>" in t for t in texts)
    for t in texts:
        for name, pat in PII_PATTERNS:
            assert not re.search(pat, t), (name, t)
    # non-PII columns pass through scrub untouched
    assert scrubbed.columns == ["doc_id", "text"]
