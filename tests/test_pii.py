"""PII scrubbing (functions/pii.py): known-string redaction per type, the
no-residual-match law, detect/summary count agreement, pseudonym
stability, and the map-only plan shape — the properties a privacy review
would audit before the scrubbed text enters a training corpus."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from omop_concept_automapper_spark.functions.pii import (
    PII_PATTERNS,
    detect_pii,
    n_pii,
    pii_summary,
    redact_pii,
)

CASES = [
    ("mail me at jane.doe+x@sub.example.org today", "EMAIL", 1),
    ("card 1234-5678-9012-3456 on file", "CARD", 1),
    ("ssn is 123-45-6789 ok", "SSN", 1),
    ("call 555-123-4567 now", "PHONE", 1),
    ("host 192.168.0.1 down", "IPV4", 1),
    ("two mails a@b.co c@d.io", "EMAIL", 2),
    ("no pii here at all", None, 0),
]


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_known_strings_redact(spark):
    out = redact_text_rows(spark, [t for t, _, _ in CASES])
    for (text, typ, k), red in zip(CASES, out):
        if typ is None:
            assert red == text
        else:
            assert f"<{typ}>" in red
            assert red.count(f"<{typ}>") == k


def redact_text_rows(spark, texts):
    df = _df(spark, texts).select("doc_id", redact_pii("text").alias("r"))
    return [r["r"] for r in df.orderBy("doc_id").collect()]


def test_no_residual_matches(spark):
    """The core law: after redaction, no pattern matches anything."""
    texts = [t for t, _, _ in CASES] + [
        "mixed a@b.co 1234-5678-9012-3456 123-45-6789 555-123-4567 1.2.3.4",
        "dense 999-99-9999 999-999-9999 x@y.zz 10.0.0.255",
    ]
    for red in redact_text_rows(spark, texts):
        for name, pat in PII_PATTERNS:
            assert not re.search(pat, red), (red, name)


def test_card_not_double_counted(spark):
    """A 16-digit grouped card is one CARD, never a PHONE/SSN fragment —
    \\b can't fall inside a digit run, on detection as well as replace."""
    df = _df(spark, ["pay 1234-5678-9012-3456 thanks"])
    rows = detect_pii(df).collect()
    assert [(r["pii_type"], r["match"]) for r in rows] == [
        ("CARD", "1234-5678-9012-3456")
    ]


def test_detect_counts_match_summary(spark):
    texts = [t for t, _, _ in CASES]
    df = _df(spark, texts)
    detected = detect_pii(df).groupBy("doc_id").count()
    summary = pii_summary(df).select("doc_id", "n_pii")
    joined = summary.join(detected, "doc_id", "left").fillna(0, ["count"])
    for r in joined.collect():
        assert r["n_pii"] == r["count"], r
    # and the scalar column form agrees with the summary frame
    scalar = df.select("doc_id", n_pii("text").alias("n"))
    assert {
        (r["doc_id"], r["n"]) for r in scalar.collect()
    } == {(r["doc_id"], r["n_pii"]) for r in summary.collect()}


def test_pseudonym_stable_across_docs(spark):
    """Same raw value -> same pseudonym anywhere in the corpus, different
    values -> different pseudonyms (md5 prefix)."""
    df = _df(
        spark,
        ["write a@b.co", "again a@b.co here", "other c@d.io"],
    )
    rows = detect_pii(df).collect()
    by_raw = {}
    for r in rows:
        by_raw.setdefault(r["match"], set()).add(r["pseudo"])
    assert all(len(v) == 1 for v in by_raw.values())
    assert by_raw["a@b.co"] != by_raw["c@d.io"]
    assert len(rows[0]["pseudo"]) == 12


def test_detect_is_map_only(spark):
    """detect/redact/summary fuse with the scan: no Exchange in the plan."""
    df = _df(spark, ["x a@b.co", "y 1.2.3.4"])
    for frame in (
        detect_pii(df),
        df.select(redact_pii("text")),
        pii_summary(df),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def test_null_text_yields_no_rows(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "ok a@b.co")], "doc_id long, text string"
    )
    assert detect_pii(df).count() == 1
    red = dict(
        (r["doc_id"], r["r"])
        for r in df.select(
            "doc_id", redact_pii("text").alias("r")
        ).collect()
    )
    assert red[1] is None and "<EMAIL>" in red[2]
