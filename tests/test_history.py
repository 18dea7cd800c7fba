"""Temporal-table operators (operators/history.py): interval derivation,
tie determinism, as-of containment (incl. boundary instants), coverage
laws, and layout invariance."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from omop_concept_automapper_spark.operators.history import (
    asof_snapshot,
    scd2_intervals,
)


def _events(spark):
    rows = [
        (1, "k", datetime(2024, 1, 1), "v1"),
        (2, "k", datetime(2024, 1, 5), "v2"),
        (3, "k", datetime(2024, 1, 9), "v3"),
        (4, "other", datetime(2024, 1, 3), "w1"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, key string, ts timestamp, val string"
    )


def test_intervals(spark):
    h = scd2_intervals(_events(spark), ["key"], "ts", ["event_id"])
    got = {
        r["event_id"]: (r["valid_from"], r["valid_to"], r["is_current"])
        for r in h.collect()
    }
    assert got[1] == (datetime(2024, 1, 1), datetime(2024, 1, 5), False)
    assert got[2] == (datetime(2024, 1, 5), datetime(2024, 1, 9), False)
    assert got[3] == (datetime(2024, 1, 9), None, True)
    assert got[4] == (datetime(2024, 1, 3), None, True)


def test_asof_boundaries(spark):
    h = scd2_intervals(_events(spark), ["key"], "ts", ["event_id"])

    def at(dt):
        return sorted(
            r["event_id"]
            for r in asof_snapshot(h, F.lit(dt)).collect()
        )

    # exactly at a change instant the NEW version is current (half-open)
    assert at(datetime(2024, 1, 5)) == [2, 4]
    assert at(datetime(2024, 1, 4, 23, 59)) == [1, 4]
    assert at(datetime(2023, 12, 31)) == []
    assert at(datetime(2025, 1, 1)) == [3, 4]


def test_snapshot_has_one_row_per_key(spark):
    h = scd2_intervals(_events(spark), ["key"], "ts", ["event_id"])
    snap = asof_snapshot(h, F.lit(datetime(2024, 1, 7)))
    per_key = snap.groupBy("key").count().collect()
    assert all(r["count"] == 1 for r in per_key)


def test_same_ts_tie_is_deterministic(spark):
    rows = [
        (2, "k", datetime(2024, 1, 1), "b"),
        (1, "k", datetime(2024, 1, 1), "a"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, key string, ts timestamp, val string"
    )
    h = scd2_intervals(df, ["key"], "ts", ["event_id"])
    got = {r["event_id"]: r["is_current"] for r in h.collect()}
    assert got == {1: False, 2: True}


def test_layout_invariance(spark):
    e = _events(spark)
    a = sorted(
        map(
            tuple,
            scd2_intervals(e, ["key"], "ts", ["event_id"]).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            scd2_intervals(
                e.repartition(7), ["key"], "ts", ["event_id"]
            ).collect(),
        )
    )
    assert a == b
