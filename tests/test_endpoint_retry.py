"""Model-endpoint retry seam (X7, reference emb_model.py:47-61).

A flaky endpoint that succeeds on retry must link every row with nothing
quarantined; a permanently-failing endpoint must quarantine the affected
rows without failing the job."""

from __future__ import annotations

import pandas as pd
import pytest

from omop_concept_automapper_spark.functions.embedder import embed_texts
from omop_concept_automapper_spark.functions.endpoint import (
    RetryPolicy,
    call_with_retry,
)
from omop_concept_automapper_spark.functions.reranker import rerank_scores
from omop_concept_automapper_spark.operators.knn import (
    build_vocab_index,
    link_batch,
)

_NO_SLEEP = RetryPolicy(retries=3, sleep_sec=3.0, sleep_fn=lambda _s: None)


def _index():
    names = ["acute bronchitis", "chronic sinusitis"]
    return build_vocab_index(
        pd.DataFrame(
            {
                "concept_id": [1, 2],
                "concept_name": names,
                "domain_id": ["Condition", "Condition"],
                "atc7_codes": [[], []],
                "vector": list(embed_texts(names)),
            }
        )
    )


def _mentions():
    return pd.DataFrame(
        {
            "mention_id": [1, 2],
            "mention_text": ["acute bronchitis", "chronic sinusitis"],
            "is_drug": [False, False],
            "atc7": ["", ""],
        }
    )


class Flaky:
    """Fails the first ``n_failures`` calls, then delegates."""

    def __init__(self, fn, n_failures: int):
        self.fn = fn
        self.left = n_failures
        self.calls = 0

    def __call__(self, *args):
        self.calls += 1
        if self.left > 0:
            self.left -= 1
            raise ConnectionError("endpoint unavailable")
        return self.fn(*args)


def test_call_with_retry_sleeps_between_attempts_then_raises():
    sleeps: list[float] = []
    policy = RetryPolicy(retries=3, sleep_sec=3.0, sleep_fn=sleeps.append)

    def always_fails():
        raise TimeoutError("down")

    with pytest.raises(TimeoutError):
        call_with_retry(always_fails, policy)
    # 3 attempts -> 2 sleeps of the reference's 3 s (emb_model.py:47,58)
    assert sleeps == [3.0, 3.0]


def test_flaky_embedder_succeeds_on_retry():
    flaky = Flaky(embed_texts, n_failures=2)
    out = link_batch(_mentions(), _index(), embed_fn=flaky, retry_policy=_NO_SLEEP)
    assert out["error"].isnull().all()
    assert sorted(out["concept_id"]) == [1, 2]
    assert flaky.calls == 3  # 2 failures + 1 success, all within one policy


def test_permanently_failing_embedder_quarantines_all_rows():
    def dead(_texts):
        raise ConnectionError("endpoint gone")

    out = link_batch(_mentions(), _index(), embed_fn=dead, retry_policy=_NO_SLEEP)
    assert len(out) == 2
    assert out["error"].notnull().all()
    assert (out["confidence"] == 0).all()  # never passes the accept gate
    assert all("endpoint gone" in e for e in out["error"])


def test_batch_failure_degrades_to_per_row_quarantine():
    """Batch embed fails after retries, per-row embed fails only for one
    text: only that row is quarantined."""

    def poisoned(texts):
        if len(texts) > 1 or texts[0] == "chronic sinusitis":
            raise ValueError("poisoned")
        return embed_texts(texts)

    out = link_batch(
        _mentions(), _index(), embed_fn=poisoned, retry_policy=_NO_SLEEP
    )
    ok = out[out["error"].isnull()]
    bad = out[out["error"].notnull()]
    assert len(ok) == 1 and ok.iloc[0]["concept_id"] == 1
    assert len(bad) == 1 and "poisoned" in bad.iloc[0]["error"]


def test_flaky_reranker_succeeds_on_retry():
    flaky = Flaky(rerank_scores, n_failures=1)
    out = link_batch(_mentions(), _index(), rerank_fn=flaky, retry_policy=_NO_SLEEP)
    assert out["error"].isnull().all()
    assert sorted(out["concept_id"]) == [1, 2]


def test_permanently_failing_reranker_quarantines_rows():
    def dead(_text, _names):
        raise RuntimeError("rerank endpoint gone")

    out = link_batch(_mentions(), _index(), rerank_fn=dead, retry_policy=_NO_SLEEP)
    assert out["error"].notnull().all()
    assert all("rerank endpoint gone" in e for e in out["error"])


def test_injected_fns_flow_through_spark_path(spark):
    """The seam must survive the mapInPandas boundary (picklable callables)."""
    from omop_concept_automapper_spark.operators.knn import link_mentions

    names = ["acute bronchitis", "chronic sinusitis"]
    vocab_pdf = pd.DataFrame(
        {
            "concept_id": [1, 2],
            "concept_name": names,
            "domain_id": ["Condition", "Condition"],
            "atc7_codes": [[], []],
            "vector": [list(map(float, v)) for v in embed_texts(names)],
        }
    )
    mentions = spark.createDataFrame(
        [(1, "acute bronchitis", False, ""), (2, "zz-unlinkable", False, "")],
        "mention_id long, mention_text string, is_drug boolean, atc7 string",
    )

    # closure (not module-level) so cloudpickle ships it by VALUE — test
    # modules aren't importable on executors
    def rerank_poison_pill(text: str, names: list[str]) -> list[float]:
        if text == "zz-unlinkable":
            raise RuntimeError("poison pill endpoint error")
        return rerank_scores(text, names)

    out = link_mentions(
        spark,
        mentions,
        vocab_pdf,
        rerank_fn=rerank_poison_pill,
        retry_policy=RetryPolicy(retries=2, sleep_sec=0.0),
    ).toPandas()
    ok = out[out["error"].isnull()]
    bad = out[out["error"].notnull()]
    assert list(ok["mention_text"]) == ["acute bronchitis"]
    assert list(bad["mention_text"]) == ["zz-unlinkable"]
    assert "poison" in bad.iloc[0]["error"]


def test_hard_outage_short_circuits_per_row_fallback():
    """r3 advice: on a hard endpoint outage the per-row fallback must stop
    hammering the dead endpoint after a few consecutive failures and
    quarantine the remainder immediately — one 65k-row Arrow batch must
    never stall a task for rows x retries x sleep."""
    calls = {"n": 0}

    def dead(_texts):
        calls["n"] += 1
        raise ConnectionError("endpoint gone")

    n_rows = 40
    mentions = pd.DataFrame(
        {
            "mention_id": list(range(n_rows)),
            "mention_text": [f"acute bronchitis {i}" for i in range(n_rows)],
            "is_drug": [False] * n_rows,
            "atc7": [""] * n_rows,
        }
    )
    out = link_batch(mentions, _index(), embed_fn=dead, retry_policy=_NO_SLEEP)
    assert len(out) == n_rows
    assert out["error"].notnull().all()  # everything quarantined, job alive
    # 1 batch call + 5 consecutive per-row failures, each with the 3-attempt
    # policy; the other 35 rows never touch the endpoint
    assert calls["n"] == (1 + 5) * 3
    assert sum("short-circuit" in e for e in out["error"]) == n_rows - 5
