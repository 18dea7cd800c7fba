"""Pluggable model-endpoint seam with in-UDF retry/backoff (X7).

The reference retries its embedding API calls 3 times with a 3-second sleep
between attempts before giving up (reference src/backend/llms/emb_model.py:
47-61).  The engine's deterministic embedder/reranker stand-ins never fail,
but a real API-backed endpoint will: this module provides the injectable
``(fn, RetryPolicy)`` pair the linker accepts (operators/knn.py
``link_batch(embed_fn=..., rerank_fn=..., retry_policy=...)``).

Failure semantics: an error that survives every retry propagates to the
caller — in the linker that is the per-row quarantine path (reference
auto_mapper.py:207-211), so a permanently-failing endpoint quarantines the
affected rows instead of failing the job, while a transiently-failing one
succeeds on retry and quarantines nothing
(tests/test_endpoint_retry.py).
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass(frozen=True)
class RetryPolicy:
    """Mirrors the reference's constants: 3 attempts, 3 s between them
    (emb_model.py:47,58).  ``backoff`` multiplies the sleep per attempt
    (1.0 = the reference's constant sleep).  ``sleep_fn`` is injectable so
    tests never actually sleep."""

    retries: int = 3
    sleep_sec: float = 3.0
    backoff: float = 1.0
    sleep_fn: Callable[[float], None] = field(default=time.sleep)


def call_with_retry(fn: Callable, policy: RetryPolicy | None, *args, **kwargs):
    """Call ``fn`` under ``policy``; re-raise the last error once exhausted.

    ``policy=None`` means no retry — a single direct call (the default for
    the deterministic stand-ins, which cannot fail transiently)."""
    if policy is None:
        return fn(*args, **kwargs)
    last: Exception | None = None
    sleep = policy.sleep_sec
    for attempt in range(max(1, policy.retries)):
        try:
            return fn(*args, **kwargs)
        except Exception as exc:  # noqa: BLE001 — endpoint errors are opaque
            last = exc
            if attempt < policy.retries - 1 and sleep > 0:
                policy.sleep_fn(sleep)
                sleep *= policy.backoff
    raise last
