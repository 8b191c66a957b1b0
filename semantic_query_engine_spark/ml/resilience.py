"""Bounded retry + error-null semantics for external-service adapters.

The reference's HTTP paths degrade, they don't crash: a failed
embedding call yields a ZERO VECTOR
(/root/reference/app/embedding_gen.py:147-148,164-166) and a failed
generation yields None (/root/reference/app/main.py:223-242).  This
module gives the pandas-UDF adapters the same contract: each BATCH
call is retried with exponential backoff, and when retries are
exhausted the batch resolves to a caller-supplied fallback instead of
an exception that would fail the task (and with it, at 100 TB, a
multi-hour stage — task-level retries re-run the whole partition; a
batch-level fallback loses one batch).

Executor-side only: the wrapper rides the UDF closure, holds no state,
and sleeps with a DETERMINISTIC schedule (no jitter) so behavior is
reproducible under test.
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable, Sequence
from typing import Optional, TypeVar

B = TypeVar("B", bound=Sequence)
R = TypeVar("R")

_LOG = logging.getLogger(__name__)

# Transient-looking failures worth re-attempting: network/IO hiccups and
# service-side errors surface as OSError subclasses (ConnectionError,
# TimeoutError, socket errors) or library RuntimeErrors.  Deterministic
# caller bugs — TypeError, ValueError, shape mismatches — are NOT here:
# retrying them wastes the backoff and falling back would silently
# convert a code bug into degraded data.
DEFAULT_RETRYABLE: tuple[type[BaseException], ...] = (
    OSError,
    TimeoutError,
    RuntimeError,
)


def with_retries(
    fn: Callable[[B], R],
    max_retries: int = 2,
    backoff_s: float = 0.1,
    on_exhausted: Optional[Callable[[B], R]] = None,
    retryable: tuple[type[BaseException], ...] = DEFAULT_RETRYABLE,
    per_row_fallback: bool = False,
) -> Callable[[B], R]:
    """Wrap a batch callable: up to max_retries re-attempts with
    backoff_s * 2^attempt sleeps on `retryable` exceptions; after
    exhaustion, log a warning and return on_exhausted(batch) (the
    error-null path) or re-raise if no fallback was given.

    Non-retryable exceptions propagate immediately — a deterministic
    bug in a user-supplied embed/generate fn should fail the job, not
    be masked as a zero-vector/NULL corpus.  Pass
    ``retryable=(Exception,)`` to restore degrade-on-anything.

    per_row_fallback=True splits an exhausted multi-row batch into
    single-row calls (each with its own retry budget) so one poisoned
    row degrades only itself, not its batch-mates.  Requires the
    fn([x1..xn]) -> [y1..yn] elementwise contract both adapters
    already follow (ml/embedder.py, ml/generator.py)."""

    def attempt_batch(batch: B) -> R:
        attempt = 0
        while True:
            try:
                return fn(batch)
            except retryable:
                if attempt >= max_retries:
                    raise
                time.sleep(backoff_s * (2**attempt))
                attempt += 1

    def wrapped(batch: B) -> R:
        try:
            return attempt_batch(batch)
        except retryable as exc:
            if per_row_fallback and hasattr(batch, "__len__") and len(batch) > 1:
                _LOG.warning(
                    "with_retries: batch of %d exhausted (%r); retrying "
                    "row-by-row to isolate the failure",
                    len(batch),
                    exc,
                )
                out: list = []
                for row in batch:
                    single = type(batch)([row]) if isinstance(batch, list) else [row]
                    try:
                        out.extend(attempt_batch(single))  # type: ignore[arg-type]
                    except retryable as row_exc:
                        if on_exhausted is None:
                            raise
                        _LOG.warning(
                            "with_retries: row exhausted; applying fallback (%r)",
                            row_exc,
                        )
                        out.extend(on_exhausted(single))  # type: ignore[arg-type]
                return out  # type: ignore[return-value]
            if on_exhausted is not None:
                # observable degradation: a silent zero-vector corpus is
                # worse than a noisy one
                _LOG.warning(
                    "with_retries: retries exhausted for batch of %s; "
                    "applying fallback (%r)",
                    len(batch) if hasattr(batch, "__len__") else "?",
                    exc,
                )
                return on_exhausted(batch)
            raise

    return wrapped


def zero_vector_fallback(dim: int) -> Callable[[list[str]], list[list[float]]]:
    """Embedding error-null: one zero vector per input text."""

    def fallback(texts: list[str]) -> list[list[float]]:
        return [[0.0] * dim for _ in texts]

    return fallback


def null_answer_fallback(batch: list[str]) -> list[Optional[str]]:
    """Generation error-null: None per prompt."""
    return [None for _ in batch]
