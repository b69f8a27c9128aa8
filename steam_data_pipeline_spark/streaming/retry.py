"""Bounded retry with exponential backoff (SURVEY.md §2.8
``stream_retry_backoff``).

The reference wraps every source fetch in ``make_request_with_retry``
(main.py:115-182): 3 attempts max, ``delay = base * 2**attempt`` plus
0-1 s jitter, a fixed retriable-status set (main.py:53), 404 treated as
a terminal *empty* response (main.py:158-160), network errors retried,
and other client errors (400/401) abandoned immediately.

In a Spark engine the same concern appears at two seams:

* driver-side source fetches (pagination loops feeding ``spark.
  createDataFrame`` / file listings), wrapped with ``call_with_retry``;
* per-micro-batch sink writes inside ``foreachBatch``, wrapped with
  ``retrying_foreach_batch`` — a failed batch write is retried with the
  same bounded schedule before the stream is allowed to fail (at which
  point Spark's checkpoint replays the batch, so the write must be
  idempotent — see streaming.ingest).

Everything is deterministic and injectable: jitter is seeded, sleeping
goes through ``sleep_fn``, and the outcome records every attempt and
planned delay so tests can assert the exact schedule.
"""

from __future__ import annotations

import random
import time
from collections.abc import Callable
from dataclasses import dataclass, field

# main.py:53 — statuses worth retrying (throttle/proxy/server errors).
RETRIABLE_STATUSES = frozenset({403, 407, 429, 500, 502, 503, 504})
# main.py:158-160 — a 404 is a terminal, non-error empty response.
EMPTY_STATUSES = frozenset({404})

MAX_RETRIES = 3  # main.py:117 — total attempts, not extra retries
BASE_DELAY = 10.0  # main.py:118


class TransientError(Exception):
    """A failure carrying an HTTP-like status for classification."""

    def __init__(self, status: int, msg: str = ""):
        super().__init__(msg or f"status {status}")
        self.status = status


def classify_status(status: int) -> str:
    """``'empty' | 'retriable' | 'fatal'`` per the reference's rules."""
    if status in EMPTY_STATUSES:
        return "empty"
    if status in RETRIABLE_STATUSES:
        return "retriable"
    return "fatal"


def backoff_schedule(
    max_retries: int = MAX_RETRIES,
    base_delay: float = BASE_DELAY,
    seed: int | None = 0,
) -> list[float]:
    """Planned sleep before retry k (k=1..max_retries-1):
    ``base * 2**(k-1) + jitter(0,1)`` (main.py:175). Seeded → the whole
    schedule is reproducible."""
    rng = random.Random(seed)
    return [
        base_delay * (2**attempt) + rng.uniform(0, 1)
        for attempt in range(max_retries - 1)
    ]


@dataclass
class RetryOutcome:
    """What happened: final value (None on empty/give-up), attempt
    count, whether we exhausted retries, and the delays actually slept."""

    value: object | None
    attempts: int
    gave_up: bool
    empty: bool = False
    slept: list[float] = field(default_factory=list)


def call_with_retry(
    fn: Callable[[], object],
    *,
    max_retries: int = MAX_RETRIES,
    base_delay: float = BASE_DELAY,
    seed: int | None = 0,
    sleep_fn: Callable[[float], None] = time.sleep,
    network_errors: tuple[type[BaseException], ...] = (ConnectionError, TimeoutError),
) -> RetryOutcome:
    """Run ``fn`` with the reference's retry contract.

    ``fn`` either returns a value (success), raises ``TransientError``
    (classified by status: empty → stop with None, retriable → backoff
    and retry, fatal → stop with None immediately), or raises one of
    ``network_errors`` (always retriable, main.py:165-169).
    """
    if max_retries < 1:
        raise ValueError(f"max_retries must be >= 1, got {max_retries}")
    schedule = backoff_schedule(max_retries, base_delay, seed)
    slept: list[float] = []
    for attempt in range(max_retries):
        try:
            return RetryOutcome(fn(), attempts=attempt + 1, gave_up=False, slept=slept)
        except TransientError as e:
            kind = classify_status(e.status)
            if kind == "empty":
                return RetryOutcome(
                    None, attempts=attempt + 1, gave_up=False, empty=True, slept=slept
                )
            if kind == "fatal":
                return RetryOutcome(None, attempts=attempt + 1, gave_up=True, slept=slept)
        except network_errors:
            pass  # retriable (main.py:165-169)
        if attempt < max_retries - 1:
            delay = schedule[attempt]
            slept.append(delay)
            sleep_fn(delay)
    return RetryOutcome(None, attempts=max_retries, gave_up=True, slept=slept)


def is_deterministic_failure(e: BaseException) -> bool:
    """True for failures that retrying cannot fix: programming/contract
    errors (``ValueError``-family, e.g. the ParquetTableStore bucket
    guards) and Spark analysis/argument errors. Mirrors how
    ``call_with_retry`` separates fatal from retriable statuses — a
    doomed batch should surface immediately, not after the full backoff
    schedule of real ``time.sleep``.
    """
    if isinstance(e, (ValueError, TypeError, KeyError, AssertionError)):
        return True
    try:
        from pyspark.errors import AnalysisException, IllegalArgumentException

        if isinstance(e, (AnalysisException, IllegalArgumentException)):
            return True
    except ImportError:  # pragma: no cover - pyspark always present here
        pass
    return False


def retrying_foreach_batch(
    write_fn: Callable,
    *,
    max_retries: int = MAX_RETRIES,
    base_delay: float = BASE_DELAY,
    seed: int | None = 0,
    sleep_fn: Callable[[float], None] = time.sleep,
    on_give_up: Callable[[int, BaseException], None] | None = None,
    fatal_fn: Callable[[BaseException], bool] = is_deterministic_failure,
):
    """Wrap a ``foreachBatch`` writer with the bounded-retry contract.

    Exceptions from ``write_fn`` are classified by ``fatal_fn``:
    deterministic failures (analysis errors, the store's ValueError
    guards) re-raise immediately; anything else is treated as a
    retriable sink hiccup. After ``max_retries`` failed attempts the
    last exception is re-raised so Structured Streaming fails the batch
    and the checkpoint replays it on restart — the write must therefore
    be idempotent (streaming.ingest writes per-batch subdirectories).

    .. warning:: The DEFAULT ``fatal_fn`` (``is_deterministic_failure``)
       fails the batch on attempt 1 for whole exception families —
       ``ValueError``, ``TypeError``, ``KeyError``, ``AssertionError``,
       and Spark analysis errors — on the grounds that retrying a
       programming error only delays the failure. If you wrap a
       third-party sink whose TRANSIENT failures can surface as one of
       those types (e.g. a flaky metadata lookup raising ``KeyError``),
       pass ``fatal_fn=lambda e: False`` to restore retry-everything,
       or a classifier that inspects the exception, not just its type.
    """
    if max_retries < 1:
        # caught at wrap time, not first-batch time: a zero-attempt
        # writer would reach `raise last` with last=None (round-12
        # streaming module review)
        raise ValueError(f"max_retries must be >= 1, got {max_retries}")

    def _writer(batch_df, batch_id: int):
        schedule = backoff_schedule(max_retries, base_delay, seed)
        last: Exception | None = None
        for attempt in range(max_retries):
            try:
                write_fn(batch_df, batch_id)
                return
            except Exception as e:  # KeyboardInterrupt/SystemExit propagate
                last = e
                if fatal_fn(e):
                    if on_give_up is not None:
                        on_give_up(batch_id, e)
                    raise
            if attempt < max_retries - 1:
                sleep_fn(schedule[attempt])
        if on_give_up is not None:
            last_exc = last if last is not None else RuntimeError("unknown")
            on_give_up(batch_id, last_exc)
        raise last  # type: ignore[misc]

    return _writer
