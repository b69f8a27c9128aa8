"""Unit tests for the bounded-retry contract (stream_retry_backoff;
reference main.py:115-182). Pure Python — no Spark session needed."""

from __future__ import annotations

import pytest

from steam_data_pipeline_spark.streaming.retry import (
    BASE_DELAY,
    MAX_RETRIES,
    RETRIABLE_STATUSES,
    TransientError,
    backoff_schedule,
    call_with_retry,
    classify_status,
    retrying_foreach_batch,
)


def test_reference_constants():
    # main.py:53, 117-118
    assert RETRIABLE_STATUSES == {403, 407, 429, 500, 502, 503, 504}
    assert MAX_RETRIES == 3
    assert BASE_DELAY == 10.0


def test_classify():
    assert classify_status(404) == "empty"
    assert classify_status(429) == "retriable"
    assert classify_status(503) == "retriable"
    assert classify_status(400) == "fatal"
    assert classify_status(401) == "fatal"


def test_backoff_schedule_deterministic_and_exponential():
    s1 = backoff_schedule(3, 10.0, seed=0)
    s2 = backoff_schedule(3, 10.0, seed=0)
    assert s1 == s2  # seeded → reproducible
    assert len(s1) == 2  # retries between 3 attempts
    # delay k in [base*2^k, base*2^k + 1) — main.py:175
    assert 10.0 <= s1[0] < 11.0
    assert 20.0 <= s1[1] < 21.0
    assert backoff_schedule(3, 10.0, seed=1) != s1


def test_success_first_try_no_sleep():
    out = call_with_retry(lambda: "ok", sleep_fn=lambda d: None)
    assert out.value == "ok"
    assert out.attempts == 1
    assert not out.gave_up and not out.empty
    assert out.slept == []


def test_retriable_then_success():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise TransientError(503)
        return "recovered"

    slept = []
    out = call_with_retry(flaky, sleep_fn=slept.append, seed=0)
    assert out.value == "recovered"
    assert out.attempts == 3
    assert slept == backoff_schedule(3, 10.0, seed=0)


def test_gives_up_after_max_retries():
    calls = {"n": 0}

    def always_503():
        calls["n"] += 1
        raise TransientError(503)

    out = call_with_retry(always_503, sleep_fn=lambda d: None)
    assert out.value is None
    assert out.gave_up
    assert out.attempts == MAX_RETRIES == calls["n"]
    assert len(out.slept) == MAX_RETRIES - 1


def test_404_is_terminal_empty_no_retry():
    calls = {"n": 0}

    def not_found():
        calls["n"] += 1
        raise TransientError(404)

    out = call_with_retry(not_found, sleep_fn=lambda d: None)
    assert out.value is None
    assert out.empty and not out.gave_up  # main.py:158-160
    assert calls["n"] == 1
    assert out.slept == []


def test_fatal_client_error_no_retry():
    calls = {"n": 0}

    def unauthorized():
        calls["n"] += 1
        raise TransientError(401)

    out = call_with_retry(unauthorized, sleep_fn=lambda d: None)
    assert out.value is None
    assert out.gave_up and calls["n"] == 1  # main.py:179-181


def test_network_error_is_retriable():
    calls = {"n": 0}

    def drops_once():
        calls["n"] += 1
        if calls["n"] == 1:
            raise ConnectionError("reset")
        return 7

    out = call_with_retry(drops_once, sleep_fn=lambda d: None)
    assert out.value == 7
    assert out.attempts == 2


def test_foreach_batch_retries_then_succeeds():
    calls = []

    def write(df, batch_id):
        calls.append(batch_id)
        if len(calls) < 3:
            raise IOError("sink hiccup")

    slept = []
    writer = retrying_foreach_batch(write, sleep_fn=slept.append, seed=0)
    writer(None, 17)
    assert calls == [17, 17, 17]
    assert slept == backoff_schedule(3, 10.0, seed=0)


def test_foreach_batch_reraises_after_exhaustion():
    gave_up = []

    def write(df, batch_id):
        raise IOError("dead sink")

    writer = retrying_foreach_batch(
        write,
        sleep_fn=lambda d: None,
        on_give_up=lambda bid, exc: gave_up.append((bid, type(exc).__name__)),
    )
    with pytest.raises(IOError):
        writer(None, 5)
    assert gave_up == [(5, "OSError")]


def test_foreach_batch_fatal_error_no_retry():
    """Deterministic failures (store guards, analysis errors) surface
    immediately instead of burning the full backoff schedule."""
    attempts = []
    gave_up = []
    slept = []

    def write(df, batch_id):
        attempts.append(batch_id)
        raise ValueError("bucket-count mismatch")

    writer = retrying_foreach_batch(
        write,
        sleep_fn=slept.append,
        on_give_up=lambda bid, exc: gave_up.append((bid, type(exc).__name__)),
    )
    with pytest.raises(ValueError):
        writer(None, 7)
    assert attempts == [7]  # exactly one attempt
    assert slept == []  # and no sleeping
    assert gave_up == [(7, "ValueError")]


def test_foreach_batch_fatal_fn_override():
    """A custom classifier can mark any exception fatal."""
    attempts = []

    def write(df, batch_id):
        attempts.append(batch_id)
        raise OSError("disk on fire")

    writer = retrying_foreach_batch(
        write, sleep_fn=lambda d: None, fatal_fn=lambda e: isinstance(e, OSError)
    )
    with pytest.raises(OSError):
        writer(None, 1)
    assert attempts == [1]
