"""KV run-state semantics (SURVEY.md §2.1 ``state_kv_rw``; main.py:107-111).

The reference uses a 2-column table as a distributed lock + run journal:
``is_scraping_active`` / ``last_started_utc`` (main.py:387-404), with a
2-hour staleness takeover (main.py:392-394).

In Spark the *real* home for this is the streaming checkpoint (a
running query is its own lock); this module keeps the explicit KV
semantics available as (a) a pure DataFrame upsert used by the oracle
query, and (b) a tiny file-backed journal used by the batch pipeline
to reproduce the lock/staleness protocol.
"""

from __future__ import annotations

import fcntl
import json
import os
from contextlib import contextmanager
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame

from steam_data_pipeline_spark.operators.upsert import merge_upsert

LOCK_KEY = "is_scraping_active"
STARTED_KEY = "last_started_utc"
STALE_AFTER = timedelta(hours=2)  # main.py:393


def kv_upsert(state: DataFrame | None, writes: DataFrame) -> DataFrame:
    """Apply a batch of KV writes (``db.merge`` semantics, main.py:398-402):
    new value wins per key, untouched keys survive."""
    return merge_upsert(state, writes, key="key")


class TtlCache:
    """Refresh-before-expiry memo (SURVEY §2.8 ``stream_token_ttl_cache``;
    main.py:43,184-213): a cached value is reused until 0.9× its
    lifetime has elapsed, then refreshed — the reference's Twitch-token
    cache discipline. Driver-side ops concern; injectable clock for
    determinism."""

    REFRESH_FRACTION = 0.9  # main.py:210

    def __init__(self, fetch, ttl_s: float = 3600.0, now=None):
        import time as _time

        self.fetch = fetch
        self.default_ttl = ttl_s  # main.py:206 default expires_in
        self.now = now or _time.monotonic
        self._value = None
        self._expires_at = None

    def get(self):
        t = self.now()
        if self._expires_at is None or t >= self._expires_at:
            value, ttl = self.fetch()
            self._value = value
            self._expires_at = t + self.REFRESH_FRACTION * (ttl or self.default_ttl)
        return self._value


class FileRunJournal:
    """Single-writer lock + journal file (the checkpoint-as-lock analog).

    ``acquire`` fails if an active, non-stale lock exists — mirroring
    main.py:389-396 (stale after 2 h ⇒ takeover). The check-and-set is
    serialized through an OS-level ``flock`` on a sidecar file, so two
    concurrent acquirers cannot both observe "unlocked" — the reference
    gets the same guarantee from its DB session (main.py:398-402).
    """

    def __init__(self, path: str):
        self.path = path

    @contextmanager
    def _flock(self):
        fd = os.open(self.path + ".lock", os.O_CREAT | os.O_RDWR, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)

    def _read(self) -> dict:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def _write(self, state: dict) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.path)

    def acquire(self, now: datetime | None = None) -> bool:
        now = now or datetime.now(timezone.utc)
        with self._flock():
            state = self._read()
            if state.get(LOCK_KEY) == "true":
                started = state.get(STARTED_KEY)
                if started:
                    age = now - datetime.fromisoformat(started)
                    if age <= STALE_AFTER:
                        return False  # held and fresh → abort (main.py:395-396)
            state[LOCK_KEY] = "true"
            state[STARTED_KEY] = now.isoformat()
            self._write(state)
            return True

    def release(self) -> None:
        with self._flock():
            state = self._read()
            state[LOCK_KEY] = "false"  # main.py:489
            self._write(state)
