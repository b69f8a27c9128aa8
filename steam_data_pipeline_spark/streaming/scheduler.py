"""Scheduler-loop semantics (runner.py re-expressed; SURVEY.md §2.8
``stream_trigger_daily`` / ``stream_graceful_stop``).

The reference's runner (runner.py:22-97) computes the next daily run at
``WORKER_RUN_HOUR_UTC`` plus a random 0–120 min offset, optionally
skips the first run when the last commit message contains
``[skip-run]`` (runner.py:33-42), and sleeps interruptibly so SIGTERM
stops the loop between runs (runner.py:10-17,93-97).

In Spark deployments the trigger is external (cron firing an
``availableNow`` job) — but the gate/jitter/graceful-stop logic is
engine-agnostic and lives here, deterministic and testable: jitter is
seeded, time is injected.
"""

from __future__ import annotations

import random
import threading
from datetime import datetime, timedelta, timezone

SKIP_MARKER = "[skip-run]"  # runner.py:40
DEFAULT_RUN_HOUR_UTC = 17  # runner.py:22
JITTER_MAX_MIN = 120  # runner.py:68


def should_skip_first_run(last_commit_message: str | None) -> bool:
    """``'[skip-run]' in commit_message`` gate (runner.py:33-42)."""
    return bool(last_commit_message) and SKIP_MARKER in last_commit_message


def next_run_at(
    now: datetime,
    run_hour_utc: int = DEFAULT_RUN_HOUR_UTC,
    jitter_seed: int | None = None,
) -> datetime:
    """Next daily trigger: today at ``run_hour_utc`` (tomorrow if
    already passed), plus seeded 0–120 min jitter (runner.py:62-80).

    Clock-edge contracts (round-12 streaming module review):
    ``now`` must be timezone-aware — a naive datetime would silently be
    reinterpreted in the HOST's local zone by ``astimezone`` and the
    gate would fire hours off, so it is rejected loudly. ``now``
    exactly AT the trigger hour schedules TOMORROW (``base <= now``,
    runner.py:75). A fixed ``jitter_seed`` draws the SAME jitter every
    call (reproducible tests); production passes None for a fresh
    draw per scheduling decision, like the reference."""
    if now.tzinfo is None:
        raise ValueError(
            "next_run_at requires a timezone-aware datetime; a naive one "
            "would be reinterpreted in the host's local zone"
        )
    if not 0 <= run_hour_utc <= 23:
        raise ValueError(f"run_hour_utc must be 0..23, got {run_hour_utc}")
    base = now.astimezone(timezone.utc).replace(
        hour=run_hour_utc, minute=0, second=0, microsecond=0
    )
    if base <= now:
        base += timedelta(days=1)  # runner.py:75
    rng = random.Random(jitter_seed)
    return base + timedelta(minutes=rng.uniform(0, JITTER_MAX_MIN))


class ScheduledRunner:
    """Daily-trigger loop with cooperative shutdown.

    ``stop()`` (the SIGTERM handler's job) interrupts the wait
    immediately — the reference's ``asyncio.wait_for(shutdown_event
    .wait(), timeout)`` pattern (runner.py:93-97) on a thread Event.
    """

    def __init__(self, run_fn, run_hour_utc: int = DEFAULT_RUN_HOUR_UTC, jitter_seed: int | None = None):
        self.run_fn = run_fn
        self.run_hour_utc = run_hour_utc
        self.jitter_seed = jitter_seed
        self._shutdown = threading.Event()
        self.runs = 0

    def stop(self) -> None:
        self._shutdown.set()

    def run_loop(
        self,
        max_runs: int | None = None,
        now_fn=lambda: datetime.now(timezone.utc),
        skip_first: bool = False,
    ) -> int:
        first = True
        while not self._shutdown.is_set():
            if max_runs is not None and self.runs >= max_runs:
                break
            if first and skip_first:
                first = False
            else:
                first = False
                self.run_fn()
                self.runs += 1
                if max_runs is not None and self.runs >= max_runs:
                    break
            target = next_run_at(now_fn(), self.run_hour_utc, self.jitter_seed)
            wait_s = max((target - now_fn()).total_seconds(), 0.0)
            if self._shutdown.wait(timeout=wait_s):
                break  # graceful stop between runs
        return self.runs
