"""A custom Python DataSource modeling the reference's paginated API
catalog fetch (SURVEY.md §2.1 src_paginated_limit; reference main.py's
page-loop scraper) as a first-class Spark source.

The reference fetches the catalog page by page with bounded retry; the
Spark-native re-expression makes each PAGE an input partition, so page
fetches parallelize across executors and a failed page retries as a
task (plus the reference's own in-process bounded-retry contract from
``streaming.retry`` around each fetch). The "API" here is a
deterministic local function of (page, page_size) so the source is
oracle-checkable end-to-end; swapping ``_fetch_page`` for a real HTTP
call changes nothing else — partition planning, schema, retry, and
the executor-side iterator protocol are the real thing.

Usage::

    spark.dataSource.register(PaginatedApiDataSource)
    df = (spark.read.format("paginated_api")
          .option("total", "1000").option("page_size", "100").load())
"""

from __future__ import annotations

import threading
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = "app_id bigint, name string, page int"


class PagePartition(InputPartition):
    def __init__(self, page: int, start: int, end: int):
        self.page = page
        self.start = start
        self.end = end


def _fetch_page(page: int, start: int, end: int, flaky: bool) -> list[tuple]:
    """The 'API call' for one page — deterministic rows. With
    ``flaky``, the first attempt per task raises a retriable 503 so the
    bounded-retry contract is exercised on the executor."""
    from steam_data_pipeline_spark.streaming.retry import TransientError, call_with_retry

    state = {"calls": 0}

    def fetch():
        state["calls"] += 1
        if flaky and state["calls"] == 1:
            raise TransientError(503, f"synthetic throttle on page {page}")
        return [(i, f"app-{i:06d}", page) for i in range(start, end)]

    outcome = call_with_retry(fetch, base_delay=0.0, seed=0, sleep_fn=lambda d: None)
    if outcome.empty:
        return []  # 404-style terminal empty page: zero rows, not an error
    if outcome.value is None:
        raise RuntimeError(f"page {page} failed after {outcome.attempts} attempts")
    return outcome.value


class PaginatedApiReader(DataSourceReader):
    def __init__(self, options: dict):
        self.total = int(options.get("total", "1000"))
        self.page_size = int(options.get("page_size", "100"))
        self.flaky = options.get("flaky", "false").lower() == "true"

    def partitions(self) -> list[InputPartition]:
        """One input partition per API page — the unit of parallelism
        AND of task retry, mirroring the reference's per-page fetch
        loop but distributed."""
        pages = []
        page = 0
        start = 0
        while start < self.total:
            end = min(start + self.page_size, self.total)
            pages.append(PagePartition(page, start, end))
            page += 1
            start = end
        return pages

    def read(self, partition: PagePartition) -> Iterator[tuple]:
        yield from _fetch_page(
            partition.page, partition.start, partition.end, self.flaky
        )


class PaginatedApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paginated_api"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> PaginatedApiReader:
        return PaginatedApiReader(self.options)

    def simpleStreamReader(self, schema) -> "PaginatedApiStreamReader":
        return PaginatedApiStreamReader(self.options)


_REGISTER_LOCK = threading.Lock()


def register(spark) -> None:
    """Idempotent per-session registration (thread-safe: concurrent
    callers — e.g. parallel bench warmups — serialize on a lock, so
    the registration work runs exactly once). Ships the package to
    Python workers first — the DataSource classes are pickled by
    reference and must be importable executor-side even when the
    driver process runs outside the repo."""
    from steam_data_pipeline_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)
    with _REGISTER_LOCK:
        _register_locked(spark)


def _register_locked(spark) -> None:
    if getattr(spark, "_sdp_paginated_registered", False):
        return
    # Pickle this module's classes BY VALUE: the batch reader runs in
    # task workers (which get the addPyFile zip), but the STREAMING
    # source runner is its own Python process without pyFiles on its
    # path — a by-reference pickle raises ModuleNotFoundError there.
    import steam_data_pipeline_spark.sources.paginated as _mod
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_mod)
    spark.dataSource.register(PaginatedApiDataSource)
    spark._sdp_paginated_registered = True


class PaginatedApiStreamReader(SimpleDataSourceStreamReader):
    """STREAMING flavor of the paginated fetch: each micro-batch reads
    ONE page, the committed offset is the next page index, and replay
    (``readBetweenOffsets``) re-fetches deterministically — the
    exactly-once ingestion loop the reference runs daily, as a real
    Structured Streaming source. Past the last page every batch is
    empty (a live API would keep polling for new entries)."""

    def __init__(self, options: dict):
        self.total = int(options.get("total", "1000"))
        self.page_size = int(options.get("page_size", "100"))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def _page_rows(self, page: int) -> list[tuple]:
        # self-contained row synthesis (no package imports): the
        # streaming source runner is a separate Python process that
        # does NOT see addPyFile zips, so this class must execute
        # without importing the package (it is pickled by value via
        # register(), see below)
        start = page * self.page_size
        end = min(start + self.page_size, self.total)
        return [(i, f"app-{i:06d}", page) for i in range(start, end)]

    def read(self, start: dict):
        page = start["next"]
        rows = self._page_rows(page)
        if not rows:
            return iter([]), start  # drained: offset does not advance
        return iter(rows), {"next": page + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows: list[tuple] = []
        for page in range(start["next"], end["next"]):
            rows.extend(self._page_rows(page))
        return iter(rows)
