"""The unified query registry — the engine's public query surface.

Every SURVEY.md §2 operator ID maps here to a Spark program and (where
SQL-expressible) a DuckDB oracle. ``__spark_entry__.py`` exposes this
registry to the driver.

Registry ORDER implements check-window rotation: the driver verifies a
bounded prefix of the registry each round (round 1 checked the first
50), so queries that do not yet have a green driver CORRECTNESS row —
including every newly added query, and any query whose last check
failed — sort FIRST, and already-verified queries fill the tail. The
verified set is derived from the ``CORRECTNESS_r*.json`` files the
driver leaves in the repo root, so the rotation maintains itself
round over round with no manual bookkeeping.
"""

from __future__ import annotations

import glob
import json
import os

from steam_data_pipeline_spark.plans.analytics import ANALYTICS
from steam_data_pipeline_spark.plans.base import Query, SparkQuery
from steam_data_pipeline_spark.plans.core import CORE
from steam_data_pipeline_spark.plans.extensions import EXT


def _driver_correctness_rows() -> tuple[frozenset[str], frozenset[str]]:
    """Scan the driver's per-round correctness files.

    Returns ``(hash_green, rows_only_green)``: names with a full
    value-hash match in any round, and names whose only green is the
    weaker rows-only check (the driver records ``err: "no_oracle"``
    plus the row count for queries registered without an oracle). A
    query that errored or hash-mismatched appears in neither and so
    rotates back into the checked window.
    """
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    hash_green: set[str] = set()
    rows_only_green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):  # pragma: no cover - tolerate junk
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            err = row.get("err")
            if err == "no_oracle":
                if row.get("spark_rows") is not None and row["spark_rows"] >= 0:
                    rows_only_green.add(name)
                continue
            if err:
                continue
            if row.get("oracle_rows") is not None and not (
                row.get("rows_match") and row.get("schema_match") and row.get("hash_match")
            ):
                continue
            hash_green.add(name)
    return frozenset(hash_green), frozenset(rows_only_green)


_HASH_GREEN, _ROWS_ONLY_GREEN = _driver_correctness_rows()

_ALL: dict[str, Query] = {}
for reg in (CORE, ANALYTICS, EXT):
    for name, q in reg.items():
        if name in _ALL:
            raise ValueError(f"duplicate query {name} across registries")
        _ALL[name] = q


def _is_verified(name: str) -> bool:
    """A rows-only green satisfies a query that is (still) registered
    without an oracle; a query that has since GAINED an oracle deserves
    an oracle-checked row, so its old rows-only green does not count."""
    if name in _HASH_GREEN:
        return True
    return name in _ROWS_ONLY_GREEN and _ALL[name].oracle is None


_POS = {name: i for i, name in enumerate(_ALL)}
QUERIES: dict[str, Query] = {
    name: _ALL[name]
    for name in sorted(_ALL, key=lambda n: (_is_verified(n), _POS[n]))
}


def query_map() -> dict[str, SparkQuery]:
    return {name: q.spark for name, q in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
