"""Generate QUERY_CATALOG.md from the live query registry."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from steam_data_pipeline_spark.plans.registry import QUERIES  # noqa: E402

HEADER = """# QUERY CATALOG — the engine's registered query surface

Auto-generated from `steam_data_pipeline_spark/plans/registry.py`
(`python tools/gen_catalog.py > QUERY_CATALOG.md`). One row per entry
in `__spark_entry__.queries()`; **oracle** = ✓ when the driver checks
the query value-exactly against DuckDB (`oracle_sql()`), *rows* when
the op is not SQL-expressible in the oracle engine (seeded xxhash64
hashing, approximate/iterative algorithms) and the driver records the
weaker rows-only check.

SURVEY.md §2 operator IDs not listed here verbatim are covered by the
consolidations asserted in
`tests/test_registry_oracle.py::test_registry_covers_survey_inventory`
(e.g. the scalar-function IDs fold into `fn_scalar_suite` /
`fn_datetime_suite`; ops-layer behaviors like the scheduler loop,
TTL cache, and graceful stop live in `streaming/scheduler.py` and
`operators/state.py` with dedicated tests).
"""


def main() -> None:
    print(HEADER)
    print(f"{len(QUERIES)} queries, "
          f"{sum(1 for q in QUERIES.values() if q.oracle)} oracle-checked.\n")
    print("| query | oracle | tags | what it does |")
    print("|---|---|---|---|")
    # canonical (alphabetical) order: the registry dict's runtime order
    # encodes the driver's check-window rotation, which shifts round to
    # round — the committed catalog should not churn with it
    for name in sorted(QUERIES):
        q = QUERIES[name]
        oracle = "✓" if q.oracle else "rows"
        doc = " ".join(q.doc.split())
        tags = ", ".join(q.tags)
        print(f"| `{name}` | {oracle} | {tags} | {doc} |")


if __name__ == "__main__":
    main()
