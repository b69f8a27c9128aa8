"""Registry-wide physical-plan inventory → PLAN_AUDIT.json.

Builds (never executes) every registered query's physical plan at the
smoke SF and records the plan-shape facts the SCALE.md claims rest on:
exchange counts, join strategies, Python-crossing operators, window
and aggregate counts. Committing the output makes plan DRIFT diffable
round-over-round the same way BENCH_DETAIL.json made per-query wall
time diffable — a silently de-broadcast join or a new shuffle shows up
as a one-line JSON diff in review, before it shows up as a regression
at scale.

Usage:
    python tools/plan_audit.py [--sf-dir /root/testdata/sf0.001]

Counters per query (substring counts over explain("simple")):
  x_hash   Exchange hashpartitioning   (keyed shuffles)
  x_single Exchange SinglePartition    (global/spine collapses)
  x_range  Exchange rangepartitioning  (global sorts)
  bhj/smj/bnlj/shj  join strategies
  cartesian          CartesianProduct (banned; TestGlobalPlanAudit)
  arrow_py  ArrowEvalPython            (vectorized scalar UDF)
  pandas_gm FlatMapGroupsInPandas/MapInPandas/CoGrouped (grouped maps)
  rowwise_py BatchEvalPython           (banned row-at-a-time path)
  window/agg Window + HashAggregate operators (exact: ObjectHashAggregate
             and WindowGroupLimit are counted separately as obj_agg/wgl,
             not folded in — an agg flipping hash->object is a memory-
             behavior change worth seeing in the diff)
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COUNTERS = {
    "x_hash": "Exchange hashpartitioning",
    "x_single": "Exchange SinglePartition",
    "x_range": "Exchange rangepartitioning",
    "bhj": "BroadcastHashJoin",
    "smj": "SortMergeJoin",
    "bnlj": "BroadcastNestedLoopJoin",
    "shj": "ShuffledHashJoin",
    "cartesian": "CartesianProduct",
    "arrow_py": "ArrowEvalPython",
    "rowwise_py": "BatchEvalPython",
    "obj_agg": "ObjectHashAggregate",
    "wgl": "WindowGroupLimit",
}
PANDAS_OPS = (
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "FlatMapCoGroupsInPandas",
)


def audit(sf_dir: str) -> dict:
    from steam_data_pipeline_spark.plans.registry import QUERIES
    from steam_data_pipeline_spark.session import get_spark

    spark = get_spark("plan-audit")
    out: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name, q in sorted(QUERIES.items()):
        try:
            buf = io.StringIO()
            with redirect_stdout(buf):
                q.spark(spark, sf_dir).explain("simple")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001 - record, keep auditing
            errors[name] = f"{type(e).__name__}: {str(e)[:160]}"
            continue
        row = {k: plan.count(v) for k, v in COUNTERS.items()}
        # disambiguate substring collisions: "HashAggregate" is a
        # suffix of "ObjectHashAggregate", "Window" a prefix of
        # "WindowGroupLimit"
        row["agg"] = plan.count("HashAggregate") - row["obj_agg"]
        row["window"] = plan.count("Window") - row["wgl"]
        row["pandas_gm"] = sum(plan.count(p) for p in PANDAS_OPS)
        out[name] = {k: v for k, v in row.items() if v}
    spark.stop()
    return {"sf_dir": sf_dir, "queries": out, "errors": errors}


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = p.parse_args()
    result = audit(args.sf_dir)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLAN_AUDIT.json",
    )
    with open(path, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
        fh.write("\n")
    n = len(result["queries"])
    bad = {
        k: v
        for k, v in result["queries"].items()
        if v.get("cartesian") or v.get("rowwise_py")
    }
    print(f"audited {n} queries -> {path}")
    print(f"banned patterns: {bad or 'none'}")
    if result["errors"]:
        print(f"errors: {result['errors']}")


if __name__ == "__main__":
    main()
