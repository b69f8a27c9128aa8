"""Benchmark runner: executes the full registered query set at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": 0.1}

Each query is forced end-to-end with the ``noop`` sink (computes every
output column, no driver transfer) so timings measure the plan, not
pandas conversion.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    t_start = time.time()
    from steam_data_pipeline_spark.plans.registry import QUERIES
    from steam_data_pipeline_spark.session import get_spark

    spark = get_spark("steam-data-pipeline-bench")
    # warm the JVM + parquet footers once so per-query times are compute
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    startup = time.time() - t_start

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name, q in QUERIES.items():
        t0 = time.time()
        try:
            force(q.spark(spark, sf_dir))
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001 - a bench must finish
            failures[name] = f"{type(e).__name__}: {e}"
            timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "steam_data_pipeline_spark full query-set wall-clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
        "startup_sec": round(startup, 3),
    }
    if failures:
        out["failures"] = failures
    print(json.dumps(out))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
