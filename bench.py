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
    # Warm the one-time process costs so per-query times measure the
    # plan: JVM + parquet footers, and the Python-worker pool + Arrow
    # serializer that the first pandas_udf query would otherwise pay
    # (~3-5 s of daemon spin-up, not plan cost).
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _warm(x):
        return x

    force(spark.range(0, 10_000, 1, 8).select(_warm(col("id"))))
    # pyspark.ml first use loads + JITs a large JVM class graph (ALS,
    # KMeans, BLAS) — pay it here, not inside the first ml query.
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.recommendation import ALS

    _toy = spark.createDataFrame(
        [(0, 0, 1.0), (0, 1, 2.0), (1, 0, 2.0), (1, 1, 1.0)],
        "user int, item int, strength float",
    )
    ALS(rank=2, maxIter=1, seed=1, implicitPrefs=True, userCol="user",
        itemCol="item", ratingCol="strength").fit(_toy)
    from pyspark.ml.functions import array_to_vector

    _vecs = spark.createDataFrame(
        [([0.0, 1.0],), ([1.0, 0.0],), ([0.5, 0.5],)], "embedding array<double>"
    ).select(array_to_vector(col("embedding")).alias("features"))
    KMeans(k=2, maxIter=1, seed=1).fit(_vecs)
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
        # Queries that train models / checkpoint leave cached blocks
        # behind; drop them so later timings aren't GC-noise of earlier
        # queries (the cleanup cost is excluded from every timing).
        spark.catalog.clearCache()

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
