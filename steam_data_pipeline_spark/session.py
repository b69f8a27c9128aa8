"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads)
but every setting here is chosen to also make sense on a large cluster:

* AQE on (runtime shuffle coalescing, skew-join splitting, plan
  re-optimization) — the 100 TB posture is "declare the plan, let the
  runtime adapt".
* ``spark.sql.shuffle.partitions`` sized to the local core count; on a
  real cluster AQE coalesces the (deliberately generous) initial
  number down to data-proportional partitions.
* Arrow enabled for every pandas interchange (Pandas UDFs,
  ``applyInPandas``, ``toPandas``) — vectorized columnar transfer, not
  row pickling.
* Session timezone pinned to UTC: the reference stores timezone-aware
  UTC timestamps (main.py:89,95); pinning the session tz makes
  TimestampType arithmetic and string formatting reproducible
  everywhere.
* ``spark.sql.legacy.parquet.nanosAsLong=true``: the driver testdata
  stores ``events.ts`` as parquet TIMESTAMP(NANOS) which Spark 4
  otherwise refuses to read; we read the raw int64 nanoseconds and
  convert with exact integer arithmetic (see ``sources.tables``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Configs that are safe (and desirable) to apply to an externally
# provided session at runtime — all of these are dynamic SQL confs.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.optimizer.nestedSchemaPruning.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # InferFiltersFromGenerate turns every explode(f(x)) into
    # Filter(size(f(x)) > 0) + explode(f(x)) — for the expensive
    # generators this engine is built on (shingle pipelines: split ->
    # transform -> xxhash64 per element) the inferred filter re-runs
    # the whole generator expression per row for zero pruning benefit
    # (explode drops empty arrays itself, and a filter over a computed
    # expression can't reach the parquet scan). Measured 2-5x on every
    # shingle-explode consumer (sf0.1 shingle scan 5.8 s -> 1.2 s).
    "spark.sql.optimizer.excludedRules": (
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    ),
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on Python WORKERS via ``addPyFile``.

    Functions executed in Pandas UDFs / applyInPandas / mapInPandas are
    cloudpickled *by reference* to their defining module — the worker
    must be able to import ``steam_data_pipeline_spark``. When the
    host process runs from an arbitrary cwd (the driver's verify does),
    the repo is on the driver's ``sys.path`` but not the workers'.
    Shipping a zip of the package through ``addPyFile`` fixes that for
    local mode and real clusters alike.
    """
    if getattr(spark, "_sdp_pkg_shipped", False):
        return
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        "/tmp", f"steam_data_pipeline_spark-{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        z.write(full, rel)
    try:
        spark.sparkContext.addPyFile(zpath)
    except Exception:  # pragma: no cover - e.g. duplicate add on some builds
        pass
    spark._sdp_pkg_shipped = True


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply dynamic confs to a session we did not build (driver's).

    Idempotent per session object: each ``conf.set`` is a py4j round
    trip (~0.2-0.6 ms), and this runs on EVERY ``read_table`` call —
    across a full 298-query registry run that is thousands of calls
    re-setting values that never change (measured 3-10 ms per
    application). The in-package code that overrides one of these keys
    (``_conf_overrides``, the streaming fixture's shuffle-partition
    scope) always restores the previous value in a ``finally``, so
    apply-once is equivalent to apply-every-time.
    """
    if getattr(spark, "_sdp_confs_applied", False):
        ship_package(spark)
        return spark
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - immutable conf on some builds
            pass
    spark._sdp_confs_applied = True
    ship_package(spark)
    return spark


def get_spark(app_name: str = "steam-data-pipeline-spark") -> SparkSession:
    """Build (or fetch) the session used by tests and bench runs."""
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", "/tmp/spark-warehouse")
        # The generated-class cache defaults to 100 entries; a full
        # registry run compiles far more shapes than that, so the
        # warmed heavy expressions (MinHash folds, ALS/KMeans, Jaccard
        # prefixes) get evicted mid-run and late queries pay a full
        # janino recompile + JIT again (measured: the same ML queries
        # run 2x slower late in a 130-query session than early). Static
        # conf — must be set before the first session builds.
        .config("spark.sql.codegen.cache.maxEntries", "4000")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # When getOrCreate returns a pre-existing session the builder confs
    # are ignored; re-apply the dynamic subset.
    apply_runtime_confs(spark)
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
