"""Multi-dimensional data layout: z-order (Morton) clustering.

At 100 TB, which rows share a file decides how much a selective scan
reads. Sorting by ONE column gives perfect min/max pruning on that
column and none on any other; interleaving the bits of k columns
(z-order, the technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`)
gives every interleaved column partial locality, so a 2-D box
predicate prunes on file-level min/max statistics in BOTH dimensions.

Everything is JVM-side expression work: normalize each column to a
fixed-width integer grid, interleave bits with a higher-order
`aggregate` over bit positions, then `repartitionByRange` +
`sortWithinPartitions` on the z-value so parquet writes carry tight
per-file min/max ranges. No UDFs, no driver data movement (the
normalization bounds are one 2-scalar aggregate per column).

Reference parity: no analog in Jiawei57/steam-data-pipeline (storage
there is a row-store via SQLAlchemy); this is part of the engine's
100 TB storage-layout surface next to partitioning/bucketing
(src_partition_pruned, sink bucketing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: bits per dimension: 16 bits × 2 dims = 32-bit z-values, and every
#: intermediate (getbit × 2^(2b+1) ≤ 2^33) stays far inside the 2^53
#: double-exact range the pow()-based shift relies on.
DEFAULT_BITS = 16


def grid_scale(col: Column, lo: Column, hi: Column, bits: int = DEFAULT_BITS) -> Column:
    """Normalize a numeric column onto the [0, 2^bits) integer grid
    given its (lo, hi) bounds — linear min/max scaling, clamped, so new
    data slightly outside historical bounds still lands on the edge
    cells instead of corrupting the interleave."""
    n_cells = F.lit(float(1 << bits))
    span = (hi - lo).cast("double")
    scaled = F.floor(
        (col.cast("double") - lo.cast("double")) / F.greatest(span, F.lit(1e-12)) * n_cells
    ).cast("long")
    # NULL values route to cell 0 EXPLICITLY, branching on the INPUT:
    # least(NULL, k) skips the NULL (so a coalesce after the clamp is
    # too late) and would silently park every NULL row in the TOP
    # cell, stretching the max-corner files' min/max ranges and
    # degrading the pruning this layout exists for (profile.py
    # documents the same least()-vs-NULL trap for histogram binning).
    clamped = F.greatest(
        F.lit(0).cast("long"),
        F.least(scaled, F.lit((1 << bits) - 1).cast("long")),
    )
    return F.when(col.isNull(), F.lit(0).cast("long")).otherwise(clamped)


def zorder_value(x: Column, y: Column, bits: int = DEFAULT_BITS) -> Column:
    """Interleave the low `bits` bits of two grid coordinates into one
    Morton code: bit b of x lands at position 2b, bit b of y at 2b+1.
    Pure higher-order expression (aggregate over bit positions with
    getbit); the pow-based shift is exact because every term is < 2^53.
    """
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + (F.getbit(x, b).cast("long") * F.pow(F.lit(2.0), (2 * b).cast("double")).cast("long"))
        + (F.getbit(y, b).cast("long") * F.pow(F.lit(2.0), (2 * b + 1).cast("double")).cast("long")),
    )


def with_zorder(
    df: DataFrame, xcol: str, ycol: str, bits: int = DEFAULT_BITS, z_name: str = "__z"
) -> DataFrame:
    """Append the Morton code of (xcol, ycol). Bounds come from ONE
    two-scalar aggregate joined back as a broadcast literal row — the
    same bounded-driver-data doctrine as IVF centroids."""
    bounds = df.agg(
        F.min(xcol).alias("__xlo"),
        F.max(xcol).alias("__xhi"),
        F.min(ycol).alias("__ylo"),
        F.max(ycol).alias("__yhi"),
    )
    with_b = df.crossJoin(F.broadcast(bounds))
    z = zorder_value(
        grid_scale(F.col(xcol), F.col("__xlo"), F.col("__xhi"), bits),
        grid_scale(F.col(ycol), F.col("__ylo"), F.col("__yhi"), bits),
        bits,
    )
    return with_b.withColumn(z_name, z).drop("__xlo", "__xhi", "__ylo", "__yhi")


def write_zordered(
    df: DataFrame,
    path: str,
    xcol: str,
    ycol: str,
    n_files: int,
    bits: int = DEFAULT_BITS,
) -> None:
    """Write `df` as `n_files` parquet files clustered by the z-order
    of (xcol, ycol): range-partition on the z-value (contiguous,
    balanced z-ranges per file) and sort within each partition so
    row-group min/max stats are tight in both dimensions."""
    zdf = with_zorder(df, xcol, ycol, bits)
    (
        zdf.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_skipping_stats(path: str, predicates: dict[str, tuple]) -> dict:
    """Footer-only audit of how well a layout prunes: for each parquet
    file under `path`, read its column min/max statistics and decide
    whether a conjunctive box predicate {col: (lo, hi)} could skip it.
    Driver-side by design — it reads FOOTERS (KBs), never data — the
    same check a table format's file index performs at planning time.
    """
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    touched = 0
    for f in files:
        meta = pq.ParquetFile(f).metadata
        name_to_idx = {
            meta.row_group(0).column(ci).path_in_schema: ci
            for ci in range(meta.num_columns)
        }
        overlaps = True
        for name, (lo, hi) in predicates.items():
            ci = name_to_idx[name]
            stats = [
                meta.row_group(g).column(ci).statistics
                for g in range(meta.num_row_groups)
            ]
            if any(s is None for s in stats):
                continue  # no stats → cannot skip on this column
            fmin, fmax = min(s.min for s in stats), max(s.max for s in stats)
            if fmax < lo or fmin > hi:
                overlaps = False
                break
        touched += int(overlaps)
    return {"n_files": len(files), "n_touched": touched}
