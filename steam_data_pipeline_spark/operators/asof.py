"""Generic as-of joins (backward and forward) — operators Spark lacks
natively (SURVEY.md §2.3 ``join_asof_latest`` generalizes to arbitrary
probe times; kdb/pandas ``merge_asof`` semantics).

Backward: for each left row, attach the most recent right row with
``right.ts <= left.ts`` within the same key. Forward: the earliest
right row with ``right.ts >= left.ts``. Both implemented as the
union-tag pattern — NOT a range join:

    union(left tagged 1, right tagged 0)
    → one window per (key, ts-order): last/first(right_value,
      ignorenulls) over the backward/forward frame
    → keep left rows

Cost: one shuffle on the key + one sort — identical to a window
aggregate; a naive range join would be |L|·|R| per key. Ties
(right.ts == left.ts) place the right row inside the frame, giving
inclusive semantics, matching DuckDB/kdb ASOF JOIN (the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Attach ``value_cols`` (renamed ``asof_<col>``) plus ``asof_ts``
    from the latest right row at-or-before each left row's ``ts``."""
    l_cols = [c for c in left.columns]
    tagged_left = left.select(
        *l_cols,
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[ts].dataType).alias("__r_ts"),
    )
    tagged_right = right.select(
        *[
            F.col(c) if c in (key, ts) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in l_cols
        ],
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(ts).alias("__r_ts"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    order = [F.col(ts), F.col("__is_left")] + (
        [F.col(tiebreak)] if tiebreak else []
    )
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *l_cols,
        "__is_left",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
        F.last("__r_ts", ignorenulls=True).over(w).alias("asof_ts"),
    )
    return filled.filter(F.col("__is_left") == 1).drop("__is_left")


def asof_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Attach ``value_cols`` (renamed ``asof_<col>``) plus ``asof_ts``
    from the earliest right row at-or-after each left row's ``ts``.

    Mirror of :func:`asof_backward`: ascending ts order with left rows
    sorted *before* right rows at equal ts (inclusive ``>=``), frame
    [current row, unbounded following], ``first(…, ignorenulls)``."""
    l_cols = [c for c in left.columns]
    tagged_left = left.select(
        *l_cols,
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[ts].dataType).alias("__r_ts"),
    )
    tagged_right = right.select(
        *[
            F.col(c) if c in (key, ts) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in l_cols
        ],
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(ts).alias("__r_ts"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    order = [F.col(ts), F.col("__is_left").desc()] + (
        [F.col(tiebreak)] if tiebreak else []
    )
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    filled = unioned.select(
        *l_cols,
        "__is_left",
        *[
            F.first(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
        F.first("__r_ts", ignorenulls=True).over(w).alias("asof_ts"),
    )
    return filled.filter(F.col("__is_left") == 1).drop("__is_left")


def asof_backward_cogrouped(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tiebreak: str,
    n_buckets: int = 64,
) -> DataFrame:
    """As-of backward join through ``cogroup().applyInPandas`` — the
    Arrow-path twin of the expression-based :func:`asof_backward`:
    both sides are co-partitioned in one shuffle each and a pandas
    ``merge_asof`` (linear two-pointer over sorted frames) replaces
    the JVM window machinery.

    GRANULARITY is the make-or-break decision: cogrouping on the raw
    key would invoke pandas once PER KEY (measured 11+ s at sf0.1 —
    ~10k sub-millisecond calls of pure overhead), so both sides are
    cogrouped on ``hash(key) % n_buckets`` and each call runs ONE
    ``merge_asof(by=key)`` over the whole bucket — per-key exact
    matching inside a vectorized merge, ~n_buckets Python calls total
    regardless of key cardinality. The right side is pre-sorted by
    (ts, tiebreak), and merge_asof's last-match-per-group rule then
    picks the max tiebreak at equal timestamps — identical to a
    ``row_number() OVER (ORDER BY ts DESC, tiebreak DESC)`` pick.
    When to prefer this path over the expression asof: the per-key
    logic is about to outgrow expressions (custom staleness rules,
    interpolation).

    Output: all left columns + ``asof_<c>`` for each right col
    (nullable — missing matches stay NULL through pandas' masked
    dtypes, never NaN-coerced integers).
    """
    import pandas as pd

    out_fields = left.schema.fields + [
        next(f for f in right.schema.fields if f.name == c) for c in right_cols
    ]
    from pyspark.sql.types import StructType

    schema = StructType(
        left.schema.fields
        + [
            type(f)(f"asof_{f.name}", f.dataType, True)
            for f in out_fields[len(left.schema.fields):]
        ]
    )
    lcols = [f.name for f in left.schema.fields]

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.drop(columns=["__b"])
        rpdf = rpdf.drop(columns=["__b"], errors="ignore")
        # undo the lineage-breaking rename (see below)
        rpdf = rpdf.rename(
            columns={c: c.removeprefix("__r_") for c in rpdf.columns}
        )
        if lpdf.empty:
            return pd.DataFrame(columns=[f.name for f in schema.fields])
        # merge_asof sorts on the `on` key globally; `by` handles the
        # per-key exact match inside the single vectorized merge
        lpdf = lpdf.sort_values([left_ts, key], kind="mergesort")
        if rpdf.empty:
            out = lpdf.copy()
            for c in right_cols:
                out[f"asof_{c}"] = None
            return out
        rpdf = rpdf.sort_values([right_ts, tiebreak], kind="mergesort")
        # copy (not rename) so right_ts stays available as the merge
        # key even when it is itself a requested output column
        for c in right_cols:
            rpdf[f"asof_{c}"] = rpdf[c]
        rpdf = rpdf[[key, right_ts] + [f"asof_{c}" for c in right_cols]]
        merged = pd.merge_asof(
            lpdf,
            rpdf,
            left_on=left_ts,
            right_on=right_ts,
            by=key,
            direction="backward",
            suffixes=("", "__r"),
        )
        keep = lcols + [f"asof_{c}" for c in right_cols]
        return merged[keep]

    lb = left.withColumn("__b", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)))
    # Alias EVERY right column to a fresh name before the cogroup:
    # when both sides derive from the same scan (self-as-of, e.g.
    # purchases vs clicks of one events table), the two plans share
    # attribute IDs and the analyzer silently prunes the right side's
    # shared columns out of the Arrow batch (observed: right frame
    # arrived without its key column). Alias mints new expression IDs,
    # which breaks the ambiguity; the pandas side strips the prefix.
    rb = right.select(
        *[F.col(c).alias(f"__r_{c}") for c in right.columns]
    ).withColumn("__b", F.pmod(F.xxhash64(F.col(f"__r_{key}")), F.lit(n_buckets)))
    return (
        lb.groupBy("__b")
        .cogroup(rb.groupBy("__b"))
        .applyInPandas(merge, schema)
    )
