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
