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
) -> DataFrame:
    """As-of backward join through ``cogroup().applyInPandas`` — the
    Arrow-path twin of the expression-based :func:`asof_backward`:
    both sides are co-partitioned BY KEY in one shuffle each, and the
    per-key pandas ``merge_asof`` (a linear two-pointer merge over the
    sorted frames) replaces the JVM window machinery. The right side
    is sorted by (ts, tiebreak) so ties at equal timestamps resolve to
    the max tiebreak — identical to a ``row_number() OVER (ORDER BY
    ts DESC, tiebreak DESC)`` pick. When to prefer this path: the
    per-key logic is about to grow beyond what expressions say
    (custom staleness rules, interpolation) — cogroup hands both
    sorted frames to Python at Arrow batch cost, one shuffle per side,
    no driver involvement.

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
        if lpdf.empty:
            return pd.DataFrame(columns=[f.name for f in schema.fields])
        lpdf = lpdf.sort_values([left_ts])
        if rpdf.empty:
            out = lpdf.copy()
            for c in right_cols:
                out[f"asof_{c}"] = None
            return out
        rpdf = rpdf.sort_values([right_ts, tiebreak])
        # copy (not rename) so right_ts stays available as the merge
        # key even when it is itself a requested output column
        for c in right_cols:
            rpdf[f"asof_{c}"] = rpdf[c]
        rpdf = rpdf[[right_ts] + [f"asof_{c}" for c in right_cols]]
        merged = pd.merge_asof(
            lpdf,
            rpdf,
            left_on=left_ts,
            right_on=right_ts,
            direction="backward",
            suffixes=("", "__r"),
        )
        keep = lcols + [f"asof_{c}" for c in right_cols]
        return merged[keep]

    return (
        left.groupBy(key)
        .cogroup(right.groupBy(key))
        .applyInPandas(merge, schema)
    )
