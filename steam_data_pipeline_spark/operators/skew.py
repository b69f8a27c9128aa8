"""Skew-mitigation operators (SCALE.md 'skewed keys' posture).

Salted two-phase aggregation: when one key dominates (a viral game's
fact rows), a plain groupBy funnels that key's entire volume through
one reducer. Salting splits each key into ``n_salts`` deterministic
sub-keys for the partial aggregate, then combines partials in a tiny
second aggregation — the classic two-phase pattern, semantics
identical to the plain groupBy (property the oracle checks).

AQE's skew handling covers *joins*; salting covers *aggregations*
with algebraic (re-aggregable) functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    group_cols: list,
    salt_source: str | Column,
    aggs: dict[str, tuple],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column → ("count"|"sum", input column/expr).
    The salt is ``pmod(xxhash64(salt_source), n_salts)`` — deterministic
    (never ``rand()``: re-executed tasks must re-derive the same salt,
    or retries double-count).
    """
    src = F.col(salt_source) if isinstance(salt_source, str) else salt_source
    salt = F.pmod(F.xxhash64(src), F.lit(n_salts))
    partial_exprs, final_exprs = [], []
    for out, (kind, col) in aggs.items():
        if kind == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"__p_{out}"))
        elif kind == "sum":
            partial_exprs.append(F.sum(col).alias(f"__p_{out}"))
        else:
            raise ValueError(f"non-algebraic agg {kind!r} cannot be salted")
        final_exprs.append(F.sum(f"__p_{out}").alias(out))
    partial = df.withColumn("__salt", salt).groupBy(*group_cols, "__salt").agg(
        *partial_exprs
    )
    return partial.groupBy(*group_cols).agg(*final_exprs)
