"""Partition-local skyline pre-prune — the block-nested-loop
refinement for 2-D Pareto dominance at scale.

The exact skyline pass (``agg_skyline_pareto``) is two windows over a
single global price-ordered sort; correct, but the sort's
``Exchange SinglePartition`` collapses the FULL input onto one
partition — fine on a dim table, a scale-killer on a fact. The classic
fix (Börzsönyi et al., "The Skyline Operator", ICDE 2001 — the
block-nested-loop local filter) is to prune each partition to its
LOCAL skyline first: a row dominated inside its own partition is a
fortiori dominated globally, so the global sort only ever sees each
partition's Pareto frontier (≈ O(log n) expected points per partition
on independent axes, and never more than the partition's distinct
price values).

Soundness (nothing a-priori-kept is dropped): a row is dropped only
when an earlier row in (minimize asc, maximize desc) partition order
has strictly larger ``maximize`` at ≤ its ``minimize`` — a genuine
dominator. Completeness of the FINAL result is unchanged because the
exact global pass re-filters the survivors, and dominance among
survivors is preserved: if a dropped row dominated r, its own
dominator (chained to a survivor along strictly-increasing
``maximize``) also dominates r.

Execution shape: ``sortWithinPartitions`` (partition-local sort, NO
exchange) → one ``mapInPandas`` whose per-batch work is a numpy
running-max scan; state (the partition's running max) carries across
Arrow batches inside the iterator, so the prune is exact per
partition regardless of batch size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

_NEG_INF = -(2**63)


def local_skyline_preprune(
    df: DataFrame, minimize: str, maximize: str
) -> DataFrame:
    """Prune ``df`` to a per-partition superset of its 2-D skyline
    (minimize ``minimize``, maximize ``maximize``; both integral and
    non-null by contract). Keeps every global skyline point; drops any
    row some same-partition row strictly dominates. No shuffle."""
    local = df.sortWithinPartitions(F.col(minimize).asc(), F.col(maximize).desc())

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        runmax = _NEG_INF  # max `maximize` over all prior rows in this partition
        for pdf in batches:
            if not len(pdf):
                continue
            s = pdf[maximize].to_numpy()
            # before[i] = max over rows strictly before i (incl. prior
            # batches); all of them have minimize <= row i's (sorted)
            before = np.maximum(
                np.concatenate(([_NEG_INF], np.maximum.accumulate(s)[:-1])),
                runmax,
            )
            runmax = max(runmax, int(s.max()))
            out = pdf[s >= before]
            if len(out):
                yield out

    return local.mapInPandas(prune, df.schema)
