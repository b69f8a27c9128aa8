"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import importlib
import sys


def _entry_module():
    sys.path.insert(0, "/root/repo")
    return importlib.import_module("__spark_entry__")


def test_entry_returns_rows(spark):
    mod = _entry_module()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"r_name", "n_lineitems", "revenue"}


def test_queries_and_oracles_align(spark):
    mod = _entry_module()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert len(qs) >= 60
    assert set(oracles) <= set(qs)
    # every query callable runs at smoke scale
    sample = ["agg_daily_counts", "join_dim_fact", "llm_sim_search"]
    for name in sample:
        assert qs[name](spark, "/root/testdata/sf0.001").count() >= 0
