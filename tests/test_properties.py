"""Property-based tests (hypothesis) for the correctness-subtle
operators, against plain-Python reference implementations
(SURVEY.md §5 'property tests for the tricky ops')."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row, functions as F

from steam_data_pipeline_spark.operators.relational import union_distinct_sort
from steam_data_pipeline_spark.operators.upsert import merge_upsert
from steam_data_pipeline_spark.operators.windows import island_intervals

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_islands(flags: list[int]) -> list[tuple[int, int, int]]:
    """Reference implementation: (start_idx, end_idx, n)."""
    out, start = [], None
    for i, f in enumerate(flags):
        if f and start is None:
            start = i
        elif not f and start is not None:
            out.append((start, i - 1, i - start))
            start = None
    if start is not None:
        out.append((start, len(flags) - 1, len(flags) - start))
    return out


@SETTINGS
@given(flags=st.lists(st.integers(min_value=0, max_value=1), min_size=1, max_size=60))
def test_islands_match_python_reference(spark, flags):
    t0 = datetime(2024, 1, 1)
    rows = [Row(k="x", ts=t0 + timedelta(hours=i), flag=v) for i, v in enumerate(flags)]
    got = sorted(
        (r.start_ts, r.end_ts, r.n_obs)
        for r in island_intervals(
            spark.createDataFrame(rows), "k", "ts", F.col("flag") == 1
        ).collect()
    )
    expected = sorted(
        (t0 + timedelta(hours=s), t0 + timedelta(hours=e), n)
        for s, e, n in _py_islands(flags)
    )
    assert got == expected


@SETTINGS
@given(
    old=st.lists(st.tuples(st.integers(0, 8), st.integers(0, 100)), max_size=15),
    new=st.lists(st.tuples(st.integers(0, 8), st.integers(0, 100)), max_size=15),
)
def test_merge_upsert_matches_dict_fold(spark, old, new):
    # dedup old by key (a stored table has unique keys); new deduped by
    # max payload (the version column)
    old_d = {}
    for k, v in old:
        old_d[k] = v
    expected = dict(old_d)
    new_d = {}
    for k, v in new:
        new_d[k] = max(new_d.get(k, -1), v)
    expected.update(new_d)

    schema = "k int, v int"
    old_df = spark.createDataFrame([Row(k=k, v=v) for k, v in old_d.items()], schema)
    new_df = spark.createDataFrame([Row(k=k, v=v) for k, v in new], schema)
    if not old_d and not new:
        return
    got = {
        r.k: r.v
        for r in merge_upsert(
            old_df if old_d else None,
            new_df,
            key="k",
            version_cols=["v"],
        ).collect()
    }
    if not new:
        assert got == old_d  # merge with empty new keeps old unchanged
    else:
        assert got == expected


@SETTINGS
@given(
    a=st.lists(st.integers(0, 120), max_size=25),
    b=st.lists(st.integers(0, 120), max_size=25),
)
def test_union_distinct_sort_matches_python(spark, a, b):
    sa = spark.createDataFrame([Row(app_id=str(x)) for x in a], "app_id string")
    sb = spark.createDataFrame([Row(app_id=str(x)) for x in b], "app_id string")
    if not a and not b:
        return
    got = [r.app_id for r in union_distinct_sort(sa, sb).collect()]
    assert got == sorted(set(str(x) for x in a + b))  # string order: '10' < '9'
