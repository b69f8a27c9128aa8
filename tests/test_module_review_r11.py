"""Round-11 module review of plans/core.py + plans/analytics.py
(VERDICT r10 item 6): regression tests for the divergence classes the
review found — each one builds a MICRO events fixture that actually
contains the input absent from the driver fixtures (NULL flag values,
equal-ts ties, single-observation keys, zero-variance groups) and runs
the REGISTERED query against its DuckDB oracle through the difftest
harness, so both legs execute end-to-end on the divergence case.

Findings covered:
1. operators/windows.py::islands cast the flag with cast("int"), so a
   NULL flag row (value > 100 with value NULL) silently MERGED the two
   flagged islands around it (chg=0 on both NULL comparisons) while the
   oracle's CASE WHEN ... THEN 1 ELSE 0 splits them.
2. join_asof_backward / join_asof_forward left equal-ts right rows to
   each engine's arbitrary tie pick — now tie-broken deterministically
   on both legs (greatest/smallest value).
3. agg_corr_price_players: sqrt(n*sxx - sx²) — DuckDB ERRORS on the
   rounding-induced tiny negative of a zero-variance group; both legs
   now clamp at 0 (-> 0 denominator -> NULL on both).
4. udtf_forecast's oracle computed 0/0 -> NULL for single-observation
   keys while the operator's documented n<2 semantics return
   (slope 0, intercept y, forecast y) — oracle now expresses the guard.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from steam_data_pipeline_spark.difftest import duckdb_connect, run_one
from tests.conftest import SF_SMOKE

TS0 = 1_700_000_000_000_000  # µs epoch base (2023-11-14T22:13:20Z)
MIN = 60_000_000  # one minute in µs


def _micro_events_rows():
    """Rows engineered to contain every divergence input at once."""
    rows = []
    eid = [0]

    def ev(user, minutes, etype, value, k=1):
        eid[0] += 1
        props = '{"k": %d}' % k
        rows.append((eid[0], TS0 + minutes * MIN, user, etype, value, props))

    # user 1 — NULL flag between two flagged runs (islands must split):
    # flag = value > 100; the NULL-value row is neither flagged nor a
    # frame gap
    ev(1, 0, "view", 150.0)
    ev(1, 1, "view", 160.0)
    ev(1, 2, "view", None)
    ev(1, 3, "view", 170.0)
    ev(1, 4, "view", 50.0)
    # user 2 — equal-ts ties on the asof right sides: two views at the
    # same instant (backward tie), two purchases at the same instant
    # (forward tie)
    ev(2, 0, "view", 10.0)
    ev(2, 0, "view", 20.0)
    ev(2, 5, "purchase", 99.0)
    ev(2, 5, "purchase", 77.0)
    ev(2, 7, "view", 30.0)
    # user 3 — single observation (forecast n=1, corr n=1)
    ev(3, 0, "click", 42.0, k=7)
    # user 4 — zero variance in x (constant value), varied y
    ev(4, 0, "click", 5.0, k=1)
    ev(4, 1, "click", 5.0, k=2)
    ev(4, 2, "click", 5.0, k=3)
    return rows


@pytest.fixture(scope="module")
def micro_dir(spark, tmp_path_factory):
    """A full sf-dir layout: micro events + the smoke copies of every
    other table (symlinked — both engines read through links)."""
    d = tmp_path_factory.mktemp("micro_sf")
    for name in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings".split()
    ):
        os.symlink(f"{SF_SMOKE}/{name}.parquet", d / f"{name}.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = _micro_events_rows()
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            # TIMESTAMP(MICROS) explicitly — Spark's own writer defaults
            # to INT96, which the ts-precision sniffer can't classify
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def micro_con(micro_dir):
    return duckdb_connect(micro_dir)


@pytest.mark.parametrize(
    "name",
    [
        "win_islands",
        "join_interval_overlap",
        "join_asof_backward",
        "join_asof_forward",
        "agg_corr_price_players",
        "udtf_forecast",
        "udtf_forecast_seasonal",
        "agg_roi_discount",
        "win_sessionize_gap",
        "join_range_binned",
    ],
)
def test_divergence_inputs_hash_exact(spark, micro_dir, micro_con, name):
    r = run_one(spark, micro_con, micro_dir, name)
    assert r.ok, (name, r.issues)


def test_null_flag_splits_islands(spark, micro_dir):
    """The NULL-value row must SPLIT user 1's flagged run into two
    islands (CASE semantics), not merge them into one."""
    from steam_data_pipeline_spark.plans.registry import QUERIES

    rows = (
        QUERIES["win_islands"]
        .spark(spark, micro_dir)
        .filter(F.col("user_id") == 1)
        .collect()
    )
    assert len(rows) == 2, rows
    assert sorted(r.n_obs for r in rows) == [1, 2]


def test_asof_ties_pick_deterministic_value(spark, micro_dir):
    from steam_data_pipeline_spark.plans.registry import QUERIES

    back = {
        r.event_id: r.asof_value
        for r in QUERIES["join_asof_backward"]
        .spark(spark, micro_dir)
        .filter(F.col("user_id") == 2)
        .collect()
    }
    # both equal-ts purchases see the equal-ts views' MAX (20.0)
    assert set(back.values()) == {20.0}
    fwd = (
        QUERIES["join_asof_forward"]
        .spark(spark, micro_dir)
        .filter(F.col("user_id") == 2)
        .collect()
    )
    by_eid = {r.event_id: r.asof_value for r in fwd}
    # the two t=0 views see the equal-ts purchases' MIN (77.0); the
    # t=7 view has no following purchase
    vals = sorted(v for v in by_eid.values() if v is not None)
    assert vals == [77.0, 77.0]
    assert list(by_eid.values()).count(None) == 1
