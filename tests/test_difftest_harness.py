"""Unit tests for the differential harness itself — the comparisons
must actually catch the failure modes they claim to."""

from __future__ import annotations

import pandas as pd

from steam_data_pipeline_spark.difftest import compare_frames


def test_identical_frames_pass():
    a = pd.DataFrame({"k": [1, 2], "v": [1.5, 2.5]})
    r = compare_frames("t", a, a.copy())
    assert r.ok


def test_row_order_is_insensitive():
    a = pd.DataFrame({"k": [1, 2], "v": ["x", "y"]})
    b = pd.DataFrame({"k": [2, 1], "v": ["y", "x"]})
    assert compare_frames("t", a, b).ok


def test_column_name_mismatch_fails():
    a = pd.DataFrame({"k": [1]})
    b = pd.DataFrame({"kk": [1]})
    r = compare_frames("t", a, b)
    assert not r.ok and "columns differ" in r.issues[0]


def test_row_count_mismatch_fails():
    a = pd.DataFrame({"k": [1, 2]})
    b = pd.DataFrame({"k": [1]})
    assert not compare_frames("t", a, b).ok


def test_float_last_ulp_mismatch_fails():
    a = pd.DataFrame({"v": [0.1 + 0.2]})
    b = pd.DataFrame({"v": [0.3]})  # differs in the last ulp
    r = compare_frames("t", a, b)
    assert not r.ok  # the harness is deliberately bit-exact


def test_nulls_match_nulls():
    a = pd.DataFrame({"v": [None, 1.0]})
    b = pd.DataFrame({"v": [None, 1.0]})
    assert compare_frames("t", a, b).ok


def test_int_dtype_width_is_normalized():
    a = pd.DataFrame({"v": pd.array([1, 2], dtype="int32")})
    b = pd.DataFrame({"v": pd.array([1, 2], dtype="int64")})
    assert compare_frames("t", a, b).ok
