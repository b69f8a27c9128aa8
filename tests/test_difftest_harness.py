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


def test_array_columns_numpy_vs_list_match():
    # Spark toPandas yields Python lists for array columns; DuckDB .df()
    # yields numpy arrays (often of numpy scalars). Value-identical
    # frames must compare equal regardless of container flavor.
    import numpy as np

    a = pd.DataFrame({"k": [1, 2], "arr": [[1, 2], [3, 4]]})
    b = pd.DataFrame(
        {"k": [1, 2], "arr": [np.array([1, 2]), np.array([3, 4])]}
    )
    assert compare_frames("t", a, b).ok
    # and genuinely different arrays must still fail
    c = pd.DataFrame(
        {"k": [1, 2], "arr": [np.array([1, 2]), np.array([3, 5])]}
    )
    assert not compare_frames("t", a, c).ok


def test_binary_columns_bytearray_vs_bytes_match():
    a = pd.DataFrame({"b": [bytearray(b"\x00\x01"), bytearray(b"\x02")]})
    b = pd.DataFrame({"b": [b"\x00\x01", b"\x02"]})
    assert compare_frames("t", a, b).ok
    c = pd.DataFrame({"b": [b"\x00\x01", b"\x03"]})
    assert not compare_frames("t", a, c).ok


def test_map_columns_dict_key_order_insensitive():
    a = pd.DataFrame({"m": [{"x": 1, "y": 2}]})
    b = pd.DataFrame({"m": [{"y": 2, "x": 1}]})
    assert compare_frames("t", a, b).ok
    c = pd.DataFrame({"m": [{"x": 1, "y": 3}]})
    assert not compare_frames("t", a, c).ok
