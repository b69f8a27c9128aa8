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


class TestEpochStringTimestamps:
    """r12 verdict item 7: the differential comparison used pandas
    datetime64[ns] on both legs, capping the verifiable timestamp
    window at 2262 — the engine's own [1970, 2100) contract edge was
    only checkable because it is inside that wall, and nothing beyond
    could be probed at all. Timestamp/date columns now compare as
    exact epoch-micros STRINGS on both legs."""

    def _spark_leg(self, spark, sql):
        from steam_data_pipeline_spark.difftest import _epoch_str_spark

        return _epoch_str_spark(spark.sql(sql)).toPandas()

    def _oracle_leg(self, sql):
        import duckdb

        from steam_data_pipeline_spark.difftest import _epoch_str_oracle

        con = duckdb.connect()
        return con.execute(_epoch_str_oracle(con, sql)).df()

    def test_beyond_ns_wall_and_max_year_compare_equal(self, spark):
        from steam_data_pipeline_spark.difftest import compare_frames

        sql = (
            "SELECT TIMESTAMP '9999-12-31 23:59:59.999999' AS far, "
            "TIMESTAMP '0001-01-02 00:00:00' AS ancient, "
            "TIMESTAMP '2099-12-31 23:59:59.999999' AS edge_in, "
            "TIMESTAMP '2100-01-01 00:00:00' AS edge_out, "
            "CAST(NULL AS TIMESTAMP) AS missing"
        )
        a, b = self._spark_leg(spark, sql), self._oracle_leg(sql)
        r = compare_frames("ts-extremes", a, b)
        assert r.ok, r.issues
        # and the values really are epoch-micros strings, exact
        assert a["far"][0] == "253402300799999999"
        assert a["edge_out"][0] == "4102444800000000"

    def test_one_microsecond_divergence_at_year_9999_is_caught(
        self, spark
    ):
        """float64 micros would pass 1-µs diffs past year ~2255
        (2^53 µs); the string path must not."""
        from steam_data_pipeline_spark.difftest import compare_frames

        a = self._spark_leg(
            spark, "SELECT TIMESTAMP '9999-12-31 23:59:59.999999' AS t"
        )
        b = self._oracle_leg(
            "SELECT TIMESTAMP '9999-12-31 23:59:59.999998' AS t"
        )
        assert not compare_frames("1us", a, b).ok

    def test_date_and_midnight_timestamp_stay_equivalent(self, spark):
        """Spark date_trunc returns TIMESTAMP where DuckDB returns
        DATE; both map to the same midnight micros."""
        from steam_data_pipeline_spark.difftest import compare_frames

        a = self._spark_leg(
            spark, "SELECT TIMESTAMP '2024-03-05 00:00:00' AS d"
        )
        b = self._oracle_leg("SELECT DATE '2024-03-05' AS d")
        assert compare_frames("date-vs-ts", a, b).ok

    def test_pre_epoch_negative_micros_roundtrip(self, spark):
        from steam_data_pipeline_spark.difftest import compare_frames

        sql = "SELECT TIMESTAMP '1905-03-14 01:02:03.000042' AS t"
        a, b = self._spark_leg(spark, sql), self._oracle_leg(sql)
        assert a["t"][0].startswith("-")
        assert compare_frames("pre-epoch", a, b).ok
