"""Contract tests for the read_table analyzed-plan memo (round-13
optimization): the memo must share only driver-side relation
resolution — never data, never across sessions, never across an
in-place testdata regeneration."""

from __future__ import annotations

import os
import shutil

from steam_data_pipeline_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"


class TestTableMemo:
    def test_repeat_call_returns_memoized_plan(self, spark):
        a = read_table(spark, SF, "region")
        b = read_table(spark, SF, "region")
        assert a is b  # same lazy plan handle, no re-resolution

    def test_memo_is_per_session_object(self, spark):
        """spark.newSession() clones share an applicationId but must NOT
        share DataFrames: qa_observe_metrics isolates its Observation on
        a cloned session precisely so the registration cannot poison the
        parent session's closure serialization (observed live as
        llm_quality_model's localCheckpoint dying with
        NotSerializableException: ObservationManager when an
        appId-keyed memo leaked the parent's DataFrame into the
        clone)."""
        parent_df = read_table(spark, SF, "region")
        clone = spark.newSession()
        clone_df = read_table(clone, SF, "region")
        assert clone_df is not parent_df
        # each side's plan belongs to its own session
        assert clone_df.sparkSession is clone
        assert parent_df.sparkSession is spark

    def test_memo_invalidates_on_file_change(self, spark, tmp_path):
        d = str(tmp_path)
        src = os.path.join(SF, "region.parquet")
        dst = os.path.join(d, "region.parquet")
        (shutil.copytree if os.path.isdir(src) else shutil.copyfile)(src, dst)
        a = read_table(spark, d, "region")
        # in-place regeneration = content may differ at the same path;
        # the freshness token (mtime_ns) must miss the memo
        st = os.stat(dst)
        os.utime(dst, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
        b = read_table(spark, d, "region")
        assert a is not b

    def test_memoized_plan_still_scans_fresh_data(self, spark, tmp_path):
        """The memo holds a LAZY plan, not results: a second action on
        the memoized DataFrame re-scans the file."""
        a = read_table(spark, SF, "region")
        n1 = a.count()
        n2 = read_table(spark, SF, "region").count()
        assert n1 == n2 and n1 > 0
