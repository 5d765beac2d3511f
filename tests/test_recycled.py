"""`Library.update_library_recycled` — the bounded-RSS segmented ingest
driver (worker subprocess per segment; see PERF.md §44 for the PJRT
transport-retention measurement that motivates it).

Reference analog: the update loop src/library.rs:1000-1093; recycling
itself has no reference analog (the reference never uploads)."""

import pathlib
import sqlite3
import subprocess

import pytest

from bliss_tpu.io.decoder import FFmpegDecoder
from bliss_tpu.library import BaseConfig, Library


@pytest.fixture()
def lib(tmp_path):
    config = BaseConfig(
        config_path=tmp_path / "config.json",
        database_path=tmp_path / "songs.db",
    )
    return Library(config, FFmpegDecoder)


def _paths(data_dir):
    return [
        data_dir / "s16_mono_22_5kHz.flac",
        data_dir / "piano.flac",
        data_dir / "s32_stereo_44_1_kHz.mp3",
        data_dir / "s32_stereo_44_1_kHz.flac",
        data_dir / "s16_stereo_22_5kHz.flac",
    ]


def test_recycled_matches_update_library(lib, data_dir, tmp_path):
    paths = _paths(data_dir) + [tmp_path / "missing.wav"]
    lib.update_library_recycled(
        [str(p) for p in paths], False, False, segment_songs=3
    )

    conn = sqlite3.connect(lib.config.database_path)
    ok = {
        r[0]
        for r in conn.execute("select path from song where analyzed = true")
    }
    assert ok == {str(p) for p in paths[:-1]}
    failed = {str(e.song_path) for e in lib.get_failed_songs()}
    assert failed == {str(paths[-1])}

    # features equal the in-process driver's (same batched path, just
    # run in worker processes)
    ref_cfg = BaseConfig(
        config_path=tmp_path / "ref/config.json",
        database_path=tmp_path / "ref/songs.db",
    )
    ref = Library(ref_cfg, FFmpegDecoder)
    ref.update_library([str(p) for p in paths], False, False)
    for p in paths[:-1]:
        a = lib.song_from_path(str(p)).analysis.as_arr1()
        b = ref.song_from_path(str(p)).analysis.as_arr1()
        assert (a == b).all(), p


def test_recycled_second_call_spawns_nothing(lib, data_dir, monkeypatch):
    paths = [str(p) for p in _paths(data_dir)[:2]]
    lib.update_library_recycled(paths, False, False, segment_songs=8)

    calls = []
    real_popen = subprocess.Popen

    def counting_popen(*a, **k):
        calls.append(a)
        return real_popen(*a, **k)

    monkeypatch.setattr(subprocess, "Popen", counting_popen)
    lib.update_library_recycled(paths, False, False, segment_songs=8)
    assert calls == []  # set-difference: nothing left to analyze

    conn = sqlite3.connect(lib.config.database_path)
    n = conn.execute(
        "select count(*) from song where analyzed = true"
    ).fetchone()[0]
    assert n == 2


def test_recycled_failed_segment_raises(lib, data_dir, monkeypatch):
    from bliss_tpu.errors import BlissError

    spawned = []

    class FakeProc:
        def wait(self, timeout=None):
            return 3

        def kill(self):
            pass

    def failing_popen(cmd, **k):
        spawned.append(cmd)
        return FakeProc()

    monkeypatch.setattr(subprocess, "Popen", failing_popen)
    with pytest.raises(BlissError, match="failed twice"):
        lib.update_library_recycled(
            [str(_paths(data_dir)[0])], False, False, segment_songs=4
        )
    assert len(spawned) == 2  # one fresh retry, then give up


def test_recycled_prespawn_gates_next_segment(lib, data_dir, monkeypatch):
    """With >1 segment the driver pre-spawns segment i+1's worker with a
    --gate it may only pass once segment i exits (restart-tax overlap,
    PERF §51); a failing run must also reap the idling pre-spawned child."""
    gates_at_spawn = []
    real_popen = subprocess.Popen

    class FakeProc:
        killed = 0

        def wait(self, timeout=None):
            return 3

        def kill(self):
            FakeProc.killed += 1

    def recording_popen(cmd, **k):
        gate = cmd[cmd.index("--gate") + 1] if "--gate" in cmd else None
        gates_at_spawn.append(gate)
        return FakeProc()

    monkeypatch.setattr(subprocess, "Popen", recording_popen)
    from bliss_tpu.errors import BlissError

    with pytest.raises(BlissError, match="failed twice"):
        lib.update_library_recycled(
            [str(p) for p in _paths(data_dir)[:4]],
            False,
            False,
            segment_songs=2,
        )
    # segment 0 spawns ungated; segment 1 pre-spawns WITH a gate before
    # segment 0's result is known; the retry of segment 0 is ungated.
    assert gates_at_spawn[0] is None
    assert gates_at_spawn[1] is not None
    assert gates_at_spawn[2] is None
    assert FakeProc.killed >= 1  # the idling pre-spawned child was reaped


def test_recycled_delete_everything_else(lib, data_dir):
    paths = [str(p) for p in _paths(data_dir)[:3]]
    lib.update_library_recycled(paths, False, False, segment_songs=8)
    lib.update_library_recycled(paths[:2], True, False, segment_songs=8)
    conn = sqlite3.connect(lib.config.database_path)
    ok = {
        r[0]
        for r in conn.execute("select path from song where analyzed = true")
    }
    assert ok == set(paths[:2])
