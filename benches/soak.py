#!/usr/bin/env python
"""Long-run soak of the production ingest path (VERDICT r3 item 8).

Drives `Library.update_library` over a synthesized 1k-song full-length
library (~9.5 GB of WAV on disk) and asserts the production properties
that only show at scale:

  * memory stays bounded (the decode pool + upload backpressure hold:
    peak RSS over the whole process tree is sampled every 5 s and
    asserted under --rss-cap; with --recycle N the raw cap must hold —
    worker recycling bounds the tunneled transport's per-upload-byte
    retention (PERF.md §44) — while in-process runs get exactly that
    measured retention as an allowance on top of the cap)
  * every input lands in the song table or the failed-song ledger
    (including deliberately corrupt/short/missing inputs)
  * the transient-wedge retry fires when injected (--inject-wedge wraps
    the first bucket dispatch in a fake dropped-connection error; the
    run must still complete with zero extra failures)
  * resume-after-kill analyzes only the set difference
    (--phase kill-resume: SIGKILLs a subprocess mid-run, then re-runs
    update_library and asserts the second pass analyzed N - done songs)
  * sustained songs/s over the >10 min run is reported

Reference analog: the reference's library update loop is its only scale
driver (src/library.rs:1000-1093); it has no memory/soak test at all.

Usage:
  python benches/soak.py --phase gen          # synthesize the library
  python benches/soak.py --phase run          # full soak + asserts
  python benches/soak.py --phase kill-resume  # crash/resume difference
  python benches/soak.py --phase all
"""

import argparse
import json
import logging
import os
import pathlib
import signal
import sqlite3
import subprocess
import sys
import threading
import time
import wave

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

SOAK_DIR = pathlib.Path(
    os.environ.get("BLISS_SOAK_DIR", "/tmp/bliss_soak")
)
SAMPLE_RATE = 22050


def _song_paths(n: int):
    return [SOAK_DIR / f"songs/{i // 100:02d}/song_{i:04d}.wav"
            for i in range(n)]


def _bad_paths():
    return {
        "missing": SOAK_DIR / "songs/bad_missing.wav",
        "corrupt": SOAK_DIR / "songs/bad_corrupt.wav",
        "short": SOAK_DIR / "songs/bad_short.wav",
    }


def phase_gen(args):
    """Synthesize the library: tiled noise beds + gated tones, unique
    per song, 150-280 s each. Cheap (~0.4 s/song) but musically nontrivial
    enough to drive every descriptor (beats, tonality, quiet passages)."""
    rng = np.random.default_rng(42)
    paths = _song_paths(args.n)
    t0 = time.time()
    made = 0
    for i, p in enumerate(paths):
        if p.exists():
            continue
        p.parent.mkdir(parents=True, exist_ok=True)
        dur = int(rng.integers(150, 281))
        n = dur * SAMPLE_RATE
        base = (rng.normal(size=SAMPLE_RATE) * 0.05).astype(np.float32)
        sig = np.tile(base, n // SAMPLE_RATE + 1)[:n]
        tt = np.arange(n, dtype=np.float32) / SAMPLE_RATE
        f0 = 110.0 * 2.0 ** float(rng.uniform(0, 3))
        for mult, amp in ((1.0, 0.25), (1.5, 0.12), (2.0, 0.08)):
            sig += amp * np.sin(2 * np.pi * f0 * mult * tt).astype(
                np.float32
            )
        bpm = float(rng.uniform(70, 180))
        beat = ((tt * bpm / 60.0) % 1.0 < 0.12).astype(np.float32)
        sig *= 0.35 + 0.65 * beat
        sig[: n // 50] *= np.linspace(0, 1, n // 50, dtype=np.float32)
        pcm = np.clip(sig * 20000.0, -32768, 32767).astype("<i2")
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(SAMPLE_RATE)
            w.writeframes(pcm.tobytes())
        made += 1
        if made % 100 == 0:
            print(f"gen {made} songs ({time.time()-t0:.0f} s)", flush=True)
    bad = _bad_paths()
    bad["corrupt"].write_bytes(b"RIFFgarbage not a wav" * 64)
    with wave.open(str(bad["short"]), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SAMPLE_RATE)
        w.writeframes(np.zeros(2000, "<i2").tobytes())
    print(f"gen done: {made} new songs, dir={SOAK_DIR}", flush=True)


def _open_library(fresh: bool = False):
    from bliss_tpu.io.decoder import FFmpegDecoder
    from bliss_tpu.library import BaseConfig, Library

    db = SOAK_DIR / "soak.db"
    cfg = SOAK_DIR / "soak_config.json"
    if fresh:
        for f in (db, cfg):
            if f.exists():
                f.unlink()
    config = BaseConfig(config_path=cfg, database_path=db)
    return Library(config, FFmpegDecoder)


def _rss_mb() -> float:
    """RSS of this process plus all live descendants (the recycled
    driver runs analysis in worker subprocesses)."""
    import psutil

    p = psutil.Process()
    total = p.memory_info().rss
    for c in p.children(recursive=True):
        try:
            total += c.memory_info().rss
        except psutil.NoSuchProcess:
            pass
    return total / (1024.0 * 1024.0)


class _RssSampler(threading.Thread):
    def __init__(self, period=5.0):
        super().__init__(daemon=True)
        self.period = period
        self.peak = 0.0
        self._stop = threading.Event()

    def run(self):
        while not self._stop.is_set():
            self.peak = max(self.peak, _rss_mb())
            self._stop.wait(self.period)

    def stop(self):
        self._stop.set()
        self.peak = max(self.peak, _rss_mb())


def _install_wedge_injection():
    """Wrap the first bucket dispatch in a fake transient transport
    error (one of utils.retry's markers) so the in-driver retry path is
    exercised for real. Returns the counter dict."""
    from bliss_tpu.io import batch as batch_mod

    state = {"injected": 0}
    real = batch_mod._dispatch_bucket

    def wedgy(entries, padded_len, b, version, kind):
        if state["injected"] == 0:
            state["injected"] = 1

            class _FakeWedge:
                calls = 0

            real_stacked = batch_mod._compiled_stacked
            real_sharded = batch_mod._dispatch_sharded

            def raise_once():
                raise RuntimeError(
                    "injected: response body closed before all bytes "
                    "were read (soak wedge injection)"
                )

            def stacked_wrap(*a, **k):
                fn = real_stacked(*a, **k)

                def run(*fa, **fk):
                    if _FakeWedge.calls == 0:
                        _FakeWedge.calls = 1
                        raise_once()
                    return fn(*fa, **fk)

                return run

            def sharded_wrap(*a, **k):
                if _FakeWedge.calls == 0:
                    _FakeWedge.calls = 1
                    raise_once()
                return real_sharded(*a, **k)

            batch_mod._compiled_stacked = stacked_wrap
            batch_mod._dispatch_sharded = sharded_wrap
            try:
                return real(entries, padded_len, b, version, kind)
            finally:
                batch_mod._compiled_stacked = real_stacked
                batch_mod._dispatch_sharded = real_sharded
                state["injected"] = 2
        return real(entries, padded_len, b, version, kind)

    batch_mod._dispatch_bucket = wedgy
    return state


def phase_run(args):
    paths = [str(p) for p in _song_paths(args.n)]
    bad = _bad_paths()
    all_paths = paths + [str(p) for p in bad.values()]

    lib = _open_library(fresh=not args.resume)
    wedge_state = None
    if args.inject_wedge and not args.recycle:
        # the wedge patches this process' driver; in recycled mode the
        # analysis runs in child processes, so the injection is
        # exercised by the in-process run instead
        wedge_state = _install_wedge_injection()

    sampler = _RssSampler()
    sampler.start()
    t0 = time.time()
    if args.recycle:
        lib.update_library_recycled(
            all_paths, False, True, segment_songs=args.recycle
        )
    else:
        lib.update_library(all_paths, False, True)
    elapsed = time.time() - t0
    sampler.stop()

    conn = lib.sqlite_conn
    n_ok = conn.execute(
        "select count(*) from song where analyzed = true"
    ).fetchone()[0]
    failed = {str(e.song_path) for e in lib.get_failed_songs()}
    ok_paths = {
        r[0]
        for r in conn.execute(
            "select path from song where analyzed = true"
        )
    }
    missing = [
        p for p in all_paths if p not in ok_paths and p not in failed
    ]
    assert not missing, f"{len(missing)} inputs in neither table: {missing[:4]}"
    # the three bad inputs must be on the ledger, none of the good ones
    for name, p in bad.items():
        assert str(p) in failed, (name, p)
    assert not (set(paths) & failed), sorted(set(paths) & failed)[:4]
    if wedge_state is not None:
        assert wedge_state["injected"] == 2, wedge_state
    # The tunneled dev PJRT transport retains one host copy of every
    # byte ever uploaded for the client's lifetime (measured with bare
    # device_put probes, independent of this driver: RSS grows by the
    # wire bytes and survives Array.delete(); PERF.md §44). In-process
    # runs get exactly that allowance — the assert still catches OUR
    # driver growing (decode-ahead, upload queues, staging). Recycled
    # runs (--recycle) must hold the raw cap: worker recycling is the
    # production answer on such transports.
    allowance = 0.0
    if not args.recycle:
        from bliss_tpu.io.batch import bucket_length

        durs = [
            r[0]
            for r in conn.execute(
                "select duration from song where analyzed = true"
            )
        ]
        allowance = (
            sum(bucket_length(int(d * 22050)) for d in durs) * 3.008 / 1e6
        )
    assert sampler.peak < args.rss_cap_mb + allowance, (
        f"peak RSS {sampler.peak:.0f} MB over the {args.rss_cap_mb} MB cap"
        f" (+{allowance:.0f} MB transport-leak allowance)"
    )

    out = {
        "metric": "soak_songs_per_sec",
        "value": round(n_ok / elapsed, 3),
        "unit": f"songs/s sustained over {elapsed:.0f} s (N={n_ok})",
        "elapsed_s": round(elapsed, 1),
        "analyzed": n_ok,
        "failed": len(failed),
        "peak_rss_mb": round(sampler.peak, 1),
        "wedge_injected": wedge_state is not None,
        "recycle_segment_songs": args.recycle,
        "transport_leak_allowance_mb": round(allowance, 1),
    }
    print(json.dumps(out), flush=True)


def phase_kill_resume(args):
    """SIGKILL a soak run mid-flight; the resume must analyze only the
    difference and end with full coverage."""
    db = SOAK_DIR / "soak.db"
    for f in (db, SOAK_DIR / "soak_config.json"):
        if f.exists():
            f.unlink()

    env = dict(os.environ)
    child = subprocess.Popen(
        [sys.executable, __file__, "--phase", "run", "--n", str(args.n),
         "--resume"],  # --resume: do not wipe the DB we are polling
        env=env, cwd=str(pathlib.Path(__file__).resolve().parents[1]),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    kill_at = max(8, args.n // 8)
    deadline = time.time() + 1200
    done = 0
    while time.time() < deadline:
        if child.poll() is not None:
            raise AssertionError(
                f"child finished (rc={child.returncode}) before reaching "
                f"the kill threshold {kill_at}"
            )
        if db.exists():
            try:
                conn = sqlite3.connect(f"file:{db}?mode=ro", uri=True)
                done = conn.execute(
                    "select count(*) from song where analyzed = true"
                ).fetchone()[0]
                conn.close()
            except sqlite3.Error:
                done = 0
        if done >= kill_at:
            break
        time.sleep(3)
    assert done >= kill_at, f"never reached {kill_at} songs (got {done})"
    child.kill()
    child.wait()
    print(f"killed mid-run at {done} analyzed songs", flush=True)

    # resume in-process; capture how many the driver re-analyzes
    analyzed_counts = []

    class _Counter(logging.Handler):
        def emit(self, record):
            msg = record.getMessage()
            if msg.startswith("Analyzing") and "song(s)" in msg:
                analyzed_counts.append(int(msg.split()[1]))

    blog = logging.getLogger("bliss_tpu")
    blog.setLevel(logging.INFO)  # the "Analyzing N song(s)" line
    blog.addHandler(_Counter())
    lib = _open_library(fresh=False)
    paths = [str(p) for p in _song_paths(args.n)]
    t0 = time.time()
    lib.update_library(paths, False, True)
    elapsed = time.time() - t0

    conn = lib.sqlite_conn
    n_ok = conn.execute(
        "select count(*) from song where analyzed = true"
    ).fetchone()[0]
    assert n_ok == args.n, (n_ok, args.n)
    assert analyzed_counts and analyzed_counts[0] <= args.n - done + 8, (
        analyzed_counts, done,
    )
    print(json.dumps({
        "metric": "soak_resume",
        "killed_at": done,
        "resume_analyzed": analyzed_counts[0] if analyzed_counts else None,
        "resume_elapsed_s": round(elapsed, 1),
        "total_in_db": n_ok,
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="all",
                    choices=["gen", "run", "kill-resume", "all"])
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--inject-wedge", action="store_true")
    ap.add_argument("--rss-cap-mb", type=float, default=8192.0)
    ap.add_argument("--recycle", type=int, default=0, metavar="N",
                    help="run the analysis through "
                    "Library.update_library_recycled with N-song worker "
                    "segments (bounds RSS on PJRT transports that retain "
                    "uploaded bytes; PERF.md §44)")
    ap.add_argument("--resume", action="store_true",
                    help="keep the existing soak DB (used by kill-resume)")
    args = ap.parse_args()

    if args.phase in ("gen", "all"):
        phase_gen(args)
    if args.phase in ("run", "all"):
        phase_run(args)
    if args.phase in ("kill-resume", "all"):
        phase_kill_resume(args)


if __name__ == "__main__":
    main()
