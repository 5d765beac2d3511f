"""Worker process for the N-host fake-cluster tests
(tests/test_distributed.py). Run as:
    python _distributed_worker.py <process_id> <coordinator_port> <scenario> [args...] [--nprocs N]
with JAX_PLATFORMS=cpu and 4 forced host devices in the environment.

Scenarios:
  smoke       — equal-shape batch analysis + global top-k (the r3 smoke)
  ragged      — UNEQUAL per-host batch counts (5 vs 3, then 2 vs 0) and
                mismatched pad lengths, handled inside the seam
  library     — update_library_distributed: all hosts commit to one
                shared SQLite DB in <workdir>; with --nprocs 4 the
                round-robin work split is RAGGED (hosts get 2/1/1/0
                songs — the zero-batch host rides empty rounds)
  die         — worker 1 exits right after init; worker 0 must surface a
                clean error (not hang) when its collective loses the peer
  library_die — worker 1 dies MID-UPDATE (after its first analysis
                round); survivors must error cleanly, storing nothing
  library_resume — a fresh cluster re-runs update_library_distributed
                after the library_die crash: the set-difference work
                list resumes the missing songs, no duplicate rows
  dcn_bench   — times `analyze_batch_distributed` rounds vs the local
                analyzer and prints the per-round fabric overhead
"""

import pathlib
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

from bliss_tpu.parallel.distributed import (  # noqa: E402
    analyze_batch_distributed,
    global_mesh,
    initialize,
    top_k_distributed,
    update_library_distributed,
)

DATA = pathlib.Path(__file__).parent / "data"


def scenario_smoke(pid, mesh):
    # every process derives the same global workload deterministically
    # and contributes its own slice — the multi-host ingest pattern
    rng = np.random.default_rng(0)
    t = 16384
    batch_all = (rng.normal(size=(8, t)) * 0.1).astype(np.float32)
    lengths_all = np.array(
        [t, t - 100, t - 2048, t, t, t - 1, t, t - 5000], np.int32
    )
    lo, hi = pid * 4, (pid + 1) * 4
    feats_local = analyze_batch_distributed(
        mesh, batch_all[lo:hi], lengths_all[lo:hi]
    )
    assert feats_local.shape == (4, 23), feats_local.shape

    # parity vs the plain single-process batch analyzer on local devices
    from bliss_tpu.models.analyzer import analyze_batch

    expected = analyze_batch(batch_all[lo:hi], lengths_all[lo:hi])
    np.testing.assert_allclose(feats_local, expected, atol=1e-6)

    # global top-k over host-resident library shards (DCN merge path)
    rng2 = np.random.default_rng(1)
    library_all = rng2.normal(size=(100, 23)).astype(np.float32)
    seeds = library_all[:2] + 0.01
    local_rows = library_all[pid * 50 : (pid + 1) * 50]
    idx, dist = top_k_distributed(
        mesh, local_rows, pid * 50, 100, seeds, k=7
    )
    d = np.zeros(100)
    for s in seeds:
        d += np.linalg.norm(
            library_all.astype(np.float64) - s.astype(np.float64), axis=1
        )
    exp_idx = np.argsort(d, kind="stable")[:7]
    np.testing.assert_array_equal(np.sort(idx), np.sort(exp_idx))
    assert (dist[:-1] <= dist[1:]).all()


def scenario_ragged(pid, mesh):
    """Unequal per-host counts + mismatched pad lengths, all inside the
    seam (VERDICT r3 next-step 5)."""
    from bliss_tpu.models.analyzer import analyze_batch

    rng = np.random.default_rng(42)
    t0, t1 = 16384, 20480  # hosts pad to different bucket lengths
    all_sigs = [
        (rng.normal(size=(5, t0)) * 0.1).astype(np.float32),
        (rng.normal(size=(3, t1)) * 0.1).astype(np.float32),
    ]
    all_lens = [
        np.array([t0, t0 - 7, t0 - 2048, 9000, t0], np.int32),
        np.array([t1, 8400, t1 - 1], np.int32),
    ]
    feats = analyze_batch_distributed(mesh, all_sigs[pid], all_lens[pid])
    assert feats.shape == (5 if pid == 0 else 3, 23), feats.shape
    # parity: local single-process analyzer at the host's own pad length
    expected = analyze_batch(all_sigs[pid], all_lens[pid])
    np.testing.assert_allclose(feats, expected, atol=1e-6)

    # one host runs dry entirely (B_local = 0)
    if pid == 0:
        sigs = (rng.normal(size=(2, t0)) * 0.1).astype(np.float32)
        lens = np.array([t0, t0 - 3], np.int32)
    else:
        sigs = np.zeros((0, t0), np.float32)
        lens = np.zeros((0,), np.int32)
    feats = analyze_batch_distributed(mesh, sigs, lens)
    assert feats.shape == ((2, 23) if pid == 0 else (0, 23)), feats.shape
    if pid == 0:
        np.testing.assert_allclose(
            feats, analyze_batch(sigs, lens), atol=1e-6
        )


def _open_shared_library(pid, workdir):
    from jax.experimental import multihost_utils

    from bliss_tpu.io.decoder import FFmpegDecoder
    from bliss_tpu.library import BaseConfig, Library

    workdir = pathlib.Path(workdir)
    config = BaseConfig(config_path=workdir / "config.json")
    if pid == 0 and not config.config_path.exists():
        lib = Library.new(config, FFmpegDecoder)
        multihost_utils.sync_global_devices("lib_created")
    else:
        multihost_utils.sync_global_devices("lib_created")
        lib = Library(config, FFmpegDecoder, create=False)
    return lib


LIB_PATHS = [
    DATA / "s16_mono_22_5kHz.flac",
    DATA / "piano.flac",
    DATA / "s32_stereo_44_1_kHz.mp3",
    DATA / "s32_stereo_44_1_kHz.flac",
]


def scenario_library(pid, mesh, workdir, nprocs):
    """All hosts update ONE shared library DB through the global mesh.
    With nprocs=4 the round-robin split of the 5-entry work list is
    ragged: hosts get 2/1/1/1 entries, and after the failed path lands
    on one host the resume pass gives another host ZERO work."""
    from bliss_tpu.io.decoder import FFmpegDecoder

    lib = _open_shared_library(pid, workdir)
    paths = LIB_PATHS + [DATA / "nonexistent.flac"]  # -> failed ledger
    success, failure = update_library_distributed(
        lib, paths, mesh, process_id=pid, num_processes=nprocs
    )
    print(f"stored pid={pid} success={success} failure={failure}")

    # every host sees the complete merged library
    songs = lib.songs_from_library()
    assert len(songs) == 4, [str(s.bliss_song.path) for s in songs]
    failed = lib.get_failed_songs()
    assert len(failed) == 1 and "nonexistent" in str(
        failed[0].song_path
    ), failed

    # features in the shared DB match a local single-process analysis
    from bliss_tpu.io.batch import analyze_paths_batched

    local = dict(analyze_paths_batched(FFmpegDecoder, paths[:4]))
    by_path = {str(s.bliss_song.path): s for s in songs}
    for p in paths[:4]:
        np.testing.assert_allclose(
            by_path[str(p)].bliss_song.analysis.as_arr1(),
            local[p].analysis.as_arr1(),
            atol=1e-6,
        )

    # resume semantics: a second distributed update analyzes nothing new
    # (with nprocs=4 the empty todo gives every host a zero-batch slice)
    s2, f2 = update_library_distributed(
        lib, paths[:4], mesh, process_id=pid, num_processes=nprocs
    )
    assert (s2, f2) == (0, 0), (s2, f2)


def scenario_library_die(pid, mesh, workdir, nprocs):
    """Worker 1 dies after its FIRST analysis round inside
    update_library_distributed; survivors must surface a clean error
    (not hang) and store nothing (results commit only after all rounds)."""
    import os

    from bliss_tpu.parallel import distributed as dist_mod

    lib = _open_shared_library(pid, workdir)
    if pid == 1:
        real = dist_mod.analyze_batch_distributed
        state = {"rounds": 0}

        def dying(*a, **kw):
            if state["rounds"] >= 1:
                print("DISTRIBUTED_WORKER_DYING pid=1", flush=True)
                os._exit(17)
            state["rounds"] += 1
            return real(*a, **kw)

        dist_mod.analyze_batch_distributed = dying
    try:
        update_library_distributed(
            lib,
            LIB_PATHS,
            mesh,
            process_id=pid,
            num_processes=nprocs,
            round_size=1,  # force multiple rounds per host
        )
    except BaseException as exc:  # noqa: BLE001 — any clean error passes
        assert len(lib.songs_from_library()) == 0, "partial commit!"
        print(
            f"DOWNED_WORKER_DETECTED pid={pid} {type(exc).__name__}",
            flush=True,
        )
        return
    raise AssertionError("update succeeded with a dead peer?")


def scenario_library_resume(pid, mesh, workdir, nprocs):
    """Fresh cluster after the library_die crash: set-difference resumes
    the whole work list, and every song lands exactly once."""
    lib = _open_shared_library(pid, workdir)
    update_library_distributed(
        lib, LIB_PATHS, mesh, process_id=pid, num_processes=nprocs
    )
    songs = lib.songs_from_library()
    songpaths = sorted(str(s.bliss_song.path) for s in songs)
    assert len(songpaths) == len(set(songpaths)) == 4, songpaths
    with lib._lock:
        n_rows = lib.sqlite_conn.execute(
            "select count(*) from song"
        ).fetchone()[0]
    assert n_rows == 4, n_rows  # no duplicate rows after the resume
    print(f"resumed pid={pid} rows={n_rows}", flush=True)


def scenario_dcn_bench(pid, mesh, nprocs):
    """Per-round fabric overhead: one analysis round through the global
    mesh (process_allgather + make_array + sharded program + gather)
    minus the same batch on the local single-process analyzer."""
    import time

    from bliss_tpu.models.analyzer import analyze_batch

    rng = np.random.default_rng(7 + pid)
    t = 16384
    b_local = 4
    sigs = (rng.normal(size=(b_local, t)) * 0.1).astype(np.float32)
    lens = np.full((b_local,), t - 11, np.int32)

    analyze_batch_distributed(mesh, sigs, lens)  # compile
    analyze_batch(sigs, lens)  # compile
    rounds = 5
    t0 = time.perf_counter()
    for _ in range(rounds):
        analyze_batch_distributed(mesh, sigs, lens)
    dt_dist = (time.perf_counter() - t0) / rounds
    t0 = time.perf_counter()
    for _ in range(rounds):
        np.asarray(analyze_batch(sigs, lens))
    dt_local = (time.perf_counter() - t0) / rounds
    if pid == 0:
        import json

        print(
            "DCN_BENCH "
            + json.dumps(
                {
                    "metric": "dcn_per_round_overhead",
                    "value": round((dt_dist - dt_local) * 1e3, 1),
                    "unit": (
                        f"ms/round (gloo fake-DCN, {nprocs} procs x "
                        f"4 devices, B_local={b_local}, 1-core host)"
                    ),
                    "distributed_ms": round(dt_dist * 1e3, 1),
                    "local_ms": round(dt_local * 1e3, 1),
                }
            ),
            flush=True,
        )


def scenario_die(pid, mesh):
    """Worker 1 dies after init; worker 0's next collective must fail
    cleanly within the heartbeat window instead of hanging."""
    if pid == 1:
        print("DISTRIBUTED_WORKER_DYING pid=1", flush=True)
        import os

        os._exit(17)
    t = 16384
    sig = np.zeros((4, t), np.float32)
    lens = np.full((4,), t, np.int32)
    try:
        analyze_batch_distributed(mesh, sig, lens)
    except BaseException as exc:  # noqa: BLE001 — any clean error is a pass
        print(
            f"DOWNED_WORKER_DETECTED pid={pid} {type(exc).__name__}",
            flush=True,
        )
        return
    raise AssertionError("collective succeeded with a dead peer?")


def main():
    argv = list(sys.argv[1:])
    nprocs = 2
    if "--nprocs" in argv:
        i = argv.index("--nprocs")
        nprocs = int(argv[i + 1])
        del argv[i : i + 2]
    pid = int(argv[0])
    port = argv[1]
    scenario = argv[2] if len(argv) > 2 else "smoke"
    heartbeat = 10 if scenario in ("die", "library_die") else None
    initialize(
        f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=pid,
        heartbeat_timeout_seconds=heartbeat,
    )
    mesh = global_mesh()
    assert mesh.size == 4 * nprocs, mesh
    assert len(jax.local_devices()) == 4

    if scenario == "smoke":
        scenario_smoke(pid, mesh)
    elif scenario == "ragged":
        scenario_ragged(pid, mesh)
    elif scenario == "library":
        scenario_library(pid, mesh, argv[3], nprocs)
    elif scenario == "die":
        scenario_die(pid, mesh)
    elif scenario == "library_die":
        scenario_library_die(pid, mesh, argv[3], nprocs)
    elif scenario == "library_resume":
        scenario_library_resume(pid, mesh, argv[3], nprocs)
    elif scenario == "dcn_bench":
        scenario_dcn_bench(pid, mesh, nprocs)
    else:
        raise SystemExit(f"unknown scenario {scenario}")

    print(f"DISTRIBUTED_SMOKE_OK pid={pid}", flush=True)


if __name__ == "__main__":
    main()
