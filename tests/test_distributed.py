"""Two-process CPU fake-cluster tests for the multi-host layer
(SURVEY §2.3 "Distributed comm backend"): gloo collectives stand in for
DCN, 4 virtual devices per process stand in for each host's chips.

Scenarios: equal-shape smoke, ragged/unequal per-host workloads, the
shared-DB `update_library_distributed` driver, and a downed worker
surfacing a clean error instead of a hang (VERDICT r3 next-step 5).
"""

import os
import pathlib
import socket
import subprocess
import sys

HERE = pathlib.Path(__file__).parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never touch the TPU tunnel
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(
        f for f in flags.split() if "host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()
    return env


def _run_cluster(scenario: str, extra_args=(), timeout=600, n_procs=2):
    port = _free_port()
    env = _worker_env()
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                str(HERE / "_distributed_worker.py"),
                str(pid),
                str(port),
                scenario,
                *[str(a) for a in extra_args],
                "--nprocs",
                str(n_procs),
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(n_procs)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    return procs, outs


def _assert_ok(procs, outs):
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"DISTRIBUTED_SMOKE_OK pid={pid}" in out, out[-4000:]


def test_two_process_fake_cluster():
    procs, outs = _run_cluster("smoke")
    _assert_ok(procs, outs)


def test_two_process_ragged_hosts():
    """Unequal per-host batch counts (5 vs 3, 2 vs 0) and mismatched pad
    lengths are absorbed inside analyze_batch_distributed."""
    procs, outs = _run_cluster("ragged")
    _assert_ok(procs, outs)


def test_two_process_shared_library_update(tmp_path):
    """update_library_distributed: both hosts analyze their slice over
    the global mesh and commit to one shared SQLite DB; both see the
    merged library, the failed ledger, and resume-no-op semantics."""
    procs, outs = _run_cluster("library", extra_args=[tmp_path])
    _assert_ok(procs, outs)
    for out in outs:
        assert "stored pid=" in out


def test_four_process_ragged_library_update(tmp_path):
    """VERDICT r4 next-step 7: a 4-process cluster (16 virtual devices)
    runs update_library_distributed with a RAGGED round-robin work split
    (2/1/1/1 songs; the resume pass hands every host a zero slice) —
    all four hosts commit to one shared DB and see the merged result."""
    procs, outs = _run_cluster("library", extra_args=[tmp_path], n_procs=4)
    _assert_ok(procs, outs)
    for out in outs:
        assert "stored pid=" in out


def test_mid_update_worker_kill_then_resume(tmp_path):
    """Worker 1 dies MID-update_library_distributed (after its first
    analysis round). Surviving hosts must error cleanly with NOTHING
    committed; a fresh cluster then resumes via the set-difference work
    list and every song lands exactly once."""
    import sqlite3

    procs, outs = _run_cluster("library_die", extra_args=[tmp_path])
    assert procs[1].returncode == 17, outs[1][-2000:]
    assert "DISTRIBUTED_WORKER_DYING pid=1" in outs[1]
    assert (
        "DOWNED_WORKER_DETECTED pid=0" in outs[0]
        or procs[0].returncode != 0
    ), outs[0][-4000:]
    # nothing committed by the crashed run
    db = tmp_path / "songs.db"
    with sqlite3.connect(db) as conn:
        n = conn.execute("select count(*) from song").fetchone()[0]
    assert n == 0, f"crashed run committed {n} rows"

    procs, outs = _run_cluster("library_resume", extra_args=[tmp_path])
    _assert_ok(procs, outs)
    for out in outs:
        assert "resumed" in out and "rows=4" in out
    with sqlite3.connect(db) as conn:
        paths = [
            r[0]
            for r in conn.execute("select path from song").fetchall()
        ]
    assert len(paths) == len(set(paths)) == 4, paths


def test_two_process_downed_worker():
    """Worker 1 exits after init; worker 0 must fail CLEANLY (error or
    cluster shutdown) within the heartbeat window — never hang."""
    procs, outs = _run_cluster("die", timeout=240)
    # worker 1 deliberately died with code 17
    assert procs[1].returncode == 17, outs[1][-2000:]
    assert "DISTRIBUTED_WORKER_DYING pid=1" in outs[1]
    # worker 0 either catches the collective failure (our marker) or the
    # coordination service terminates it with an error — both are clean;
    # a hang would have tripped the communicate() timeout above
    out0 = outs[0]
    assert (
        "DOWNED_WORKER_DETECTED pid=0" in out0 or procs[0].returncode != 0
    ), out0[-4000:]
