"""Two-process CPU fake-cluster smoke for the multi-host seam
(SURVEY §2.3 "Distributed comm backend"): gloo collectives stand in for
DCN, 4 virtual devices per process stand in for each host's chips."""

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


def test_two_process_fake_cluster():
    port = _free_port()
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
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                str(HERE / "_distributed_worker.py"),
                str(pid),
                str(port),
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"DISTRIBUTED_SMOKE_OK pid={pid}" in out, out[-4000:]
