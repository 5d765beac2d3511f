"""Weak-scaling check of the multi-chip paths on a virtual CPU mesh.

Real multi-chip hardware isn't present in this sandbox, so this bench
validates the *scaling shape* (not absolute speed) of the three sharded
paths on an n-device CPU fake cluster:

  * `sharded_analyze_batch`: data-parallel songs — zero collectives, so
    per-device work should stay ~constant as devices and batch grow
    together (weak scaling);
  * `sharded_top_k`: row-sharded library distances with a k-candidate
    all-gather merge;
  * `longsong.sharded_chroma_features`: one song sharded over time with
    halo exchange + psum'd reductions.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python benches/scaling_bench.py
(The script re-execs itself with that environment when needed.)
"""

import json
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
N_DEVICES = int(os.environ.get("BLISS_SCALING_DEVICES", "8"))


def _reexec_on_cpu_mesh():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={N_DEVICES}"
    ).strip()
    env["BLISS_SCALING_CHILD"] = "1"
    # own cache dir: AOT results compiled for the fake multi-device CPU
    # target are not interchangeable with the default backend's cache
    env["BLISS_JAX_CACHE_DIR"] = f"/tmp/bliss_jax_cache_cpumesh_{os.getuid()}"
    os.execvpe(sys.executable, [sys.executable, __file__], env)


def main():
    import jax

    if (
        os.environ.get("BLISS_SCALING_CHILD") != "1"
        and len(jax.devices()) < N_DEVICES
    ):
        _reexec_on_cpu_mesh()

    import numpy as np

    sys.path.insert(0, str(REPO))
    from bliss_tpu.parallel.longsong import sharded_chroma_features
    from bliss_tpu.parallel.mesh import (
        make_mesh,
        sharded_analyze_batch,
        sharded_top_k,
    )

    rng = np.random.default_rng(0)
    t = 1 << 17  # per-song samples (small: CPU mesh)
    results = {}
    for n_dev in (1, 2, N_DEVICES):
        mesh = make_mesh(n_dev)
        batch = (rng.normal(size=(n_dev, t)) * 0.1).astype(np.float32)
        lengths = np.full((n_dev,), t - 17, np.int32)
        sharded_analyze_batch(mesh, batch, lengths)  # compile
        t0 = time.perf_counter()
        feats = sharded_analyze_batch(mesh, batch, lengths)
        dt_analyze = time.perf_counter() - t0

        n = 4096 * n_dev
        lib = rng.normal(size=(n, 23)).astype(np.float32)
        seeds = feats[:1]
        sharded_top_k(mesh, lib, seeds, k=8)  # compile
        t0 = time.perf_counter()
        sharded_top_k(mesh, lib, seeds, k=8)
        dt_topk = time.perf_counter() - t0

        t_long = n_dev * (1 << 16)
        sig = (rng.normal(size=t_long) * 0.1).astype(np.float32)
        sharded_chroma_features(mesh, sig, t_long)  # compile
        t0 = time.perf_counter()
        sharded_chroma_features(mesh, sig, t_long)
        dt_long = time.perf_counter() - t0

        results[n_dev] = (dt_analyze, dt_topk, dt_long)
        print(
            f"devices={n_dev}: analyze[B={n_dev} x {t}] {dt_analyze*1e3:7.1f} ms"
            f" | top-k[N={n}] {dt_topk*1e3:6.1f} ms"
            f" | longsong[T={t_long}] {dt_long*1e3:7.1f} ms",
            flush=True,
        )

    # Weak-scaling efficiency: per-device work is constant, so
    # t(1 dev)/t(N dev) ~ 1.0 is perfect. NOTE: on a single-core host
    # the N virtual devices timeshare one core, so the absolute value
    # here mostly measures host parallelism — the meaningful signals in
    # this sandbox are (a) every sharded path compiles and runs at every
    # mesh size and (b) the number on REAL chips, where analysis has
    # zero collectives and should scale ~linearly.
    a1 = results[1][0]
    aN = results[N_DEVICES][0]
    eff = a1 / aN
    print(
        json.dumps(
            {
                "metric": "weak_scaling_efficiency_analyze",
                "value": round(eff, 3),
                "unit": f"x (1 -> {N_DEVICES} virtual devices, 1-core host)",
            }
        )
    )

    # per-round DCN overhead of the multi-host seam (VERDICT r4 #7):
    # a 2-process gloo fake cluster times analyze_batch_distributed
    # rounds against the local analyzer (tests/_distributed_worker.py)
    _dcn_overhead_bench()


def _dcn_overhead_bench():
    import socket
    import subprocess

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()
    worker = REPO / "tests" / "_distributed_worker.py"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port), "dcn_bench"],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    for p in procs:
        out, _ = p.communicate(timeout=900)
        for line in out.splitlines():
            if line.startswith("DCN_BENCH "):
                print(line[len("DCN_BENCH "):], flush=True)
        if p.returncode != 0:
            print(f"dcn_bench worker failed:\n{out[-2000:]}", flush=True)


if __name__ == "__main__":
    main()
