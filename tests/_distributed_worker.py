"""Worker process for the two-host fake-cluster smoke
(tests/test_distributed.py). Run as:
    python _distributed_worker.py <process_id> <coordinator_port>
with JAX_PLATFORMS=cpu and 4 forced host devices in the environment."""

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
)


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    mesh = global_mesh()
    assert mesh.size == 8, mesh
    assert len(jax.local_devices()) == 4

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

    print(f"DISTRIBUTED_SMOKE_OK pid={pid}", flush=True)


if __name__ == "__main__":
    main()
