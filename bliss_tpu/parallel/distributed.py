"""Multi-host (DCN) seam — SURVEY §2.3 "Distributed comm backend".

The reference is a single-process library; its only fabric is
`std::sync::mpsc` + `thread::spawn` (bliss-rs src/song/decoder.rs:292-331).
The TPU-native story for library-scale jobs spanning hosts: initialize
`jax.distributed`, build ONE global mesh over every chip of every host,
and run the same collective-free batch analyzer / top-k merge programs —
data-parallel shards ride ICI within a host and DCN across hosts, with
XLA inserting the transfers.

Each host decodes its own slice of the song list (the host-side decode
pool is per-process) and contributes the decoded `[B_local, T]` rows via
`jax.make_array_from_process_local_data`; features come back for the
local rows only, so no host ever materializes the global library.

Smoke-tested on a two-process CPU fake cluster (gloo collectives,
4 virtual devices per process — tests/test_distributed.py), the same
prescription SURVEY §4.7 gives for testing multi-chip code without
hardware.
"""

from __future__ import annotations

import functools

import numpy as np


def initialize(
    coordinator_address: str, num_processes: int, process_id: int
) -> None:
    """Join (or form) the cluster. On the CPU backend this selects gloo
    cross-process collectives (the fake-DCN for tests); on TPU pods the
    PJRT backend brings its own ICI/DCN transport."""
    import jax

    if jax.config.jax_platforms in ("cpu", None) or (
        jax.config.jax_platforms or ""
    ).startswith("cpu"):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis: str = "songs"):
    """A 1-D mesh over every device of every process."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def analyze_batch_distributed(
    mesh, local_batch: np.ndarray, local_lengths: np.ndarray, version: int = 2
) -> np.ndarray:
    """Analyze this host's `[B_local, T]` songs as one global sharded
    program; returns `[B_local, n_features]` for the local rows.

    Every process must call this collectively with the same `T` and the
    same per-process `B_local` (pad with MIN_SAMPLES-length dummy rows at
    the caller when hosts have ragged counts)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models.analyzer import analyze_samples

    axis = mesh.axis_names[0]
    batch_sh = NamedSharding(mesh, P(axis, None))
    len_sh = NamedSharding(mesh, P(axis))
    global_batch = jax.make_array_from_process_local_data(
        batch_sh, np.asarray(local_batch, np.float32)
    )
    global_lengths = jax.make_array_from_process_local_data(
        len_sh, np.asarray(local_lengths, np.int32)
    )
    fn = jax.jit(
        jax.vmap(functools.partial(analyze_samples, version=version)),
        in_shardings=(batch_sh, len_sh),
        out_shardings=batch_sh,
    )
    out = fn(global_batch, global_lengths)
    shards = sorted(
        out.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    return np.concatenate([np.asarray(s.data) for s in shards])


def top_k_distributed(
    mesh,
    local_rows: np.ndarray,
    row_offset: int,
    n_total: int,
    seeds: np.ndarray,
    k: int,
    weights: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Global top-k over a library whose rows live per-host.

    Each process passes its `[N_local, F]` shard (`row_offset` = global
    index of its first row); the per-chip local top-k candidates are
    merged with one small `all_gather` (k indices+distances per chip
    cross the DCN, not the library). Returns identical `(indices,
    distances)` on every process, ties broken by global row index.
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    n_dev = mesh.size
    f = local_rows.shape[-1]
    w = np.eye(f, dtype=np.float32) if weights is None else weights
    k = min(k, n_total)
    if k <= 0:
        return np.zeros(0, np.int64), np.zeros(0, np.float32)

    # pad local rows to a common per-device size
    shard_n = -(-n_total // n_dev)
    local_dev = max(1, len(jax.local_devices()))
    local_target = shard_n * local_dev
    n_local = local_rows.shape[0]
    if n_local < local_target:
        local_rows = np.concatenate(
            [
                local_rows,
                np.zeros((local_target - n_local, f), local_rows.dtype),
            ]
        )
    row_ids = row_offset + np.arange(local_target, dtype=np.int32)
    row_ids[n_local:] = n_total  # padded rows: masked out below
    k_local = min(k, shard_n)

    lib_sh = NamedSharding(mesh, P(axis, None))
    ids_sh = NamedSharding(mesh, P(axis))
    lib = jax.make_array_from_process_local_data(
        lib_sh, np.asarray(local_rows, np.float32)
    )
    ids = jax.make_array_from_process_local_data(ids_sh, row_ids)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(), P()),
        out_specs=(P(), P()),
        # outputs ARE replicated (they follow an all_gather) but the
        # static replication checker can't see through it
        check_vma=False,
    )
    def local_topk(rows, rid, s, m):
        d = rows[:, None, :] - s[None, :, :]
        q = jnp.einsum("nkf,fg,nkg->nk", d, m, d, precision="highest")
        dist = jnp.sum(jnp.sqrt(jnp.maximum(q, 0.0)), axis=1)
        dist = jnp.where(rid < n_total, dist, jnp.inf)
        neg_top, local_i = jax.lax.top_k(-dist, k_local)
        cand_ids = rid[local_i]
        # the merge: k_local candidates per chip cross the fabric
        all_ids = jax.lax.all_gather(cand_ids, axis).reshape(-1)
        all_d = jax.lax.all_gather(-neg_top, axis).reshape(-1)
        return all_ids, all_d

    rep = NamedSharding(mesh, P())
    s = jax.device_put(np.asarray(seeds, np.float32), rep)
    m = jax.device_put(np.asarray(w, np.float32), rep)
    ids_out, d_out = jax.jit(local_topk)(lib, ids, s, m)
    ids_out = np.asarray(ids_out)
    d_out = np.asarray(d_out)
    order = np.lexsort((ids_out, d_out))[:k]
    return ids_out[order].astype(np.int64), d_out[order]
