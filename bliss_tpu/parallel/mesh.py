"""Device-mesh scale-out.

The reference's only parallelism is host threads over songs
(bliss-rs src/song/decoder.rs:278-332) and its playlist math is
single-threaded scalar loops. The TPU-native equivalents:

  * batch analysis: data-parallel over a 1-D `Mesh(("songs",))` — the
    `[B, T]` padded song batch is sharded over its batch dim with
    `shard_map`; each chip runs the identical fused analyzer on its shard.
    No cross-chip communication is needed during analysis (songs are
    independent), so scaling rides ICI bandwidth-free.
  * library distance queries: the `[N, F]` library matrix is sharded
    row-wise; seed vectors are replicated. Each chip computes distances
    for its rows and a local top-k; a global top-k merges the per-chip
    candidates with one small all-gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "songs") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def sharded_analyze_batch(
    mesh: Mesh, batch: np.ndarray, lengths: np.ndarray, version: int = 2
) -> np.ndarray:
    """Analyze a `[B, T]` batch data-parallel over the mesh.

    `B` must be a multiple of the mesh size (pad with dummy songs and
    slice, the host driver does this).
    """
    from ..models.analyzer import analyze_samples

    axis = mesh.axis_names[0]
    batch_sharding = NamedSharding(mesh, P(axis, None))
    len_sharding = NamedSharding(mesh, P(axis))

    @functools.partial(jax.jit, out_shardings=NamedSharding(mesh, P(axis, None)))
    def run(b, l):
        b = jax.lax.with_sharding_constraint(b, batch_sharding)
        return jax.vmap(lambda s, n: analyze_samples(s, n, version))(b, l)

    b = jax.device_put(jnp.asarray(batch, jnp.float32), batch_sharding)
    l = jax.device_put(jnp.asarray(lengths, jnp.int32), len_sharding)
    return np.asarray(run(b, l))


def sharded_closest_distances(
    mesh: Mesh,
    library: np.ndarray,
    seeds: np.ndarray,
    weights: np.ndarray | None = None,
) -> np.ndarray:
    """Distances of every library row to a seed set, row-sharded.

    `library` is `[N, F]` (N padded to the mesh size), `seeds` `[K, F]`
    replicated. Returns `[N]` summed Mahalanobis distances.
    """
    axis = mesh.axis_names[0]
    lib_sharding = NamedSharding(mesh, P(axis, None))
    rep = NamedSharding(mesh, P())
    f = library.shape[-1]
    w = np.eye(f, dtype=np.float32) if weights is None else weights

    @functools.partial(jax.jit, out_shardings=NamedSharding(mesh, P(axis)))
    def run(lib, s, m):
        lib = jax.lax.with_sharding_constraint(lib, lib_sharding)
        d = lib[:, None, :] - s[None, :, :]
        q = jnp.einsum("nkf,fg,nkg->nk", d, m, d, precision="highest")
        return jnp.sum(jnp.sqrt(jnp.maximum(q, 0.0)), axis=1)

    lib = jax.device_put(jnp.asarray(library, jnp.float32), lib_sharding)
    s = jax.device_put(jnp.asarray(seeds, jnp.float32), rep)
    m = jax.device_put(jnp.asarray(w, jnp.float32), rep)
    return np.asarray(run(lib, s, m))


def sharded_top_k(
    mesh: Mesh,
    library: np.ndarray,
    seeds: np.ndarray,
    k: int,
    weights: np.ndarray | None = None,
    n_real: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Top-k closest library rows to a seed set, with a per-shard local
    top-k then a global merge (one tiny cross-chip gather instead of
    moving the full distance vector).

    Handles every shape degeneracy: `N` not divisible by the mesh size
    (rows are padded with +inf distances and never selected), `k` larger
    than a shard (each shard contributes min(k, shard_n) candidates —
    everything it holds, so a top-k cluster living on one chip is fully
    returned), and `k > N` (clamped to N).
    Returns `(indices, distances)`, both `[min(k, N)]`, sorted ascending
    with ties broken by row index (matches a stable host argsort).
    """
    from jax import shard_map

    axis = mesh.axis_names[0]
    # n_real: rows beyond it are caller-side padding (a pre-placed
    # mesh-multiple matrix) and must never be selected
    n = library.shape[0] if n_real is None else n_real
    f = library.shape[-1]
    w = np.eye(f, dtype=np.float32) if weights is None else weights
    n_dev = mesh.size
    k = min(k, n)
    if k <= 0:
        return np.zeros(0, np.int64), np.zeros(0, np.float32)
    if n_real is not None:
        if library.shape[0] % n_dev:
            raise ValueError(
                f"pre-padded library ({library.shape[0]} rows) must be a "
                f"multiple of the mesh size {n_dev} when n_real is given"
            )
        shard_n = library.shape[0] // n_dev
        pre_placed = isinstance(library, jax.Array)
    else:
        shard_n = -(-n // n_dev)  # ceil: rows per shard after padding
        n_pad = shard_n * n_dev
        pre_placed = isinstance(library, jax.Array) and n_pad == n
        if n_pad != n:
            library = np.concatenate(
                [np.asarray(library), np.zeros((n_pad - n, f), np.float32)]
            )
    k_local = min(k, shard_n)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P()),
        out_specs=(P(axis), P(axis)),
    )
    def local_topk(lib, s, m):
        d = lib[:, None, :] - s[None, :, :]
        q = jnp.einsum("nkf,fg,nkg->nk", d, m, d, precision="highest")
        dist = jnp.sum(jnp.sqrt(jnp.maximum(q, 0.0)), axis=1)
        base = jax.lax.axis_index(axis) * lib.shape[0]
        row = base + jnp.arange(lib.shape[0])
        dist = jnp.where(row < n, dist, jnp.inf)  # padded rows lose
        neg_top, idx = jax.lax.top_k(-dist, k_local)
        return idx + base, -neg_top

    lib_sharding = NamedSharding(mesh, P(axis, None))
    rep = NamedSharding(mesh, P())
    # a caller-placed [N(mesh-multiple), F] jax.Array is used as-is —
    # repeated queries then skip the host->device matrix upload
    lib = (
        library
        if pre_placed
        else jax.device_put(jnp.asarray(library, jnp.float32), lib_sharding)
    )
    s = jax.device_put(jnp.asarray(seeds, jnp.float32), rep)
    m = jax.device_put(jnp.asarray(w, jnp.float32), rep)
    idx, dist = jax.jit(local_topk)(lib, s, m)
    idx, dist = np.asarray(idx), np.asarray(dist)
    # stable global merge: sort by (distance, row index) so equal
    # distances resolve identically to a host-side stable argsort
    order = np.lexsort((idx, dist))[:k]
    return idx[order], dist[order]
