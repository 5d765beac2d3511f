"""Multi-host (DCN) layer — SURVEY §2.3 "Distributed comm backend".

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
Ragged per-host batch counts and mismatched pad lengths are handled
INSIDE `analyze_batch_distributed` (one tiny `process_allgather` of the
local shape, dummy-row padding, local-rows-only return) — callers never
coordinate shapes by hand.

`update_library_distributed` is the integrated driver (the analog of the
reference's only scale driver, src/library.rs:1000-1093 + 1187-1293):
a deterministic set-difference split across hosts, synchronized
mesh-analysis rounds, every host committing its own rows to one shared
SQLite database.

Tested on two-process CPU fake clusters (gloo collectives, 4 virtual
devices per process — tests/test_distributed.py): equal and UNEQUAL
per-host workloads, a downed-worker failure path, and the shared-DB
`update_library_distributed` round-trip.
"""

from __future__ import annotations

import functools
import pathlib

import numpy as np


def initialize(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    heartbeat_timeout_seconds: int | None = None,
) -> None:
    """Join (or form) the cluster. On the CPU backend this selects gloo
    cross-process collectives (the fake-DCN for tests); on TPU pods the
    PJRT backend brings its own ICI/DCN transport.

    `heartbeat_timeout_seconds` bounds how long the cluster survives a
    dead peer: the coordination service detects the missed heartbeats
    and shuts down the remaining processes with an error instead of
    letting a collective hang forever (the downed-worker story;
    default = jax's, ~100 s)."""
    import jax

    if jax.config.jax_platforms in ("cpu", None) or (
        jax.config.jax_platforms or ""
    ).startswith("cpu"):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    kwargs = {}
    if heartbeat_timeout_seconds is not None:
        kwargs["heartbeat_timeout_seconds"] = heartbeat_timeout_seconds
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def global_mesh(axis: str = "songs"):
    """A 1-D mesh over every device of every process."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def _local_rows(global_array) -> np.ndarray:
    """This process's rows of a row-sharded global array, in row order."""
    shards = sorted(
        global_array.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    return np.concatenate([np.asarray(s.data) for s in shards])


def analyze_batch_distributed(
    mesh, local_batch: np.ndarray, local_lengths: np.ndarray, version: int = 2
) -> np.ndarray:
    """Analyze this host's `[B_local, T_local]` songs as one global
    sharded program; returns `[B_local, n_features]` for the local rows.

    Collective: every process must call it together, but per-host row
    counts may be RAGGED (including zero) and pad lengths may differ —
    one `process_allgather` of the local shape agrees on the global
    `[B_target, T_global]` envelope, hosts pad internally with
    MIN_SAMPLES dummy rows / zero columns, and only the real local rows
    come back.
    """
    import jax
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models.analyzer import MIN_SAMPLES, analyze_samples

    local_batch = np.asarray(local_batch, np.float32)
    if local_batch.ndim != 2:
        local_batch = local_batch.reshape(local_batch.shape[0], -1)
    b_local = local_batch.shape[0]
    t_local = local_batch.shape[1] if b_local else 0

    # agree on the global envelope (tiny host-level collective)
    info = multihost_utils.process_allgather(
        np.array([b_local, t_local], np.int64)
    ).reshape(-1, 2)
    max_b = int(info[:, 0].max())
    t_glob = max(int(info[:, 1].max()), MIN_SAMPLES)
    n_feat = 23 if version == 2 else 20
    if max_b == 0:
        return np.zeros((0, n_feat), np.float32)

    # every host contributes the same padded block: rows to the device
    # multiple, columns to the global T
    local_dev = max(1, len(jax.local_devices()))
    target_b = -(-max_b // local_dev) * local_dev
    batch = np.zeros((target_b, t_glob), np.float32)
    if b_local:
        batch[:b_local, :t_local] = local_batch
    lengths = np.full((target_b,), MIN_SAMPLES, np.int32)
    lengths[:b_local] = np.asarray(local_lengths, np.int32)

    axis = mesh.axis_names[0]
    batch_sh = NamedSharding(mesh, P(axis, None))
    len_sh = NamedSharding(mesh, P(axis))
    global_batch = jax.make_array_from_process_local_data(batch_sh, batch)
    global_lengths = jax.make_array_from_process_local_data(len_sh, lengths)
    fn = jax.jit(
        jax.vmap(functools.partial(analyze_samples, version=version)),
        in_shardings=(batch_sh, len_sh),
        out_shardings=batch_sh,
    )
    out = fn(global_batch, global_lengths)
    return _local_rows(out)[:b_local]


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
    index of its first row); each chip computes its local top-k in a
    `shard_map` whose outputs stay per-shard (no replication claim for
    the static checker to reject), and the k-candidates-per-chip merge
    crosses the DCN as one tiny host-level `process_allgather` — the
    library itself never moves. Returns identical `(indices, distances)`
    on every process, ties broken by global row index.
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.experimental import multihost_utils
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
        out_specs=(P(axis), P(axis)),
    )
    def local_topk(rows, rid, s, m):
        d = rows[:, None, :] - s[None, :, :]
        q = jnp.einsum("nkf,fg,nkg->nk", d, m, d, precision="highest")
        dist = jnp.sum(jnp.sqrt(jnp.maximum(q, 0.0)), axis=1)
        dist = jnp.where(rid < n_total, dist, jnp.inf)
        neg_top, local_i = jax.lax.top_k(-dist, k_local)
        return rid[local_i], -neg_top

    rep = NamedSharding(mesh, P())
    s = jax.device_put(np.asarray(seeds, np.float32), rep)
    m = jax.device_put(np.asarray(w, np.float32), rep)
    ids_out, d_out = jax.jit(local_topk)(lib, ids, s, m)
    # the merge: k_local candidates per local chip cross the DCN once
    all_ids = multihost_utils.process_allgather(
        _local_rows(ids_out)
    ).reshape(-1)
    all_d = multihost_utils.process_allgather(_local_rows(d_out)).reshape(-1)
    order = np.lexsort((all_ids, all_d))[:k]
    return all_ids[order].astype(np.int64), all_d[order]


def analyze_paths_distributed(
    decoder_cls,
    local_paths,
    mesh,
    analysis_options=None,
    round_size: int = 8,
):
    """Analyze this host's slice of a song list through the global mesh.

    Collective: every host calls with ITS paths (ragged counts fine,
    CUE sheets fan out). Decode runs on the local host; analysis runs in
    synchronized global rounds of ≤`round_size` songs per host (hosts
    that run out contribute empty rounds so the collectives stay
    matched). Returns `[(path, Song | BlissError)]` for the local slice.
    """
    from jax.experimental import multihost_utils

    from ..errors import AnalysisError, BlissError, DecodingError
    from ..io.batch import _decode_cue, _Decoded, _make_song
    from ..models.analyzer import MIN_SAMPLES, bucket_length
    from ..song import AnalysisOptions

    opts = analysis_options or AnalysisOptions()
    version = int(opts.features_version)
    results: list = []
    ok: list = []
    for path in map(pathlib.Path, local_paths):
        try:
            if path.suffix.lower() == ".cue":
                entries = _decode_cue(decoder_cls, path, 0)
            else:
                entries = [_Decoded(0, path, raw=decoder_cls.decode(path))]
        except BlissError as e:
            entries = [_Decoded(0, path, error=e)]
        except Exception as e:  # pragma: no cover - defensive
            entries = [_Decoded(0, path, error=DecodingError(str(e)))]
        for d in entries:
            if d.error is not None:
                results.append((d.path, d.error))
                continue
            d.n = int(d.raw.sample_array.shape[0])
            if d.n < MIN_SAMPLES:
                results.append(
                    (d.path, AnalysisError("empty or too short song."))
                )
                continue
            ok.append(d)

    counts = multihost_utils.process_allgather(
        np.array([len(ok)], np.int64)
    )
    n_rounds = -(-int(counts.max()) // round_size)
    for r in range(n_rounds):
        chunk = ok[r * round_size : (r + 1) * round_size]
        t = max((bucket_length(d.n) for d in chunk), default=MIN_SAMPLES)
        batch = np.zeros((len(chunk), t), np.float32)
        lengths = np.zeros((len(chunk),), np.int32)
        for i, d in enumerate(chunk):
            batch[i, : d.n] = d.raw.sample_array
            d.raw.sample_array = None  # bound host RAM per round
            lengths[i] = d.n
        feats = analyze_batch_distributed(mesh, batch, lengths, version)
        for d, f in zip(chunk, feats):
            results.append((d.path, _make_song(d.raw, f, opts)))
    return results


def update_library_distributed(
    library,
    paths,
    mesh,
    process_id: int,
    num_processes: int,
    analysis_options=None,
    round_size: int = 8,
):
    """`Library.update_library` split across the hosts of a cluster, all
    committing to ONE shared SQLite database.

    The integrated multi-host driver (the reference's analog is its
    single-host thread fan-out at src/library.rs:1000-1093): every host
    opens the same `Library` (shared config/DB path), computes the SAME
    deterministic set-difference work list, takes the
    `process_id`-th round-robin slice, analyzes it through the global
    mesh (`analyze_paths_distributed`), and stores its own rows — each
    song in its own transaction, so per-host commits interleave safely
    under SQLite's file lock. Returns (n_success, n_failure) locally.
    """
    from jax.experimental import multihost_utils

    from .. import library as library_mod
    from ..song import Song

    opts = analysis_options or library.config.analysis_options
    with library._lock:
        existing = {
            pathlib.Path(r[0])
            for r in library.sqlite_conn.execute(
                "select path from song where analyzed = true and "
                "version = ? order by id",
                (int(opts.features_version),),
            )
        }
    todo = sorted(
        {pathlib.Path(p) for p in paths} - existing, key=str
    )
    if todo and process_id == 0:
        # one host purges other-version rows (idempotent but avoids
        # write contention); everyone syncs before analysis begins
        with library._lock:
            library.sqlite_conn.execute(
                "delete from song where version != ?",
                (int(opts.features_version),),
            )
            library.sqlite_conn.commit()
        library._invalidate_matrix_cache()
    multihost_utils.sync_global_devices("bliss_update_library_purge")

    local = todo[process_id::num_processes]
    results = analyze_paths_distributed(
        library.decoder_cls, local, mesh, opts, round_size=round_size
    )
    success = failure = 0
    for path, result in results:
        if isinstance(result, Song):
            library.store_song(library_mod.LibrarySong(result, None))
            success += 1
        else:
            library.store_failed_song(path, result, opts.features_version)
            failure += 1
    multihost_utils.sync_global_devices("bliss_update_library_done")
    if process_id == 0:
        library.config.analysis_options = opts
        library.config.write()
    return success, failure
