"""Sequence parallelism: one very long song sharded over the mesh.

The reference's only "long context" handling is streaming windows
(SURVEY §2.3, §5); its chroma descriptor deliberately reads the whole
song because the tuning estimate is a global histogram over all frames
(bliss-rs src/chroma.rs:67-85). The TPU equivalent for hour-long files
(CUE albums): shard the *time axis* across chips and keep cross-chip
traffic to

  * one halo exchange (`ppermute`) of window-sized sample margins so
    every chip can build its own STFT frames (incl. reflect padding),
  * `psum`s for the tuning histogram, the global peak-magnitude median
    (bitwise-bisected exact selection), and the final interval-feature
    frame means.

Everything else is chip-local. Numerics match the single-device chroma
path exactly (same frame math, same reductions).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import chroma as chroma_model
from ..ops import n_frames_stft
from ..ops.spectral import _windowed_mags

WINDOW = chroma_model.WINDOW_SIZE  # 8192
HOP = chroma_model.HOP_SIZE  # 2205
_PAD = WINDOW // 2


def _float_key(x: jnp.ndarray) -> jnp.ndarray:
    """Monotone int32 mapping of float32 (total order, IEEE)."""
    i = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    return jnp.where(i < 0, jnp.int32(-(2**31)) - i - 1, i)


def _global_kth_smallest(values, mask, k, axis_name):
    """Exact k-th smallest masked value across all shards: 32-round
    bisection on the float's order-isomorphic unsigned key, one psum of a
    count per round."""
    # unsigned monotone key: bias the signed key into [0, 2^32)
    keys = _float_key(values).astype(jnp.uint32) ^ jnp.uint32(0x80000000)
    keys = jnp.where(mask, keys, jnp.uint32(0xFFFFFFFF))

    def body(_, bounds):
        lo, hi = bounds
        mid = lo + (hi - lo) // jnp.uint32(2)
        cnt = jax.lax.psum(
            jnp.sum((keys <= mid) & mask, dtype=jnp.int32), axis_name
        )
        take_low = cnt >= k + 1
        return (
            jnp.where(take_low, lo, mid + jnp.uint32(1)),
            jnp.where(take_low, mid, hi),
        )

    lo = jnp.uint32(0)
    hi = jnp.uint32(0xFFFFFFFF)
    ukey, _ = jax.lax.fori_loop(0, 32, body, (lo, hi))
    key = (ukey ^ jnp.uint32(0x80000000)).astype(jnp.int32)
    # invert _float_key (it is an involution on int32)
    orig = jnp.where(key >= 0, key, jnp.int32(-(2**31)) - key - 1)
    return jax.lax.bitcast_convert_type(orig, jnp.float32)


def _global_median_midpoint(values, mask, axis_name):
    """Midpoint median across shards (ndarray-stats Midpoint semantics)."""
    n = jax.lax.psum(jnp.sum(mask, dtype=jnp.int32), axis_name)
    pos = (n - 1).astype(jnp.float32) * 0.5
    lo_k = jnp.floor(pos).astype(jnp.int32)
    hi_k = jnp.ceil(pos).astype(jnp.int32)
    vlo = _global_kth_smallest(values, mask, lo_k, axis_name)
    vhi = _global_kth_smallest(values, mask, hi_k, axis_name)
    return (vlo + vhi) * jnp.float32(0.5)


def _local_frames(shard, left, right, d, shard_len, frames_per_shard, length):
    """Build this shard's chroma STFT frames from [left | shard | right].

    Global frame f starts at `f*HOP - _PAD` (reflect-padded coordinates);
    frames `[d*frames_per_shard, (d+1)*frames_per_shard)` are local.
    Reflected positions (around 0 and `length`) stay within one halo of
    the owning shard because `_PAD < halo`.
    """
    halo = left.shape[0]
    ext = jnp.concatenate([left, shard, right])
    base = d * shard_len - halo  # global index of ext[0]

    f0 = d * frames_per_shard
    pos = (
        (jnp.arange(frames_per_shard, dtype=jnp.int32)[:, None] + f0) * HOP
        + jnp.arange(WINDOW, dtype=jnp.int32)[None, :]
        - _PAD
    )
    length = jnp.asarray(length, jnp.int32)
    idx = jnp.where(pos < 0, -pos, pos)
    idx = jnp.where(idx >= length, 2 * (length - 1) - idx, idx)
    local = jnp.clip(idx - base, 0, ext.shape[0] - 1)
    return ext[local]


def sharded_chroma_features(
    mesh: Mesh, signal: np.ndarray, length: int, version: int = 2
) -> np.ndarray:
    """Chroma features of one long `[T]` signal, time-sharded over `mesh`.

    Any `T`: the signal is zero-padded up to a mesh multiple (and to the
    minimum viable shard size); padded samples/frames are masked out via
    `length`, so results match the single-device chroma path exactly.
    """
    from jax import shard_map

    axis = mesh.axis_names[0]
    d_count = mesh.size
    t = signal.shape[-1]
    halo = WINDOW + HOP  # covers window overhang + reflect margin
    shard_len = max(-(-t // d_count), halo)
    t_pad = shard_len * d_count
    if t_pad != t:
        signal = np.concatenate(
            [
                np.asarray(signal, np.float32),
                np.zeros(t_pad - t, np.float32),
            ]
        )
        t = t_pad

    n_frames = int(n_frames_stft(t, HOP))
    frames_per_shard = -(-n_frames // d_count)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
    )
    def kernel(sig_shard, length_arr):
        length_s = length_arr[0]
        sig_shard = sig_shard  # [shard_len]
        d = jax.lax.axis_index(axis)

        # halo exchange: left neighbor's tail and right neighbor's head
        fwd = [(i, (i + 1) % d_count) for i in range(d_count)]
        bwd = [(i, (i - 1) % d_count) for i in range(d_count)]
        left = jax.lax.ppermute(sig_shard[-halo:], axis, fwd)
        right = jax.lax.ppermute(sig_shard[:halo], axis, bwd)
        # edges: reflect logic never reads into the wrapped halos because
        # reflected indices stay within the owning shard, but zero them to
        # be safe for masked frames
        left = jnp.where(d == 0, jnp.zeros_like(left), left)
        right = jnp.where(d == d_count - 1, jnp.zeros_like(right), right)

        frames = _local_frames(
            sig_shard, left, right, d, shard_len, frames_per_shard, length_s
        )
        mags = _windowed_mags(frames).astype(jnp.float32)  # [Fd, 4097]
        spectrum = mags.T  # [4097, Fd]

        f0 = d * frames_per_shard
        frame_ids = jnp.arange(frames_per_shard, dtype=jnp.int32) + f0
        valid = frame_ids < n_frames_stft(length_s, HOP)

        # --- tuning: local peaks, global median + histogram
        pitches, pmags, peak_mask = chroma_model.pip_track(
            spectrum, valid, WINDOW
        )
        pitches, pmags = pitches.ravel(), pmags.ravel()
        peak_mask = peak_mask.ravel()
        pos_mask = peak_mask & (pitches > 0.0)
        threshold = _global_median_midpoint(pmags, pos_mask, axis)
        sel = pos_mask & (pmags >= threshold)

        octs = chroma_model.hz_to_octs(
            jnp.maximum(pitches, jnp.finfo(jnp.float32).tiny), 0.0
        )
        v = jnp.mod(12 * octs, 1.0)
        v = jnp.where(v >= 0.5, v - 1.0, v)
        idx = jnp.clip(((v + 0.5) / 0.01).astype(jnp.int32), 0, 99)
        counts = jnp.zeros((100,), jnp.int32).at[idx].add(
            sel.astype(jnp.int32), mode="drop"
        )
        counts = jax.lax.psum(counts, axis)
        any_peak = jax.lax.psum(
            jnp.sum(peak_mask, dtype=jnp.int32), axis
        ) > 0
        tuning = (-50.0 + jnp.argmax(counts).astype(jnp.float32)) / 100.0
        tuning = jnp.where(any_peak, tuning, 0.0)

        # --- chroma + interval features, local frames then global mean
        chroma = chroma_model.chroma_stft_from_spectrum(
            spectrum, tuning, WINDOW
        )
        feats = chroma_model.interval_feature_matrix(chroma)  # [10, Fd]
        local_sum = jnp.sum(
            jnp.where(valid[None, :], feats, 0.0), axis=-1
        )
        total = jax.lax.psum(local_sum, axis)
        count = jax.lax.psum(jnp.sum(valid, dtype=jnp.float32), axis)
        raw = total / jnp.maximum(count, 1.0)

        if version == 1:
            return chroma_model._postprocess_v1(raw)
        return chroma_model._postprocess_v2(raw)

    sig_sharding = NamedSharding(mesh, P(axis))
    sig = jax.device_put(jnp.asarray(signal, jnp.float32), sig_sharding)
    length_arr = jnp.asarray([length], jnp.int32)
    return np.asarray(jax.jit(kernel)(sig, length_arr))
