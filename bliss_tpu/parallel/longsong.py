"""Sequence parallelism: one very long song sharded over the mesh.

The reference's only "long context" handling is streaming windows
(SURVEY §2.3, §5); its chroma descriptor deliberately reads the whole
song because the tuning estimate is a global histogram over all frames
(bliss-rs src/chroma.rs:67-85), and its other descriptors stream
(src/song/mod.rs:432-491). The TPU equivalent for hour-long files:
shard the *time axis* across chips and keep cross-chip traffic small:

  * ONE halo exchange (`ppermute`) of window-sized sample margins so
    every chip can build all of its own descriptor frames (chroma
    8192/2205 reflect frames, timbral 512/128 and tempo 512/256 strided
    frames, loudness 1024-chunks, ZCR neighbor samples),
  * `psum`s for the tuning histogram, the global peak-magnitude median
    (bitwise-bisected exact selection), the interval-feature frame
    means, and the ZCR count,
  * small `all_gather`s of *per-frame scalar series* (timbral
    centroid/rolloff/flatness, tempo novelty + silence, loudness chunk
    levels — a few MB/hour of audio) so the cheap summary stages
    (masked mean/std, the sequential beat-tracking scan) run replicated
    with single-device semantics.

Everything heavy (frame DFTs) is chip-local. Frame ownership is derived
from SAMPLE ranges — shard `d` owns chroma frame `f` iff `f*hop` lies in
its sample range — so a frame's window never strays more than
`window/2 < halo` beyond the shard's samples (an equal-frames-per-shard
split drifts by ~hop per shard and can overrun the halo on long
signals; measured 3e-4 parity breach at 45 s on 8 shards).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import chroma as chroma_model
from ..models import loudness as loudness_model
from ..models import tempo as tempo_model
from ..models import timbral as timbral_model
from ..ops import n_frames_stft, n_frames_strided, normalize_range
from ..ops.spectral import _windowed_mags, pvoc_mags_buggy

WINDOW = chroma_model.WINDOW_SIZE  # 8192
HOP = chroma_model.HOP_SIZE  # 2205
_PAD = WINDOW // 2

T_WIN = timbral_model.WINDOW_SIZE  # 512
T_HOP = timbral_model.HOP_SIZE  # 128
B_WIN = tempo_model.WINDOW_SIZE  # 512
B_HOP = tempo_model.HOP_SIZE  # 256
L_CHUNK = loudness_model.WINDOW_SIZE  # 1024

#: sample halo: covers the chroma reflect window (window/2 + hop of
#: ownership slack), the tempo/timbral strided-frame history (<=2048)
#: and the silence/loudness lookahead (<=1024).
HALO = WINDOW + HOP  # 10397

#: shard length granularity: loudness chunks (1024) align exactly, and
#: 128/256 hops divide it, so all strided descriptors split evenly.
_GRAIN = L_CHUNK


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


def _strided_local_frames(ext, base, f_start, n_local, window, hop, offset):
    """`[n_local, window]` strided frames from the halo-extended shard.

    Frame `f_start + j` covers global samples
    `[(f_start+j)*hop - offset, ... + window)`; positions `< 0` read zero
    (the aubio zero-history semantics, ops.windows.frame_signal).
    Callers guarantee every position lies inside `ext`'s global range.
    """
    pos = (
        (jnp.arange(n_local, dtype=jnp.int32)[:, None] + f_start) * hop
        - offset
        + jnp.arange(window, dtype=jnp.int32)[None, :]
    )
    local = jnp.clip(pos - base, 0, ext.shape[0] - 1)
    return jnp.where(pos < 0, jnp.zeros((), ext.dtype), ext[local])


def _chroma_local_frames(ext, base, f_lo, fps_max, length):
    """This shard's chroma STFT frames from [left | shard | right].

    Global frame `f` starts at `f*HOP - _PAD` in reflect-padded
    coordinates; this shard owns frames `[f_lo, f_lo + own)` (ownership
    by sample range: `f*HOP` inside the shard), computes `fps_max`
    frames and masks the tail. Reflected positions (around 0 and
    `length`) stay within one halo of the owning shard since
    `_PAD + HOP < HALO`.
    """
    pos = (
        (jnp.arange(fps_max, dtype=jnp.int32)[:, None] + f_lo) * HOP
        + jnp.arange(WINDOW, dtype=jnp.int32)[None, :]
        - _PAD
    )
    length = jnp.asarray(length, jnp.int32)
    idx = jnp.where(pos < 0, -pos, pos)
    idx = jnp.where(idx >= length, 2 * (length - 1) - idx, idx)
    local = jnp.clip(idx - base, 0, ext.shape[0] - 1)
    return ext[local]


def _chroma_raw(sig_shard, left, right, d, shard_len, fps_max, length_s, axis):
    """Raw [10] interval features of the time-sharded chroma pipeline
    (exact cross-shard reductions; see module docstring)."""
    halo = left.shape[0]
    ext = jnp.concatenate([left, sig_shard, right])
    base = d * shard_len - halo

    # ownership: frame f belongs to shard floor(f*HOP / shard_len)
    f_lo = (d * shard_len + HOP - 1) // HOP
    f_hi = ((d + 1) * shard_len + HOP - 1) // HOP
    own = jnp.arange(fps_max, dtype=jnp.int32) < (f_hi - f_lo)

    frames = _chroma_local_frames(ext, base, f_lo, fps_max, length_s)
    mags = _windowed_mags(frames).astype(jnp.float32)  # [fps_max, 4097]
    spectrum = mags.T  # [4097, fps_max]

    frame_ids = jnp.arange(fps_max, dtype=jnp.int32) + f_lo
    valid = own & (frame_ids < n_frames_stft(length_s, HOP))

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
    any_peak = jax.lax.psum(jnp.sum(peak_mask, dtype=jnp.int32), axis) > 0
    tuning = (-50.0 + jnp.argmax(counts).astype(jnp.float32)) / 100.0
    tuning = jnp.where(any_peak, tuning, 0.0)

    # --- chroma + interval features, local frames then global mean
    chroma = chroma_model.chroma_stft_from_spectrum(spectrum, tuning, WINDOW)
    feats = chroma_model.interval_feature_matrix(chroma)  # [10, fps_max]
    local_sum = jnp.sum(jnp.where(valid[None, :], feats, 0.0), axis=-1)
    total = jax.lax.psum(local_sum, axis)
    count = jax.lax.psum(jnp.sum(valid, dtype=jnp.float32), axis)
    return total / jnp.maximum(count, 1.0)


def _shard_geometry(t: int, d_count: int):
    """(shard_len, t_pad): grain-aligned shard size covering `t`."""
    shard_len = max(
        -(-t // (d_count * _GRAIN)) * _GRAIN,
        -(-(HALO + 1) // _GRAIN) * _GRAIN,
    )
    return shard_len, shard_len * d_count


def _pad_signal(signal: np.ndarray, t_pad: int) -> np.ndarray:
    signal = np.asarray(signal, np.float32)
    if signal.shape[-1] < t_pad:
        signal = np.concatenate(
            [signal, np.zeros(t_pad - signal.shape[-1], np.float32)]
        )
    return signal


def _halo_exchange(sig_shard, d, axis, d_count):
    """left/right sample margins via two ppermutes; the global edges
    read zeros (= the driver's zero padding / zero history)."""
    fwd = [(i, (i + 1) % d_count) for i in range(d_count)]
    bwd = [(i, (i - 1) % d_count) for i in range(d_count)]
    left = jax.lax.ppermute(sig_shard[-HALO:], axis, fwd)
    right = jax.lax.ppermute(sig_shard[:HALO], axis, bwd)
    left = jnp.where(d == 0, jnp.zeros_like(left), left)
    right = jnp.where(d == d_count - 1, jnp.zeros_like(right), right)
    return left, right


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
    shard_len, t_pad = _shard_geometry(signal.shape[-1], d_count)
    signal = _pad_signal(signal, t_pad)
    fps_max = shard_len // HOP + 2

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(axis), P()), out_specs=P()
    )
    def kernel(sig_shard, length_arr):
        length_s = length_arr[0]
        d = jax.lax.axis_index(axis)
        left, right = _halo_exchange(sig_shard, d, axis, d_count)
        raw = _chroma_raw(
            sig_shard, left, right, d, shard_len, fps_max, length_s, axis
        )
        if version == 1:
            return chroma_model._postprocess_v1(raw)
        return chroma_model._postprocess_v2(raw)

    sig = jax.device_put(
        jnp.asarray(signal, jnp.float32), NamedSharding(mesh, P(axis))
    )
    length_arr = jnp.asarray([length], jnp.int32)
    return np.asarray(jax.jit(kernel)(sig, length_arr))


def _make_sharded_analyzer(mesh: Mesh, shard_len: int, version: int):
    """jitted full-pipeline analyzer over `mesh` for one shard length."""
    from jax import shard_map

    axis = mesh.axis_names[0]
    d_count = mesh.size
    fps_max = shard_len // HOP + 2
    hps = shard_len // B_HOP  # tempo hops per shard
    fps_t = shard_len // T_HOP  # timbral frames per shard
    cps = shard_len // L_CHUNK  # loudness chunks per shard

    # check_vma=False: the beat-tracking scan mixes gathered (varying-
    # marked but value-identical) series with invariant carry init;
    # every cross-shard value here flows through psum/all_gather first,
    # so all shards compute identical outputs by construction.
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    def kernel(sig_shard, length_arr):
        length_s = length_arr[0]
        d = jax.lax.axis_index(axis)
        left, right = _halo_exchange(sig_shard, d, axis, d_count)
        ext = jnp.concatenate([left, sig_shard, right])
        base = d * shard_len - HALO

        # ---- chroma (exact psum reductions)
        raw_chroma = _chroma_raw(
            sig_shard, left, right, d, shard_len, fps_max, length_s, axis
        )
        chroma = (
            chroma_model._postprocess_v1(raw_chroma)
            if version == 1
            else chroma_model._postprocess_v2(raw_chroma)
        )

        # ---- timbral: local per-frame descriptors, gathered summaries
        fr_t = _strided_local_frames(
            ext, base, d * fps_t, fps_t, T_WIN, T_HOP, T_WIN - T_HOP
        )
        cent, roll, flat = timbral_model.frame_descriptors_from_mags(
            pvoc_mags_buggy(fr_t)
        )
        series_t = jnp.stack([cent, roll, flat])  # [3, fps_t]
        g_t = jax.lax.all_gather(series_t, axis)  # [D, 3, fps_t]
        g_t = jnp.moveaxis(g_t, 0, 1).reshape(3, -1)  # hop order
        n_valid_t = n_frames_strided(length_s, T_WIN, T_HOP)
        mask_t = jnp.arange(g_t.shape[-1], dtype=jnp.int32) < n_valid_t
        spectral = timbral_model.summarize_spectral(
            g_t[0], g_t[1], g_t[2], mask_t
        )

        # ---- tempo: local novelty + silence, replicated scan
        # frames for hops [h0-7, h0+hps): onset needs the previous
        # frame's mags, the 7-slot peak-picker window needs 6 more
        h0 = d * hps
        fr_b = _strided_local_frames(
            ext, base, h0 - 7, hps + 7, B_WIN, B_HOP, B_WIN - B_HOP
        )
        mags_b = _windowed_mags(fr_b).astype(jnp.float32)  # [hps+7, 257]
        onset_loc = jnp.sum(
            jnp.maximum(mags_b[1:] - mags_b[:-1], 0.0), axis=-1
        )  # hops [h0-6, h0+hps)
        windows = jnp.stack(
            [onset_loc[i : i + hps] for i in range(7)], axis=1
        )  # [hps, 7] = onset[h-6..h]
        proc = tempo_model._filtfilt7(windows)
        thresh_loc = (
            proc[:, 5]
            - jnp.median(proc, axis=1)
            - jnp.mean(proc, axis=1) * jnp.float32(tempo_model._PP_THRESHOLD)
        )
        # silence gate: raw frame at hop h spans [256h, 256h+512)
        b = jnp.sum(
            jnp.reshape(sig_shard, (-1, B_HOP)) ** 2, axis=-1
        )  # [2*hps']... shard_len/B_HOP blocks
        b_next = jnp.concatenate(
            [b[1:], jnp.sum(right[:B_HOP] ** 2)[None]]
        )
        level_b = (b + b_next) / jnp.float32(B_WIN)
        silent_loc = 10.0 * jnp.log10(level_b) < tempo_model.SILENCE_DB

        thresh_g = jax.lax.all_gather(thresh_loc, axis).reshape(-1)
        silent_g = jax.lax.all_gather(silent_loc, axis).reshape(-1)
        h_valid = n_frames_strided(length_s, B_WIN, B_HOP)
        tempo = tempo_model.tempo_from_series(thresh_g, silent_g, h_valid)

        # ---- loudness: local chunk levels, gathered summaries
        e = jnp.sum(jnp.reshape(sig_shard, (cps, L_CHUNK)) ** 2, axis=-1)
        starts = (
            d * shard_len
            + jnp.arange(cps, dtype=jnp.int32) * L_CHUNK
        )
        clen_loc = jnp.clip(length_s - starts, 0, L_CHUNK)
        level_loc = e / jnp.maximum(clen_loc, 1).astype(e.dtype)
        level_g = jax.lax.all_gather(level_loc, axis).reshape(-1)
        starts_g = jnp.arange(level_g.shape[0], dtype=jnp.int32) * L_CHUNK
        clen_g = jnp.clip(length_s - starts_g, 0, L_CHUNK)
        loud = loudness_model.summarize_levels(level_g, clen_g)

        # ---- zcr: neighbor-sample sign changes, exact psum count
        prev = jnp.concatenate([left[-1:], sig_shard[:-1]])
        gi = d * shard_len + jnp.arange(shard_len, dtype=jnp.int32)
        change = (
            ((sig_shard > 0) != (prev > 0)) & (gi >= 1) & (gi < length_s)
        )
        crossings = jax.lax.psum(
            jnp.sum(change, dtype=jnp.int32), axis
        )
        rate = crossings.astype(jnp.float32) / length_s.astype(jnp.float32)
        zcr = normalize_range(rate, 0.0, 1.0).astype(jnp.float32)

        return jnp.concatenate(
            [tempo[None], zcr[None], spectral, loud, chroma]
        ).astype(jnp.float32)

    return jax.jit(kernel)


@functools.lru_cache(maxsize=16)
def _cached_sharded_analyzer(mesh: Mesh, shard_len: int, version: int):
    return _make_sharded_analyzer(mesh, shard_len, version)


def sharded_analyze_samples(
    mesh: Mesh, signal: np.ndarray, length: int, version: int = 2
) -> np.ndarray:
    """Full 23-feature (20 for version 1) analysis of ONE long song,
    time-sharded over `mesh` — the production long-song path
    (io/batch.py routes songs above `LONG_SONG_SAMPLES` here when the
    mesh has more than one device). Matches `analyze_samples` on a
    single device to f32 reduction-order tolerance; the heavy frame
    DFTs are chip-local, cross-chip traffic is halos + per-frame scalar
    series (see module docstring)."""
    d_count = mesh.size
    t = max(int(signal.shape[-1]), int(length))
    # bucket the padded length like models.analyzer.bucket_length so a
    # library of long songs compiles O(log T) programs, not one per song
    from ..models.analyzer import bucket_length

    shard_len, t_pad = _shard_geometry(
        bucket_length(t, min_bucket=1 << 17), d_count
    )
    signal = _pad_signal(signal, t_pad)
    fn = _cached_sharded_analyzer(mesh, shard_len, version)
    sig = jax.device_put(
        jnp.asarray(signal, jnp.float32),
        NamedSharding(mesh, P(mesh.axis_names[0])),
    )
    length_arr = jnp.asarray([length], jnp.int32)
    return np.asarray(fn(sig, length_arr))
