"""Chroma / interval-feature descriptor.

Reference: bliss-rs src/chroma.rs (librosa chroma_stft rewrite + interval
features from "Timbre-invariant Audio Features for Style Analysis of
Classical Music"). The whole-song 8192/2205 STFT, tuning estimation,
chroma filterbank, and the 12-shift x 10-template interval bank are fused
into one statically-shaped program:

  * pip_track peak-picking is a vectorized 3-row stencil over the
    spectrogram instead of per-column Vec pushes (src/chroma.rs:269-331)
  * the tuning histogram is a scatter-add over masked peaks
    (src/chroma.rs:334-391)
  * the product-of-powers over rolled binary templates
    (src/chroma.rs:157-175) becomes `exp(E @ log c)` — one [120,12] x
    [12,T] matmul on the MXU instead of 120 rolled elementwise passes.

Float discipline: FFT magnitudes are f32 (parity with rustfft); everything
after is carried in `dtype` (f64 on CPU for golden-fixture parity, f32 on
TPU).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..features import SAMPLE_RATE
from ..ops import (
    masked_mean,
    masked_quantile_midpoint_all,
    n_frames_stft,
    stft,
)

WINDOW_SIZE = 8192  # src/chroma.rs:39
HOP_SIZE = 2205
N_CHROMA = 12

# Normalization ceilings (src/chroma.rs:47-57)
MAX_L2_INTERVAL = 0.25
MAX_L2_TRIAD = 0.025
MAX_TRIAD_INTERVAL_RATIO = math.pi / 2.0

# Dyad/triad template bank, templates are columns (src/chroma.rs:139-152).
_TEMPLATES = np.array(
    [
        [1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
        [1, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        [0, 1, 0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 1, 0, 0, 0, 0, 1, 1, 0],
        [0, 0, 0, 1, 0, 0, 1, 0, 0, 1],
        [0, 0, 0, 0, 1, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 1, 0, 0, 1, 0],
        [0, 0, 0, 0, 0, 0, 1, 1, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 1],
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    ],
    dtype=np.int64,
)


@functools.lru_cache(maxsize=None)
def _template_product_indices() -> np.ndarray:
    """[10*12, 3] pitch-class indices of the active template entries.

    Every rolled template (src/chroma.rs:163-166) selects 2-3 pitch
    classes; the product-of-powers is just the product of those entries.
    Index 12 is a dummy pointing at an all-ones row (for 2-entry dyads).
    Direct products avoid an exp/log round-trip whose transcendental
    error dominates f32 chroma accuracy on TPU.
    """
    out = np.full((10 * 12, 3), 12, dtype=np.int32)
    for t in range(10):
        template = _TEMPLATES[:, t]
        for s in range(12):
            idx = np.flatnonzero(np.roll(template, s))
            out[t * 12 + s, : len(idx)] = idx
    return out


def hz_to_octs(frequencies: jnp.ndarray, tuning, bins_per_octave: int = 12):
    """Octave number of frequencies (src/utils.rs:119-129)."""
    a440 = 440.0 * 2.0 ** (jnp.asarray(tuning, frequencies.dtype) / bins_per_octave)
    return jnp.log2(frequencies / (a440 / 16.0))


def chroma_filter(n_fft: int, tuning, dtype, sample_rate: int = SAMPLE_RATE):
    """Log-frequency Gaussian chroma filterbank [12, n_fft//2 + 1].

    Faithful rewrite of src/chroma.rs:197-267 (librosa `chroma(...)`).
    Computed in-graph because `tuning` is a traced scalar.
    """
    n_chroma = N_CHROMA
    n_chroma2 = round(n_chroma / 2.0)
    frequencies = jnp.linspace(0.0, float(sample_rate), n_fft + 1, dtype=dtype)
    freq_bins = n_chroma * hz_to_octs(frequencies, tuning, n_chroma)
    freq_bins = freq_bins.at[0].set(freq_bins[1] - 1.5 * n_chroma)

    diff = freq_bins[1:] - freq_bins[:-1]
    binwidth = jnp.concatenate(
        [jnp.maximum(diff, 1.0), jnp.ones((1,), dtype)]
    )

    d = freq_bins[None, :] - jnp.arange(n_chroma, dtype=dtype)[:, None]
    d = jnp.mod(d + n_chroma2 + 10 * n_chroma, n_chroma) - n_chroma2
    d = d / binwidth
    wts = jnp.exp(-0.5 * (2.0 * d) * (2.0 * d))

    # L2-normalize columns (src/chroma.rs:240-247)
    norm = jnp.sqrt(jnp.sum(wts * wts, axis=0))
    tiny = jnp.finfo(wts.dtype).tiny
    norm = jnp.where(norm < tiny, 1.0, norm)
    wts = wts / norm

    ctroct, octwidth = 5.0, 2.0
    octweight = jnp.exp(-0.5 * ((freq_bins / n_chroma - ctroct) / octwidth) ** 2)
    wts = wts * octweight

    wts = jnp.roll(wts, -3, axis=0)
    return wts[:, : 1 + n_fft // 2]


@functools.lru_cache(maxsize=4)
def _chroma_filter_table(n_fft: int, sample_rate: int = SAMPLE_RATE):
    """[100, 12, n_fft//2+1] filterbank for every possible tuning value.

    The tuning estimate is quantized to 100 histogram bins
    (src/chroma.rs:334-359), so the tuning-dependent filter takes only
    100 values — precomputing them on host in f64 sidesteps the TPU's
    less-accurate log2/exp, whose error the exp(15x) sharpening
    amplified into ~4e-4 feature drift.
    """
    n_chroma = N_CHROMA
    n_chroma2 = round(n_chroma / 2.0)
    out = np.zeros((100, n_chroma, 1 + n_fft // 2), np.float64)
    for i in range(100):
        tuning = (-50.0 + i) / 100.0
        freqs = np.linspace(0.0, float(sample_rate), n_fft + 1)
        a440 = 440.0 * 2.0 ** (tuning / n_chroma)
        with np.errstate(divide="ignore"):
            fb = n_chroma * np.log2(freqs / (a440 / 16.0))
        fb[0] = fb[1] - 1.5 * n_chroma
        binwidth = np.concatenate([np.maximum(np.diff(fb), 1.0), [1.0]])
        d = fb[None, :] - np.arange(n_chroma)[:, None]
        d = np.mod(d + n_chroma2 + 10 * n_chroma, n_chroma) - n_chroma2
        d = d / binwidth
        wts = np.exp(-0.5 * (2.0 * d) ** 2)
        norm = np.sqrt(np.sum(wts * wts, axis=0))
        norm[norm < np.finfo(np.float64).tiny] = 1.0
        wts = wts / norm
        octweight = np.exp(-0.5 * ((fb / n_chroma - 5.0) / 2.0) ** 2)
        wts = wts * octweight
        wts = np.roll(wts, -3, axis=0)
        out[i] = wts[:, : 1 + n_fft // 2]
    return out


def _ct_native() -> bool:
    """Consume the CT kernel's native `[n2, fpad, 128]` output directly
    (tuning via a 24-lane band transpose, the chroma filter via a
    dot_general over both CT axes) instead of paying the full bin-major
    post-transpose. BLISS_CT_NATIVE=1 opts in.

    Default OFF: the round-5 on-chip measurement (PERF.md §50,
    tmp/probe_ct_native2.py) found the native consumers 0.975x the
    transposed path (57.36 vs 55.94 ms per 8x5-min batch) — the band
    transpose + valid-max + dual-axis dot costs slightly more than the
    full post-CT transpose it replaces. Parity is fine (2.4e-7, chroma
    dims only), so the path stays available for layouts where the
    balance tips."""
    return os.environ.get("BLISS_CT_NATIVE", "0") == "1"


def _pitch_band(n_fft: int, sample_rate: int = SAMPLE_RATE):
    """Static [fmin, fmax) bin range for pip_track (src/chroma.rs:275-287)."""
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, 1 + n_fft // 2)
    fmax = min(4000.0, sample_rate / 2.0)
    band = (fft_freqs >= 150.0) & (fft_freqs < fmax)
    beginning = int(np.argmax(band))
    end = int(len(band) - 1 - np.argmax(band[::-1]))
    return beginning, end


def pip_track(
    spectrum: jnp.ndarray,
    frame_mask: jnp.ndarray,
    n_fft: int,
    ref_max: jnp.ndarray | None = None,
):
    """Parabolic-interpolated spectral peaks (src/chroma.rs:269-331).

    `spectrum` is `[n_bins, n_frames]`. Returns `(pitches, mags, mask)`,
    all `[n_rows, n_frames]` where row `i` corresponds to spectrum row
    `beginning + 1 + i`.

    `ref_max` optionally supplies the per-frame full-spectrum max `[F]`
    (the CT-native path passes it: its `spectrum` is only the low-bin
    band, but the peak threshold is relative to ALL `n_fft//2+1` bins).
    """
    beginning, end = _pitch_band(n_fft)
    dtype = spectrum.dtype
    if ref_max is None:
        ref_max = jnp.max(spectrum, axis=0)
    ref_value = 0.1 * ref_max  # per-frame threshold

    before = spectrum[beginning : end - 3]
    elem = spectrum[beginning + 1 : end - 2]
    after = spectrum[beginning + 2 : end - 1]

    is_peak = (elem > ref_value[None, :]) & (after <= elem) & (before < elem)
    avg = 0.5 * (after - before)
    shift_den = 2.0 * elem - after - before
    shift_den = jnp.where(
        jnp.abs(shift_den) < jnp.finfo(dtype).tiny, shift_den + 1.0, shift_den
    )
    shift = avg / shift_den
    rows = jnp.arange(elem.shape[0], dtype=dtype)[:, None] + (beginning + 1)
    pitches = (rows + shift) * (SAMPLE_RATE / n_fft)
    mags = elem + 0.5 * avg * shift
    mask = is_peak & frame_mask[None, :]
    return pitches, mags, mask


def pitch_tuning(
    frequencies: jnp.ndarray,
    mask: jnp.ndarray = None,
    resolution: float = 0.01,
    bins_per_octave: int = 12,
):
    """Histogram-mode tuning offset of (masked) frequencies in
    [-0.5, 0.5) (src/chroma.rs:334-359): non-positive frequencies are
    dropped, and an empty selection yields 0.0."""
    dtype = frequencies.dtype
    if mask is None:
        mask = jnp.ones(frequencies.shape, bool)
    sel = mask & (frequencies > 0.0)

    octs = hz_to_octs(jnp.maximum(frequencies, jnp.finfo(dtype).tiny), 0.0)
    v = jnp.mod(bins_per_octave * octs, 1.0)
    v = jnp.where(v >= 0.5, v - 1.0, v)
    n_bins = int(round(1.0 / resolution))
    idxf = (v - (-0.5)) / resolution
    # Rust `as usize` truncates toward zero and saturates negatives at 0
    idx = jnp.clip(idxf.astype(jnp.int32), 0, n_bins - 1)
    if jax.default_backend() == "tpu":
        # compare-and-reduce histogram: a scatter-add over ~5M indices is
        # pathologically slow on TPU; the [N, 100] equality mask reduces
        # in one pass instead (bit-identical integer counts). The mask is
        # folded into a sentinel bin (n_bins, matched by no iota column)
        # and the result materialized behind an optimization_barrier:
        # without it XLA rematerializes idx's whole producer chain (the
        # pip_track stencil over a ~400 MB spectrogram) into every one of
        # the 100 comparison columns (measured 17 ms -> 3 ms).
        idx_m = jnp.where(sel, idx, jnp.int32(n_bins))
        idx_m = jax.lax.optimization_barrier(idx_m)
        if os.environ.get("BLISS_PALLAS_HIST") != "0":
            # one-pass VMEM histogram kernel (XLA's compare-and-reduce
            # re-sweeps the plane per comparison group: ~8 ms -> <1 ms)
            from ..ops.pallas_hist import histogram_int_plane

            counts = histogram_int_plane(idx_m, n_bins)
        else:
            iota = jnp.arange(n_bins, dtype=jnp.int32)
            counts = jnp.sum(
                idx_m[..., None] == iota,
                axis=tuple(range(idx_m.ndim)),
                dtype=jnp.int32,
            )
        any_sel = jnp.sum(counts) > 0  # == any(sel), no extra pass
    else:
        counts = jnp.zeros((n_bins,), jnp.int32).at[idx].add(
            sel.astype(jnp.int32), mode="drop"
        )
        any_sel = jnp.any(sel)
    max_index = jnp.argmax(counts)
    tuning = (-50.0 + (100.0 * resolution * max_index.astype(dtype))) / 100.0
    return jnp.where(any_sel, tuning, jnp.asarray(0.0, dtype))


def _tuning_fused_enabled() -> bool:
    return os.environ.get("BLISS_TUNING_FUSED", "1") != "0"


def _fused_plane_bytes(spec_shape, n_fft: int) -> int:
    """Tile-padded i16 plane footprint of the fused estimator's bisect
    (a single ungridded VMEM block — gate long songs back to the radix
    path, same rationale as reductions._radix_plane_bytes)."""
    beginning, end = _pitch_band(n_fft)
    rows = end - beginning - 3
    cols = spec_shape[-1]
    return (-(-rows // 32) * 32) * (-(-cols // 128) * 128) * 2


def _estimate_tuning_fused(
    spectrum: jnp.ndarray,
    frame_mask: jnp.ndarray,
    n_fft: int,
    resolution: float = 0.01,
    bins_per_octave: int = 12,
    interpret: bool = False,
    ref_max: jnp.ndarray | None = None,
):
    """One-sweep-per-stage tuning estimator (TPU production path).

    Same estimate → threshold → histogram semantics as the unfused
    path (src/chroma.rs:334-391) with identical order statistics and
    integer counts — but instead of materializing pitches/mags/mask and
    re-sweeping them through the radix select (4 int8 levels × 2 ranks)
    and the histogram, it materializes exactly three planes in one
    stencil sweep — the i32 signed-shifted sort keys of the peak
    magnitudes, the int8 tuning-bin index, and the u16 key top half —
    then selects the median pair with TWO paired 16-bit bisects
    (`ops/pallas_select.bisect16_pair`; both ranks share each count
    pass) and counts the final histogram gated by the threshold IN KEY
    SPACE in one fused read (`ops/pallas_hist.histogram_threshold_plane`).
    ~3x less HBM traffic than the unfused chain; bit-identical tuning.
    """
    from ..ops.pallas_hist import histogram_threshold_plane
    from ..ops.pallas_select import bisect16_pair
    from ..ops.reductions import _float_sort_key, _key_to_float

    dtype = spectrum.dtype
    n_bins = int(round(1.0 / resolution))
    bias = jnp.uint32(0x80000000)

    # ---- pass A: pip_track stencil -> (skey, idx8, key-hi16) planes
    beginning, end = _pitch_band(n_fft)
    if ref_max is None:
        ref_max = jnp.max(spectrum, axis=0)
    ref_value = 0.1 * ref_max
    before = spectrum[beginning : end - 3]
    elem = spectrum[beginning + 1 : end - 2]
    after = spectrum[beginning + 2 : end - 1]
    is_peak = (elem > ref_value[None, :]) & (after <= elem) & (before < elem)
    avg = 0.5 * (after - before)
    shift_den = 2.0 * elem - after - before
    shift_den = jnp.where(
        jnp.abs(shift_den) < jnp.finfo(dtype).tiny, shift_den + 1.0, shift_den
    )
    shift = avg / shift_den
    rows = jnp.arange(elem.shape[0], dtype=dtype)[:, None] + (beginning + 1)
    pitches = (rows + shift) * (SAMPLE_RATE / n_fft)
    mags = elem + 0.5 * avg * shift
    pos = is_peak & frame_mask[None, :] & (pitches > 0.0)

    keys = jnp.where(pos, _float_sort_key(mags), ~jnp.uint32(0))
    octs = hz_to_octs(
        jnp.maximum(pitches, jnp.finfo(dtype).tiny), 0.0, bins_per_octave
    )
    v = jnp.mod(bins_per_octave * octs, 1.0)
    v = jnp.where(v >= 0.5, v - 1.0, v)
    idxf = (v - (-0.5)) / resolution
    idx = jnp.clip(idxf.astype(jnp.int32), 0, n_bins - 1)
    idx8 = jnp.where(pos, idx, n_bins + 1).astype(jnp.int8)
    skey = jax.lax.bitcast_convert_type(keys ^ bias, jnp.int32)
    plane_hi = (
        (keys >> jnp.uint32(16)).astype(jnp.int32) - 32768
    ).astype(jnp.int16)
    n = jnp.sum(pos.astype(jnp.int32))
    skey, idx8, plane_hi, n = jax.lax.optimization_barrier(
        (skey, idx8, plane_hi, n)
    )

    # midpoint ranks — formula identical to masked_quantile_midpoint
    posk = (n - 1).astype(jnp.float32) * 0.5
    kf = jnp.maximum(jnp.floor(posk).astype(jnp.int32), 0)
    kc = jnp.maximum(jnp.ceil(posk).astype(jnp.int32), 0)

    # ---- level 1: each rank's key top-16 bucket
    o1 = bisect16_pair(
        plane_hi, jnp.stack([kf, kc]).reshape(1, 2), interpret=interpret
    )
    b_f, b_c = o1[0, 0], o1[0, 1]
    rem = jnp.maximum(
        jnp.stack([kf - o1[0, 2], kc - o1[0, 3]]), 0
    ).reshape(1, 2)

    # ---- level 2: low 16 bits within rank-f's bucket. When the ranks
    # straddle a bucket boundary the ceil rank is by construction the
    # MINIMUM of its bucket (every element of lower buckets ranks below
    # it), which is a plain fused reduction — no second bisect plane.
    ukeys = jax.lax.bitcast_convert_type(skey, jnp.uint32) ^ bias
    hi16 = (ukeys >> jnp.uint32(16)).astype(jnp.int32)
    lo16 = (ukeys & jnp.uint32(0xFFFF)).astype(jnp.int32)
    plane_lo = (jnp.where(hi16 == b_f, lo16, 0xFFFF) - 32768).astype(
        jnp.int16
    )
    min_c = jnp.min(jnp.where(hi16 == b_c, lo16, 0xFFFF))
    plane_lo, min_c = jax.lax.optimization_barrier((plane_lo, min_c))
    o2 = bisect16_pair(plane_lo, rem, interpret=interpret)
    same = b_f == b_c
    v_lo_f = o2[0, 0]
    v_lo_c = jnp.where(same, o2[0, 1], min_c)
    key_f = (b_f.astype(jnp.uint32) << 16) | v_lo_f.astype(jnp.uint32)
    key_c = (b_c.astype(jnp.uint32) << 16) | v_lo_c.astype(jnp.uint32)
    t = (_key_to_float(key_f, dtype) + _key_to_float(key_c, dtype)) * (
        jnp.asarray(0.5, dtype)
    )

    # ---- pass D: histogram gated by `mags >= t` in key space. Keys are
    # order-isomorphic except -0.0 < +0.0; when t == 0.0 use -0.0's key
    # so float `>=` semantics are preserved exactly.
    tk_s = jax.lax.bitcast_convert_type(_float_sort_key(t) ^ bias, jnp.int32)
    tk_s = jnp.where(t == 0.0, jnp.int32(-1), tk_s)
    counts = histogram_threshold_plane(
        idx8, skey, tk_s.reshape(1, 1), n_bins, interpret=interpret
    )
    any_sel = jnp.sum(counts) > 0
    max_index = jnp.argmax(counts)
    tuning = (-50.0 + (100.0 * resolution * max_index.astype(dtype))) / 100.0
    return jnp.where(any_sel, tuning, jnp.asarray(0.0, dtype))


def estimate_tuning(
    spectrum: jnp.ndarray,
    frame_mask: jnp.ndarray,
    n_fft: int,
    resolution: float = 0.01,
    bins_per_octave: int = 12,
    ref_max: jnp.ndarray | None = None,
):
    """Tuning offset in [-0.5, 0.5) from a magnitude spectrogram
    (src/chroma.rs:361-391 + pitch_tuning :334-359).

    `ref_max` (optional per-frame full-spectrum max) lets the CT-native
    path pass only the pitch-band rows as `spectrum` — the estimates are
    bit-identical, the band holds every bin pip_track touches.
    """
    dtype = spectrum.dtype
    if (
        jax.default_backend() == "tpu"
        and _tuning_fused_enabled()
        and dtype == jnp.float32
        and _fused_plane_bytes(spectrum.shape, n_fft) <= 12 << 20
    ):
        return _estimate_tuning_fused(
            spectrum, frame_mask, n_fft, resolution, bins_per_octave,
            ref_max=ref_max,
        )
    pitches, mags, peak_mask = pip_track(
        spectrum, frame_mask, n_fft, ref_max=ref_max
    )
    # NO ravel: flattening the [n_band_rows, n_frames] tiles (minor dim
    # not lane-aligned) costs a full TPU re-tiling relayout per array;
    # the median and the tuning histogram only need global reductions,
    # which work on the 2-D layout directly. Materialize the stencil
    # once — its consumers sweep the data several times, and without a
    # barrier XLA re-derives the whole stencil per sweep.
    pitches, mags, peak_mask = jax.lax.optimization_barrier(
        (pitches, mags, peak_mask)
    )

    pos_mask = peak_mask & (pitches > 0.0)
    threshold = masked_quantile_midpoint_all(mags, pos_mask, 0.5)
    sel = pos_mask & (mags >= threshold)

    tuning = pitch_tuning(pitches, sel, resolution, bins_per_octave)
    any_peak = jnp.any(peak_mask)
    return jnp.where(any_peak, tuning, jnp.asarray(0.0, dtype))


def _compensated_matmul(a: jnp.ndarray, b: jnp.ndarray, chunk: int = 512):
    """a @ b with the K axis split into chunks whose partial products are
    combined with Neumaier compensation.

    In f32 on the MXU, a K~4097 accumulation carries ~sqrt(K)*eps
    relative error, which the exp(15x) sharpening downstream amplifies
    ~15x into the chroma features; chunking + compensated combination
    cuts the accumulation error to roughly the in-chunk level. No-op
    cost: same total FLOPs, 8 small matmuls instead of 1.
    """
    import jax

    hi_prec = jax.lax.Precision.HIGHEST  # TPU f32 matmul defaults to
    # bf16 multiplies (~1e-3 rel) — measured 6e-4 abs chroma drift with
    # default precision vs ≤2e-5 with HIGHEST (PERF.md round 2)
    k = a.shape[1]
    if a.dtype == jnp.float64 or k <= chunk:
        return jnp.matmul(a, b, precision=hi_prec)
    bounds = list(range(0, k, chunk))
    s = jnp.matmul(a[:, : min(chunk, k)], b[: min(chunk, k)], precision=hi_prec)
    comp = jnp.zeros_like(s)
    for lo in bounds[1:]:
        hi = min(lo + chunk, k)
        p = jnp.matmul(a[:, lo:hi], b[lo:hi], precision=hi_prec)
        t = s + p
        comp = comp + jnp.where(
            jnp.abs(s) >= jnp.abs(p), (s - t) + p, (p - t) + s
        )
        s = t
    return s + comp


def chroma_stft_from_spectrum(
    spectrum: jnp.ndarray, tuning, n_fft: int
) -> jnp.ndarray:
    """L1-normalized chromagram [12, n_frames] from |STFT|
    (src/chroma.rs:393-412)."""
    dtype = spectrum.dtype
    power = spectrum * spectrum
    if dtype == jnp.float32:
        # f32 (TPU) path: exact host-f64 filter, selected by tuning bin
        table = jnp.asarray(_chroma_filter_table(n_fft), jnp.float32)
        tuning_idx = jnp.clip(
            jnp.round(jnp.asarray(tuning) * 100.0 + 50.0).astype(jnp.int32),
            0,
            99,
        )
        filt = table[tuning_idx]
    else:
        filt = chroma_filter(n_fft, tuning, dtype)
    raw = _compensated_matmul(filt, power)
    colsum = jnp.sum(jnp.abs(raw), axis=0)
    colsum = jnp.where(colsum < jnp.finfo(dtype).tiny, 1.0, colsum)
    return raw / colsum


def _compensated_dot_native(
    filt_n: jnp.ndarray, power: jnp.ndarray, chunk_k2: int = 8
) -> jnp.ndarray:
    """`filt_n [12, n2, L]` x `power [n2, fpad, L]` contracted over both
    CT axes -> `[12, fpad]`, Neumaier-compensated over k2 chunks.

    Same compensation structure as `_compensated_matmul` (512-bin-scale
    partial products combined with error recovery), chunked along the
    sublane-major k2 axis so every chunk is a free view. XLA's layout
    pass only needs a minor-dim-preserving (1,0,2) relayout of `power`
    to feed the MXU — far cheaper than the bin-major (2,0,1) transpose
    this path exists to avoid.
    """
    hi_prec = jax.lax.Precision.HIGHEST
    dn = (((1, 2), (0, 2)), ((), ()))

    def dot(lo, hi):
        return jax.lax.dot_general(
            filt_n[:, lo:hi, :], power[lo:hi], dn, precision=hi_prec
        )

    n2 = power.shape[0]
    s = dot(0, min(chunk_k2, n2))
    comp = jnp.zeros_like(s)
    for lo in range(chunk_k2, n2, chunk_k2):
        hi = min(lo + chunk_k2, n2)
        p = dot(lo, hi)
        t = s + p
        comp = comp + jnp.where(
            jnp.abs(s) >= jnp.abs(p), (s - t) + p, (p - t) + s
        )
        s = t
    return s + comp


def chroma_stft_from_native(
    out3: jnp.ndarray, tuning, n_fft: int
) -> jnp.ndarray:
    """L1-normalized chromagram `[12, fpad]` straight from the CT
    kernel's NATIVE `[n2, fpad, 128]` magnitude block
    (`pallas_dft.pallas_stft_mags_ct_fused(native=True)`).

    Matches `chroma_stft_from_spectrum` (src/chroma.rs:393-412) minus
    the bin-major post-transpose: the tuning-selected filter row is
    rearranged device-side into the native `[12, n2, lanes]` layout
    (~200 KB) and applied with `_compensated_dot_native`. The
    rfft-mirror positions (bin = lane*n2 + k2 > n_fft/2) carry garbage
    magnitudes; the filter gives them exactly zero weight AND the power
    block is zeroed there explicitly, so a non-finite mirror value
    cannot poison the dot (0*inf = NaN otherwise). f32/TPU path only.
    Columns past the true `n_frames` hold pad garbage — downstream must
    mask by frame (the descriptor means already do).
    """
    n2, _, lanes = out3.shape
    table = jnp.asarray(_chroma_filter_table(n_fft), jnp.float32)
    tuning_idx = jnp.clip(
        jnp.round(jnp.asarray(tuning) * 100.0 + 50.0).astype(jnp.int32),
        0,
        99,
    )
    filt = table[tuning_idx]  # [12, n_bins]
    filt_p = jnp.pad(filt, ((0, 0), (0, n2 * lanes - filt.shape[1])))
    filt_n = jnp.transpose(filt_p.reshape(12, lanes, n2), (0, 2, 1))
    # static valid-bin mask over [n2(k2), 1, lanes(k1)]: bin = k1*n2+k2
    bin_idx = (
        np.arange(lanes)[None, None, :] * n2
        + np.arange(n2)[:, None, None]
    )
    valid = jnp.asarray(bin_idx <= n_fft // 2)
    power = jnp.where(valid, out3 * out3, jnp.float32(0.0))
    raw = _compensated_dot_native(filt_n, power)
    colsum = jnp.sum(jnp.abs(raw), axis=0)
    colsum = jnp.where(colsum < jnp.finfo(jnp.float32).tiny, 1.0, colsum)
    return raw / colsum


def normalize_feature_sequence(feature: jnp.ndarray) -> jnp.ndarray:
    """Per-column L1 normalization with small-sum guard
    (src/chroma.rs:177-188)."""
    colsum = jnp.sum(jnp.abs(feature), axis=0)
    colsum = jnp.where(colsum < 1e-4, 1.0, colsum)
    return feature / colsum


def extract_interval_features(chroma: jnp.ndarray) -> jnp.ndarray:
    """[10, n_frames] product-of-powers over the rolled template bank
    (extract_interval_features, src/chroma.rs:157-175) as direct gathered
    products: each rolled template activates only 2-3 pitch classes.
    """
    dtype = chroma.dtype
    idx = jnp.asarray(_template_product_indices())  # [120, 3]
    ext = jnp.concatenate(
        [chroma, jnp.ones((1, chroma.shape[1]), dtype)], axis=0
    )  # row 12 = neutral element
    p = ext[idx[:, 0]] * ext[idx[:, 1]] * ext[idx[:, 2]]  # [120, T]
    return jnp.sum(p.reshape(10, 12, -1), axis=1)  # sum over the 12 shifts


def interval_feature_matrix(chroma: jnp.ndarray) -> jnp.ndarray:
    """exp(15x)-sharpened, L1-normalized interval features
    (chroma_interval_features preprocessing, src/chroma.rs:137-153)."""
    c = normalize_feature_sequence(jnp.exp(15.0 * chroma))
    return extract_interval_features(c)


def chroma_interval_features(
    chroma: jnp.ndarray, frame_mask: jnp.ndarray
) -> jnp.ndarray:
    """Mean interval features over valid frames → [10]
    (src/chroma.rs:137-155)."""
    feats = interval_feature_matrix(chroma)
    return masked_mean(feats, frame_mask[None, :], axis=-1)


def _postprocess_v2(raw: jnp.ndarray) -> jnp.ndarray:
    """Version2 normalization of the 10 raw features → 13 features
    (ChromaDesc::get_values, src/chroma.rs:97-126)."""
    ic = raw[:6]
    triads = raw[6:]
    l2_ic = jnp.sqrt(jnp.sum(ic * ic))
    l2_tri = jnp.sqrt(jnp.sum(triads * triads))
    ic = jnp.where(l2_ic > 0.0, ic / l2_ic, ic)
    triads = jnp.where(l2_tri > 0.0, triads / l2_tri, triads)
    normalized = 2.0 * jnp.concatenate([ic, triads]).astype(jnp.float32) - 1.0
    f11 = jnp.minimum(
        2.0 * l2_ic.astype(jnp.float32) / MAX_L2_INTERVAL - 1.0, 1.0
    )
    f12 = jnp.minimum(2.0 * l2_tri.astype(jnp.float32) / MAX_L2_TRIAD - 1.0, 1.0)
    angle = jnp.arctan2(20.0 * l2_tri, l2_ic + 1e-12)
    f13 = 2.0 * angle.astype(jnp.float32) / MAX_TRIAD_INTERVAL_RATIO - 1.0
    return jnp.concatenate([normalized, jnp.stack([f11, f12, f13])])


def _postprocess_v1(raw: jnp.ndarray) -> jnp.ndarray:
    """Version1 scaling (src/chroma.rs:128-132)."""
    return (2.0 * raw.astype(jnp.float32) / 0.12 - 1.0).astype(jnp.float32)


def chroma_features(
    signal: jnp.ndarray, length, version: int = 2, dtype=None
) -> jnp.ndarray:
    """Full chroma descriptor: signal → 13 (v2) or 10 (v1) features.

    Mirrors ChromaDesc::do_ + get_values (src/chroma.rs:73-126).
    """
    if dtype is None:
        # f64 where available (x64-enabled CPU parity tests), else f32 (TPU)
        import jax

        dtype = jax.dtypes.canonicalize_dtype(np.float64)
    t = signal.shape[-1]
    n_frames_max = int(n_frames_stft(t, HOP_SIZE))
    n_valid = n_frames_stft(jnp.asarray(length, jnp.int32), HOP_SIZE)
    frame_mask = jnp.arange(n_frames_max, dtype=jnp.int32) < n_valid

    from ..ops.spectral import _use_pallas_ct, _use_pallas_ct_fused

    if (
        _use_pallas_ct(WINDOW_SIZE)
        and _use_pallas_ct_fused()
        and _ct_native()
        and jnp.dtype(dtype) == jnp.float32
    ):
        # CT-native path: consume the kernel's raw [n2, fpad, 128] block.
        # Tuning sees only the bin-major pitch band (24 of 65 kept lanes
        # transposed, ~37% of the old full transpose) plus the true
        # full-spectrum per-frame max; the chroma filter contracts the
        # native block directly. Tuning is bit-identical to the
        # transposed path (same f32 elements, same plane construction).
        from ..ops.pallas_dft import (
            ct_band_spectrum,
            ct_valid_max,
            pallas_stft_mags_ct_fused,
        )
        from ..ops.windows import reflect_pad_signal

        padded = reflect_pad_signal(signal, length, WINDOW_SIZE)
        out3 = pallas_stft_mags_ct_fused(
            padded, WINDOW_SIZE, HOP_SIZE, n_frames_max, native=True
        )
        beginning, end = _pitch_band(WINDOW_SIZE)
        n2 = WINDOW_SIZE // 128
        k1_count = (end - 1) // n2 + 1  # highest bin pip_track reads
        band = ct_band_spectrum(out3, k1_count)[:, :n_frames_max]
        ref_max = ct_valid_max(out3, WINDOW_SIZE)[:n_frames_max]
        tuning = estimate_tuning(
            band, frame_mask, WINDOW_SIZE, ref_max=ref_max
        )
        chroma = chroma_stft_from_native(out3, tuning, WINDOW_SIZE)[
            :, :n_frames_max
        ]
    else:
        spectrum = stft(
            signal, WINDOW_SIZE, HOP_SIZE, length=length,
            n_frames=n_frames_max, dtype=dtype,
        )  # [4097, F]
        tuning = estimate_tuning(spectrum, frame_mask, WINDOW_SIZE)
        chroma = chroma_stft_from_spectrum(spectrum, tuning, WINDOW_SIZE)
    raw = chroma_interval_features(chroma, frame_mask)
    if version == 1:
        return _postprocess_v1(raw)
    return _postprocess_v2(raw)
