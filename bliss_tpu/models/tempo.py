"""Tempo (BPM) descriptor.

Reference: bliss-rs src/temporal.rs (BPMDesc) + src/aubio.rs:267-1450
(PVocTempo, SpecFlux, PeakPicker, BeatTracking, Tempo) — a transcription of
aubio's Davies/Plumbley beat tracker.

TPU-first decomposition. The reference streams one 512-sample window per
hop through five stateful objects; here the pipeline is split into the
parts that are embarrassingly parallel over hops and the one truly
sequential part:

  parallel over hops (one fused batched program):
    1. pvoc magnitudes       [H, 257]  (batched FFT)
    2. spectral flux onset   [H]       (positive-diff reduction)
    3. adaptive threshold    [H]       — the PeakPicker's 7-tap biquad
       filtfilt + median + mean window only ever sees onset[h-6..h], so
       each hop's `thresholded` value is a pure function of a sliding
       7-window: computed for all hops at once (aubio pattern at
       src/aubio.rs:733-768)
    4. per-hop silence gates [H]       (db_spl < -90, src/aubio.rs:1274-1276)

  sequential (lax.scan over ~one step per 128 hops):
    5. BeatTracking: autocorrelation + comb filterbank + two-state
       (general/context) hypothesis machine + beat-phase extraction
       (src/aubio.rs:834-1240), carried as a small state struct.

The final BPM is the Midpoint-median of per-beat BPM readings normalized
over [0, 206] (src/temporal.rs:66-85).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import (
    frame_signal,
    framed_pvoc_mags,
    masked_quantile_midpoint,
    n_frames_strided,
    normalize_range,
)

WINDOW_SIZE = 512  # src/temporal.rs:40
HOP_SIZE = WINDOW_SIZE // 2  # 256
MAX_BPM = 206.0  # src/temporal.rs:80-85
SILENCE_DB = -90.0

# PeakPicker constants (src/aubio.rs:707-727)
_PP_THRESHOLD = 0.3  # set_threshold for tempo, src/aubio.rs:1347
_BIQUAD = (0.1599879, 0.31997577, 0.1599879, 0.23484048, 0.0)  # b0 b1 b2 a1 a2
_BUF = 7  # win_post(5) + win_pre(1) + 1

def _use_fused_specflux() -> bool:
    """Fused Pallas DFT+SpecFlux kernel on real TPU.

    `BLISS_TEMPO_FUSED=0` falls back to the mags-materializing path
    (same dispatch conditions as ops.spectral framed_pvoc_mags).
    """
    from ..ops import pallas_dft
    from ..ops.spectral import _use_pallas

    return (
        os.environ.get("BLISS_TEMPO_FUSED") != "0"
        and _use_pallas()
        and pallas_dft.supported(WINDOW_SIZE, HOP_SIZE)
    )


# Beats emitted per beat-tracking cycle are bounded by step/min_bp + 2;
# with step=128 and bp >= 25 that is at most 7.
_MAX_BEATS = 8
# kmax = floor(winlen / bp) <= floor(512 / 25) = 20
_MAX_KMAX = 21
# beat-phase loop bound: i < bp with bp <= ~130 after quadratic interp
_MAX_PHASE_I = 160


def tempo_geometry(sample_rate: int):
    """winlen/step for the detection-function buffer (src/aubio.rs:1335-1341)."""
    winlen = 1
    target = int((5.8 * sample_rate) / HOP_SIZE)
    while winlen < target:
        winlen <<= 1
    winlen = max(winlen, 4)
    return winlen, winlen // 4


class _BTConstants(NamedTuple):
    winlen: int
    step: int
    laglen: int
    rayparam_float: float
    rayparam_trunc: float
    rwv: np.ndarray
    dfwv: np.ndarray
    g_var: float


def _bt_constants(sample_rate: int) -> _BTConstants:
    """Static weight vectors of BeatTracking::new (src/aubio.rs:909-962),
    computed in f32 like the reference."""
    winlen, step = tempo_geometry(sample_rate)
    laglen = winlen // 4
    rayparam_f = np.float32(60.0 * sample_rate / 120.0 / HOP_SIZE)
    rayparam_trunc = float(np.uint32(rayparam_f))  # C truncation to uint_t
    dfwvnorm = np.exp(
        (np.float32(np.log(2.0)) / rayparam_f) * np.float32(winlen + 2)
    )
    i_f = np.arange(1, laglen + 1, dtype=np.float32)
    rwv = (i_f / rayparam_f**2) * np.exp(-(i_f**2) / (2.0 * rayparam_f**2))
    j_f = np.arange(1, winlen + 1, dtype=np.float32)
    dfwv = np.exp((np.float32(np.log(2.0)) / rayparam_f) * j_f) / dfwvnorm
    return _BTConstants(
        winlen,
        step,
        laglen,
        float(rayparam_f),
        rayparam_trunc,
        rwv.astype(np.float32),
        dfwv.astype(np.float32),
        3.901,
    )


# ---------------------------------------------------------------------------
# Parallel stages
# ---------------------------------------------------------------------------


def onset_function(mags: jnp.ndarray) -> jnp.ndarray:
    """SpecFlux: per-hop sum of positive magnitude deltas
    (src/aubio.rs:432-468). `mags` is [H, 257]."""
    prev = jnp.concatenate([jnp.zeros_like(mags[:1]), mags[:-1]], axis=0)
    return jnp.sum(jnp.maximum(mags - prev, 0.0), axis=-1)


def _filtfilt7(windows: jnp.ndarray) -> jnp.ndarray:
    """Zero-phase biquad over each 7-sample window, exactly replicating the
    forward/mirror/backward float ordering of Biquad::do_filtfilt
    (src/aubio.rs:659-686). `windows` is [H, 7]."""
    b0, b1, b2, a1, a2 = (jnp.float32(v) for v in _BIQUAD)

    def one_pass(x):  # x: [H, 7]
        ys = []
        y1 = jnp.zeros_like(x[:, 0])
        y2 = jnp.zeros_like(x[:, 0])
        x1 = jnp.zeros_like(x[:, 0])
        x2 = jnp.zeros_like(x[:, 0])
        for i in range(_BUF):
            x0 = x[:, i]
            y0 = b0 * x0 + b1 * x1 + b2 * x2 - a1 * y1 - a2 * y2
            ys.append(y0)
            x2, x1 = x1, x0
            y2, y1 = y1, y0
        return jnp.stack(ys, axis=1)

    fwd = one_pass(windows)
    bwd = one_pass(fwd[:, ::-1])
    return bwd[:, ::-1]


def thresholded_series(onset: jnp.ndarray) -> jnp.ndarray:
    """Adaptive-threshold novelty per hop (PeakPicker::do_,
    src/aubio.rs:733-768): filtfilt over the last 7 onsets, then
    `proc[5] - median(proc) - mean(proc) * threshold`."""
    h = onset.shape[0]
    padded = jnp.concatenate([jnp.zeros((_BUF - 1,), onset.dtype), onset])
    # [H, 7] sliding windows as 7 static slices, not an index-matrix
    # gather (pointwise gathers run ~30x slower than contiguous slices
    # on TPU — PERF.md round 1 §2)
    windows = jnp.stack(
        [padded[i : i + h] for i in range(_BUF)], axis=1
    )  # [H, 7] = onset[h-6..h]
    proc = _filtfilt7(windows)
    mean = jnp.mean(proc, axis=1)
    median = jnp.median(proc, axis=1)  # odd length: exact middle element
    return proc[:, 5] - median - mean * jnp.float32(_PP_THRESHOLD)


def silence_flags(frames: jnp.ndarray) -> jnp.ndarray:
    """Per-hop `is_silence` over the full 512-sample window
    (src/aubio.rs:1258-1276, gate at :1430)."""
    level = jnp.mean(frames * frames, axis=-1)
    db = 10.0 * jnp.log10(level)
    return db < SILENCE_DB


def silence_flags_blocked(signal: jnp.ndarray, h_max: int) -> jnp.ndarray:
    """`silence_flags` without materializing the `[H, 512]` frames.

    The raw (non-slid) frame at hop h spans `[256h, 256h + 512)`, i.e.
    exactly two consecutive 256-sample blocks — so per-frame energy is a
    reshape + block-sum + neighbor add instead of a 2x-amplifying frame
    gather through HBM."""
    need = (h_max + 1) * HOP_SIZE
    t = signal.shape[-1]
    if t < need:
        signal = jnp.pad(signal, (0, need - t))
    b = jnp.sum(jnp.reshape(signal[:need], (-1, HOP_SIZE)) ** 2, axis=-1)
    level = (b[:h_max] + b[1 : h_max + 1]) / WINDOW_SIZE
    db = 10.0 * jnp.log10(level)
    return db < SILENCE_DB


# ---------------------------------------------------------------------------
# Sequential stage: BeatTracking
# ---------------------------------------------------------------------------


def _vec_max_elem(data: jnp.ndarray) -> jnp.ndarray:
    """aubio fvec_max_elem: last occurrence of the max, starting from an
    implicit 0 (all-negative arrays return 0) — src/aubio.rs:787-799."""
    n = data.shape[0]
    last_arg = (n - 1) - jnp.argmax(data[::-1])
    return jnp.where(jnp.max(data) >= 0.0, last_arg, 0).astype(jnp.int32)


def _quad_peak_pos(x: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """vec_quadratic_peak_pos (src/aubio.rs:576-604) with traced pos."""
    n = x.shape[0]
    posc = jnp.clip(pos, 1, n - 2)
    s0 = x[posc - 1]
    s1 = x[posc]
    s2 = x[posc + 1]
    interp = posc.astype(jnp.float32) + 0.5 * (s0 - s2) / (s0 - 2.0 * s1 + s2)
    return jnp.where(
        (pos == 0) | (pos >= n - 1), pos.astype(jnp.float32), interp
    )


def _autocorr(df: jnp.ndarray) -> jnp.ndarray:
    """vec_autocorr (src/aubio.rs:819-828): acf[i] = sum_j df[j-i]df[j] / (n-i).

    Expressed as a shifted-Toeplitz gather + matvec: `jnp.correlate`
    lowers to a convolution that compiles pathologically slowly on TPU,
    while a [n, n] gather feeding the MXU compiles instantly and n=512
    is tiny.
    """
    n = df.shape[0]
    i = jnp.arange(n, dtype=jnp.int32)
    shift = i[None, :] - i[:, None]  # row i, col j -> j - i
    valid = shift >= 0
    toeplitz = jnp.where(
        valid, df[jnp.clip(shift, 0, n - 1)], jnp.zeros((), df.dtype)
    )
    acf = jnp.matmul(toeplitz, df, precision=jax.lax.Precision.HIGHEST)
    return acf / (n - jnp.arange(n, dtype=df.dtype))


def _autocorr_batch_dft(dfframes: jnp.ndarray) -> jnp.ndarray:
    """Batched `vec_autocorr` via a zero-padded matmul DFT (TPU path).

    The per-block Toeplitz gather materializes [NB, 512, 512] (211 MB per
    song, measured 5.9 ms per 8x5-min batch); the Wiener–Khinchin route
    is three small MXU matmuls with no gather at all (~0.2 ms): rfft of
    the zero-padded frame, power, inverse cosine transform at lags
    0..n-1. Matches the Toeplitz values to ~6e-6 relative (measured on
    chip); the beat tracker consumes acf through argmax/median decisions
    that the TPU drift contract audits end-to-end. CPU keeps the exact
    Toeplitz path (golden parity is CPU-only).
    """
    import math

    n = dfframes.shape[-1]
    m = 2 * n
    nb = n + 1  # rfft bins of the length-2n zero-padded frame
    hi = jax.lax.Precision.HIGHEST
    nn = jax.lax.broadcasted_iota(jnp.int32, (n, nb), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (n, nb), 1)
    theta = ((nn * kk) % m).astype(jnp.float32) * (2.0 * math.pi / m)
    re = jnp.matmul(dfframes, jnp.cos(theta), precision=hi)
    im = jnp.matmul(dfframes, -jnp.sin(theta), precision=hi)
    p = re * re + im * im  # [NB, n+1] power spectrum
    ki = jax.lax.broadcasted_iota(jnp.int32, (nb, n), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (nb, n), 1)
    w = jnp.cos(((ki * ii) % m).astype(jnp.float32) * (2.0 * math.pi / m))
    scale = jnp.where(
        (jnp.arange(nb) == 0) | (jnp.arange(nb) == n), 1.0, 2.0
    ).astype(jnp.float32)[:, None]
    acf = jnp.matmul(p, w * scale, precision=hi) / jnp.float32(m)
    return acf / (n - jnp.arange(n, dtype=jnp.float32))


def _get_timesig(acf: jnp.ndarray, gp_int: jnp.ndarray) -> jnp.ndarray:
    """Time-signature estimate from the autocorrelation
    (src/aubio.rs:864-907)."""
    n = acf.shape[0]
    k = jnp.arange(-2, 2)  # k in -2..2 (exclusive upper)

    def gather(mult):
        idx = mult * gp_int + k
        ok = (idx >= 0) & (idx < n)
        return jnp.where(ok, acf[jnp.clip(idx, 0, n - 1)], 0.0), ok

    a3, ok3 = gather(3)
    a6, ok6 = gather(6)
    a4, ok4 = gather(4)
    a2, ok2 = gather(2)

    in_range = n > 6 * gp_int + 2
    three_small = jnp.sum(a3)
    four_small = jnp.sum(a4)
    # expanded branch: three += acf[3gp+k] (+acf[6gp+k] if both valid);
    # four += acf[4gp+k] (+acf[2gp+k] if both valid)
    three_big = jnp.sum(jnp.where(ok3, a3, 0.0) + jnp.where(ok3 & ok6, a6, 0.0))
    four_big = jnp.sum(jnp.where(ok4, a4, 0.0) + jnp.where(ok4 & ok2, a2, 0.0))
    three = jnp.where(in_range, three_small, three_big)
    four = jnp.where(in_range, four_small, four_big)
    timesig = jnp.where(three > four, 3, 4).astype(jnp.int32)
    return jnp.where(gp_int < 2, 4, timesig)


class BlockInputs(NamedTuple):
    """Per-block quantities that do NOT depend on the sequential
    hypothesis state — precomputed batched outside the scan.

    The detection-function buffer at beat-tracking run k is a pure
    strided window of the thresholded series (writes/rotations never feed
    back into it), so the autocorrelation, the comb filterbanks for both
    possible time signatures, and the Rayleigh-weighted period candidates
    are all batched matmuls/gathers over `[n_blocks, ...]`, leaving only
    the tiny two-state hypothesis machine in the scan.
    """

    dfrev: jnp.ndarray  # [winlen]
    rp_if4: jnp.ndarray  # f32 — rp when numelem == 4
    rp_if3: jnp.ndarray  # f32 — rp when numelem == 3
    ts_if4: jnp.ndarray  # i32 — get_timesig(acf, rp_if4)
    ts_if3: jnp.ndarray  # i32 — get_timesig(acf, rp_if3)
    gwv_if4: jnp.ndarray  # [laglen] — flagconst gwv candidate from rp_if4
    gwv_if3: jnp.ndarray  # [laglen] — flagconst gwv candidate from rp_if3
    comb_u3: jnp.ndarray  # [laglen] unweighted comb, timesig=3
    comb_u4: jnp.ndarray  # [laglen] unweighted comb, timesig=4


def _precompute_blocks(
    thresh_masked: jnp.ndarray, n_blocks: int, consts: _BTConstants
) -> BlockInputs:
    """Batched per-block precomputation (see BlockInputs)."""
    winlen, step, laglen = consts.winlen, consts.step, consts.laglen
    # dfframe at run k holds thresholded[s + step*k - (winlen - step + 1)]
    # at slot s (derived from the write/rotate pattern of
    # src/aubio.rs:1389-1416; slot winlen-step stays 0 in the first block)
    dfframes = frame_signal(
        thresh_masked, winlen, step, offset=winlen - step + 1,
        n_frames=n_blocks,
    )  # [NB, winlen]
    if jax.default_backend() == "tpu" and os.environ.get(
        "BLISS_ACF_DFT"
    ) != "0":
        acfs = _autocorr_batch_dft(dfframes)  # no [NB, 512, 512] gather
    else:
        acfs = jax.vmap(_autocorr)(dfframes)
    dfrevs = (dfframes * jnp.asarray(consts.dfwv))[:, ::-1]

    # comb filterbank contributions per harmonic a (batched gathers)
    i = jnp.arange(laglen, dtype=jnp.int32)
    interior = (i >= 1) & (i < laglen - 1)
    contribs = []
    for a in range(1, 5):
        idx = i[:, None] * a + jnp.arange(1, 2 * a)[None, :] - 1
        valid = idx < winlen
        vals = jnp.where(
            valid[None], acfs[:, jnp.clip(idx, 0, winlen - 1)], 0.0
        )
        contribs.append(jnp.sum(vals, axis=2) * interior[None])
    c1, c2, c3, c4 = contribs
    w = [jnp.float32(1.0 / (2 * a - 1)) for a in range(1, 5)]
    comb_w3 = c1 * w[0] + c2 * w[1] + c3 * w[2]
    comb_w4 = comb_w3 + c4 * w[3]
    comb_u3 = c1 + c2 + c3
    comb_u4 = comb_u3 + c4

    rwv = jnp.asarray(consts.rwv)

    def rp_of(comb_w):
        rayacf = comb_w * rwv
        maxindex = jax.vmap(_vec_max_elem)(rayacf)
        interp = jax.vmap(_quad_peak_pos)(rayacf, maxindex)
        return jnp.where(
            (maxindex > 0) & (maxindex < laglen - 1),
            interp,
            jnp.float32(consts.rayparam_trunc),
        )

    rp4 = rp_of(comb_w4)
    rp3 = rp_of(comb_w3)

    # Everything the scan needs from `rp` has only TWO candidates per
    # block (timesig 3 vs 4), so the timesig estimate and the flagconst
    # Gaussian weight vector hoist out of the sequential scan as batched
    # per-block precomputes — the scan body just selects (checkstate
    # src/aubio.rs:1167-1205 with gp = rp).
    g_var = jnp.float32(consts.g_var)
    j = jnp.arange(laglen, dtype=jnp.float32)

    def gwv_of(rp):
        diff = (j + 1.0) - rp[:, None]
        return jnp.exp(-0.5 * diff * diff / (g_var * g_var))

    return BlockInputs(
        dfrev=dfrevs,
        rp_if4=rp4,
        rp_if3=rp3,
        ts_if4=jax.vmap(_get_timesig)(acfs, rp4.astype(jnp.int32)),
        ts_if3=jax.vmap(_get_timesig)(acfs, rp3.astype(jnp.int32)),
        gwv_if4=gwv_of(rp4),
        gwv_if3=gwv_of(rp3),
        comb_u3=comb_u3,
        comb_u4=comb_u4,
    )


class BeatState(NamedTuple):
    gwv: jnp.ndarray  # [laglen]
    phwv: jnp.ndarray  # [2*laglen]
    timesig: jnp.ndarray  # i32
    counter: jnp.ndarray  # i32
    flagstep: jnp.ndarray  # i32
    gp: jnp.ndarray  # f32
    bp: jnp.ndarray  # f32
    rp: jnp.ndarray  # f32
    rp1: jnp.ndarray  # f32
    rp2: jnp.ndarray  # f32
    lastbeat: jnp.ndarray  # f32


def initial_beat_state(consts: _BTConstants) -> BeatState:
    f32 = jnp.float32
    return BeatState(
        gwv=jnp.zeros((consts.laglen,), f32),
        phwv=jnp.ones((2 * consts.laglen,), f32),
        timesig=jnp.int32(0),
        counter=jnp.int32(0),
        flagstep=jnp.int32(0),
        gp=f32(0.0),
        bp=f32(0.0),
        rp=f32(1.0),
        rp1=f32(0.0),
        rp2=f32(0.0),
        lastbeat=f32(0.0),
    )


def _checkstate(state: BeatState, xs: BlockInputs, rp, consts: _BTConstants):
    """BeatTracking::checkstate (src/aubio.rs:1096-1227)."""
    laglen = consts.laglen
    step = float(consts.step)
    g_var = jnp.float32(consts.g_var)
    sel3 = state.timesig == 3  # which precomputed rp branch fed `rp`

    # context-model gp update (comb filterbanks precomputed per block;
    # when gp > 0, timesig is always 3 or 4)
    comb_u = jnp.where(state.timesig == 4, xs.comb_u4, xs.comb_u3)
    acfout = comb_u * state.gwv
    gp_cand = _quad_peak_pos(acfout, _vec_max_elem(acfout))
    gp = jnp.where(state.gp > 0.0, gp_cand, jnp.float32(0.0))

    # two-stage counter/flagstep update (src/aubio.rs:1142-1165): the first
    # `if` may set counter=3, and the follow-up `else if counter > 0`
    # decrements it in the same call.
    at_zero = state.counter == 0
    step_change = jnp.abs(gp - rp) > 2.0 * g_var
    flagstep = jnp.where(
        at_zero,
        jnp.where(step_change, 1, 0).astype(jnp.int32),
        state.flagstep,
    )
    counter = jnp.where(at_zero & step_change, 3, state.counter)

    check = (counter == 1) & (flagstep == 1)
    consistent = jnp.abs(2.0 * rp - state.rp1 - state.rp2) < g_var
    flagconst = check & consistent
    counter = jnp.where(
        check,
        jnp.where(consistent, 0, 2),
        jnp.where(counter > 0, counter - 1, counter),
    )

    rp2 = state.rp1
    rp1 = rp

    # --- three-way bp/weights selection
    j2 = jnp.arange(2 * laglen, dtype=jnp.float32)

    # branch 1: flagconst — adopt new hypothesis. timesig/gwv from the
    # adopted rp are precomputed per block for both rp branches
    # (_precompute_blocks), so the scan body only selects.
    gp_c = rp
    timesig_c = jnp.where(sel3, xs.ts_if3, xs.ts_if4)
    gwv_c = jnp.where(sel3, xs.gwv_if3, xs.gwv_if4)
    bp_c = gp_c
    phwv_c = jnp.ones((2 * laglen,), jnp.float32)

    # branch 2: context-dependent model (timesig > 0)
    bp_ctx = gp
    d2 = 1.0 + j2 - step + state.lastbeat
    phwv_ctx = jnp.where(
        step > state.lastbeat,
        jnp.exp(-0.5 * d2 * d2 / (bp_ctx / 8.0)),
        jnp.ones_like(j2),
    )

    # branch 3: initial state
    bp_init = rp
    ones2 = jnp.ones((2 * laglen,), jnp.float32)

    # (the third branch, initial state, is the implicit else below)
    use_ctx = (~flagconst) & (state.timesig > 0)

    bp = jnp.where(flagconst, bp_c, jnp.where(use_ctx, bp_ctx, bp_init))
    gp_out = jnp.where(flagconst, gp_c, gp)
    timesig = jnp.where(flagconst, timesig_c, state.timesig)
    gwv = jnp.where(flagconst, gwv_c, state.gwv)
    phwv = jnp.where(
        flagconst, phwv_c, jnp.where(use_ctx, phwv_ctx, ones2)
    )

    # double very slow tempi until bp >= 25 (src/aubio.rs:1216-1218).
    # Statically unrolled: 32 conditional doublings (exact — the same
    # multiply order as the loop) cover every bp ≥ 25·2⁻³² ≈ 6e-9; real
    # peak positions are ≥ O(1), and a lax.while_loop's per-iteration
    # sync would dominate the ~224-block tempo scan on TPU.
    for _ in range(32):
        bp = jnp.where((bp > 0.0) & (bp < 25.0), bp * 2.0, bp)

    return state._replace(
        gwv=gwv,
        phwv=phwv,
        timesig=timesig,
        counter=counter,
        flagstep=flagstep,
        gp=gp_out,
        bp=bp,
        rp=rp,
        rp1=rp1,
        rp2=rp2,
    )


def _bt_do(state: BeatState, xs: BlockInputs, consts: _BTConstants):
    """BeatTracking::do_ (src/aubio.rs:966-1092) over precomputed block
    inputs. Returns (new_state, beats[_MAX_BEATS], beat_fires)."""
    winlen, step, laglen = consts.winlen, consts.step, consts.laglen
    dfrev = xs.dfrev

    # numelem = 4 unless timesig == 3 (timesig in {0, 3, 4})
    rp = jnp.where(state.timesig == 3, xs.rp_if3, xs.rp_if4)

    state = _checkstate(state, xs, rp, consts)
    bp = state.bp

    # --- beat phase (src/aubio.rs:1017-1091)
    def with_beats(state):
        bp = state.bp
        kmax = jnp.floor(winlen / bp).astype(jnp.int32)
        i_idx = jnp.arange(_MAX_PHASE_I, dtype=jnp.int32)
        k_idx = jnp.arange(_MAX_KMAX, dtype=jnp.int32)
        # ROUND(x) = floor(x + 0.5) (src/aubio.rs:1038-1039)
        offs = jnp.floor(bp * k_idx.astype(jnp.float32) + 0.5).astype(jnp.int32)
        # phout_head[i] = Σ_k ok(i,k) · dfrev[i + offs_k], but NOT as a
        # data-dependent [i, k] gather — XLA lowers that to thousands of
        # serialized scalar loads per scan step, and this one expression
        # was ~100% of the hypothesis scan's device time. Instead build
        # the selection matrix C[i, j] = Σ_k [j - i == offs_k]·ok(i, k)
        # from compares against the 21 offsets (static iota difference,
        # fused elementwise) and take phout_head = C @ dfrev on the MXU.
        # offs is strictly increasing by ≥25 (bp ≥ 25 post-doubling), so
        # at most one k matches a given (i, j) and C is effectively 0/1.
        i_ok_f = i_idx.astype(jnp.float32) < bp
        d_ij = (
            jnp.arange(winlen, dtype=jnp.int32)[None, :] - i_idx[:, None]
        )  # [_MAX_PHASE_I, winlen], static
        c = jnp.zeros(d_ij.shape, jnp.float32)
        for k in range(_MAX_KMAX):
            ok_k = i_ok_f & (k < kmax)  # (gather_idx < winlen) == d_ij match
            c = c + jnp.where(
                (d_ij == offs[k]) & ok_k[:, None], 1.0, 0.0
            )
        phout_head = jnp.matmul(
            c, dfrev, precision=jax.lax.Precision.HIGHEST
        )  # [_MAX_PHASE_I]
        phout = jnp.zeros((winlen,), jnp.float32).at[:_MAX_PHASE_I].set(phout_head)
        # vec_weight truncates to min(len, weights) = 2*laglen entries
        phout = phout.at[: 2 * laglen].mul(state.phwv)
        maxindex = _vec_max_elem(phout)
        phase = jnp.where(
            maxindex >= winlen - 1,
            jnp.float32(step) - state.lastbeat,
            _quad_peak_pos(phout, maxindex),
        )
        phase = phase + 1.0

        beat0 = bp - phase
        skip = (jnp.float32(step) - state.lastbeat - phase) < (-0.40 * bp)
        beat0 = jnp.where(skip, beat0 + bp, beat0)
        # while beat + bp < 0: beat += bp — statically unrolled: here
        # bp >= 25 (post-doubling) and phase <= winlen+1 = 513, so at
        # most ceil(513/25) = 21 additions; 24 conditional adds keep the
        # exact repeated-addition float ordering without a while_loop.
        for _ in range(24):
            beat0 = jnp.where(beat0 + bp < 0.0, beat0 + bp, beat0)
        if os.environ.get("BLISS_CHECKS") == "1":
            # debug mode: if the bp>=25 / phase<=513 invariant above ever
            # breaks (e.g. bp in (0, 25·2^-32)), the unroll would diverge
            # from the reference's unbounded loop — poison the result so
            # tests fail loudly instead of silently skewing the tempo
            beat0 = jnp.where(
                beat0 + bp < 0.0, jnp.float32(jnp.nan), beat0
            )

        # emit beats: first if beat >= 0, then while beat + bp <= step
        def emit(carry, _):
            beat, emitted, first = carry
            do_first = first & (beat >= 0.0)
            do_more = (~first) & (beat + bp <= step)
            nbeat = jnp.where(do_more, beat + bp, beat)
            val = jnp.where(do_first, beat, nbeat)
            fire = do_first | do_more
            return (nbeat, emitted + fire.astype(jnp.int32), jnp.bool_(False)), (
                val,
                fire,
            )

        (final_beat, _, _), (vals, fires) = jax.lax.scan(
            emit,
            (beat0, jnp.int32(0), jnp.bool_(True)),
            None,
            length=_MAX_BEATS,
            unroll=_MAX_BEATS,
        )
        # reference sets lastbeat to the final `beat` value whether or not
        # anything was emitted (src/aubio.rs:1089)
        return state._replace(lastbeat=final_beat), vals, fires

    def without_beats(state):
        return (
            state,
            jnp.zeros((_MAX_BEATS,), jnp.float32),
            jnp.zeros((_MAX_BEATS,), jnp.bool_),
        )

    state, beat_vals, beat_fires = jax.lax.cond(
        bp == 0.0, without_beats, with_beats, state
    )
    return state, beat_vals, beat_fires


def tempo_feature(signal: jnp.ndarray, length, sample_rate: int = 22050):
    """Full tempo pipeline: signal → normalized median BPM in [-1, 1]
    (BPMDesc, src/temporal.rs:32-85)."""
    consts = _bt_constants(sample_rate)
    step = consts.step

    t = signal.shape[-1]
    h_max = int(n_frames_strided(t, WINDOW_SIZE, HOP_SIZE))
    h_valid = n_frames_strided(
        jnp.asarray(length, jnp.int32), WINDOW_SIZE, HOP_SIZE
    )

    # hop windows: pvoc frame at hop h spans [256(h-1), 256(h+1))
    if _use_fused_specflux():
        # fused Pallas kernel: the [H, 257] magnitudes never leave VMEM
        from ..ops.pallas_dft import pallas_frame_dft_specflux

        offset = WINDOW_SIZE - HOP_SIZE
        onset = pallas_frame_dft_specflux(
            jnp.concatenate([jnp.zeros((offset,), signal.dtype), signal]),
            WINDOW_SIZE, HOP_SIZE, h_max,
        )
    else:
        mags = framed_pvoc_mags(
            signal, WINDOW_SIZE, HOP_SIZE, offset=WINDOW_SIZE - HOP_SIZE,
            n_frames=h_max,
        )  # [H, 257]
        onset = onset_function(mags)
    thresh = thresholded_series(onset)  # [H]

    # silence gate sees the raw (non-slid) 512-sample window at hop h
    silent = silence_flags_blocked(signal, h_max)

    return tempo_from_series(thresh, silent, h_valid, sample_rate)


def tempo_from_series(
    thresh: jnp.ndarray,
    silent: jnp.ndarray,
    h_valid,
    sample_rate: int = 22050,
):
    """Beat tracking + median BPM from the per-hop thresholded novelty
    `thresh` `[H]` and silence flags `silent` `[H]` (hops >= `h_valid`
    are masked). Split out of `tempo_feature` so the time-sharded
    long-song path (parallel/longsong.py) can compute the per-hop series
    sharded and run this small replicated stage on the gathered result.
    """
    consts = _bt_constants(sample_rate)
    step = consts.step
    h_max = thresh.shape[0]

    # --- sequential beat tracking, one scan step per `step` hops.
    # Block k runs BeatTracking at hop 127+128k on a detection-function
    # buffer that is a pure strided window of the thresholded series
    # (src/aubio.rs:1389-1416), so everything except the hypothesis state
    # machine is precomputed batched (see _precompute_blocks).
    n_blocks = max((h_max - (step - 1) - 1) // step + 1, 0)
    if n_blocks == 0:
        return jnp.float32(-1.0)

    thresh_masked = jnp.where(
        jnp.arange(h_max, dtype=jnp.int32) < h_valid, thresh, 0.0
    )
    block_inputs = _precompute_blocks(thresh_masked, n_blocks, consts)

    state0 = initial_beat_state(consts)
    pad_silent = jnp.concatenate([silent, jnp.ones((step,), jnp.bool_)])

    def block(state, xs_k):
        xs, k = xs_k
        hk = (step - 1) + step * k  # hop index of the BT run
        block_valid = hk < h_valid

        new_state, beat_vals, beat_fires = _bt_do(state, xs, consts)
        bpm = jnp.where(
            new_state.bp != 0.0,
            60.0
            * sample_rate
            / (jnp.float32(HOP_SIZE) * new_state.bp),
            0.0,
        )

        # per-beat firing: hop = hk + floor(beat), requires frac > 0,
        # hop valid, and not silent (src/aubio.rs:1419-1438 + temporal.rs:50-57)
        beat_floor = jnp.floor(beat_vals)
        frac = beat_vals - beat_floor
        hop_of_beat = hk + beat_floor.astype(jnp.int32)
        in_block = (beat_floor >= 0) & (beat_floor < step)
        hop_ok = hop_of_beat < h_valid
        not_silent = ~pad_silent[jnp.clip(hop_of_beat, 0, h_max + step - 1)]
        fire = (
            beat_fires
            & block_valid
            & in_block
            & hop_ok
            & not_silent
            & (frac > 0.0)
        )
        bpm_out = jnp.where(fire, bpm, 0.0)

        out_state = jax.tree.map(
            lambda new, old: jnp.where(block_valid, new, old), new_state, state
        )
        return out_state, (bpm_out, fire)

    _, (bpms, fires) = jax.lax.scan(
        block,
        state0,
        (block_inputs, jnp.arange(n_blocks, dtype=jnp.int32)),
        unroll=int(os.environ.get("BLISS_TEMPO_UNROLL", "1")),
    )
    bpms = bpms.ravel()
    fires = fires.ravel()

    any_beat = jnp.any(fires)
    median = masked_quantile_midpoint(bpms, fires, 0.5)
    value = normalize_range(median, 0.0, MAX_BPM)
    return jnp.where(any_beat, value, -1.0).astype(jnp.float32)
