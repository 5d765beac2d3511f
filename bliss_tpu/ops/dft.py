"""Real DFT magnitudes as MXU matmuls.

XLA's TPU FFT is slow for this workload (a 26k x 8192 rfft batch takes
seconds); expressing the real DFT as two [W, W/2+1] cos/sin matmuls puts
the work on the 128x128 systolic array instead: ~7 TFLOP of matmul
replaces the FFT and runs in ~0.2 s at f32-on-MXU rates.

Numerical care: the twiddle angle is computed from `(n*k) mod W` in
*integer* arithmetic before converting to float, so the argument to
cos/sin stays in [0, 2pi) — naively computing 2*pi*n*k/W in f32 loses
up to ~2e-3 rad for n*k ~ 3e7. With that, matmul-DFT magnitudes match
rfft to ~1e-5 relative in f32.

The CPU/f64 golden-parity path keeps `jnp.fft.rfft`; backend dispatch
happens in ops.spectral.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp


def _twiddles(window: int, n_bins: int, dtype):
    """cos/sin matrices [window, n_bins] with integer-exact phase."""
    n = jax.lax.broadcasted_iota(jnp.int32, (window, n_bins), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (window, n_bins), 1)
    phase = (n * k) % window  # exact: max product 8191*4096 < 2^31
    theta = phase.astype(dtype) * (2.0 * math.pi / window)
    return jnp.cos(theta), -jnp.sin(theta)


#: Chunk length for compensated accumulation: the f32 accumulator error
#: over a W-long dot grows ~sqrt(W)*eps; chunking at 1024 + Neumaier
#: combination keeps it at the in-chunk level (~1e-6 relative).
_ACC_CHUNK = 1024


def _dot_last(frames, m):
    return jax.lax.dot_general(
        frames, m,
        dimension_numbers=(((frames.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=frames.dtype,
    )


def _dot_compensated(frames, m):
    """dot along the last axis with chunked Neumaier-compensated adds."""
    w = frames.shape[-1]
    if w <= _ACC_CHUNK:
        return _dot_last(frames, m)
    s = _dot_last(frames[..., :_ACC_CHUNK], m[:_ACC_CHUNK])
    comp = jnp.zeros_like(s)
    for lo in range(_ACC_CHUNK, w, _ACC_CHUNK):
        hi = min(lo + _ACC_CHUNK, w)
        p = _dot_last(frames[..., lo:hi], m[lo:hi])
        t = s + p
        comp = comp + jnp.where(
            jnp.abs(s) >= jnp.abs(p), (s - t) + p, (p - t) + s
        )
        s = t
    return s + comp


def rdft(frames: jnp.ndarray, n_bins: int | None = None):
    """(re, im) of the real DFT of `frames [..., W]` via two MXU matmuls."""
    w = frames.shape[-1]
    if n_bins is None:
        n_bins = w // 2 + 1
    cos_m, sin_m = _twiddles(w, n_bins, frames.dtype)
    return _dot_compensated(frames, cos_m), _dot_compensated(frames, sin_m)


#: Cooley-Tukey split for the big chroma window: one [W, W/2] matmul
#: costs W^2 MACs/frame; the N1 x N2 decomposition costs
#: W*(N1 + 4*N2)/2-ish — ~10x fewer FLOPs at W = 8192.
_CT_N1 = 64


def _use_ct(w: int) -> bool:
    forced = os.environ.get("BLISS_DFT_CT")
    if forced == "0":
        return False
    if forced == "1":
        return True
    return w >= 4096 and jax.default_backend() == "tpu"


def _ct_twiddle(rows: int, cols: int, mod: int, dtype):
    """(cos, sin) of 2*pi*(r*c mod mod)/mod — integer-exact phase."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    theta = ((r * c) % mod).astype(dtype) * (2.0 * math.pi / mod)
    return jnp.cos(theta), jnp.sin(theta)


def _dot(a, m, dim=None):
    """Contract `a`'s `dim` (default: last) with `m`'s rows.

    Contracting a non-minor dim directly through dot_general lets XLA
    fold the layout change into the MXU operand read instead of
    materializing an explicit swapaxes copy (measured ~5 ms per 8x5-min
    chroma batch)."""
    if dim is None:
        dim = a.ndim - 1
    return jax.lax.dot_general(
        a, m,
        dimension_numbers=(((dim,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=a.dtype,
    )


def _rdft_mags_ct(frames: jnp.ndarray, n_bins: int) -> jnp.ndarray:
    """|DFT| via the 2-stage Cooley-Tukey matmul decomposition.

    W = N1*N2, n = N2*n1 + n2, k = k1 + N1*k2:
      A[n2, k1] = sum_n1 x[N2*n1 + n2] W_N1^{n1 k1}   (real -> complex)
      B[n2, k1] = A[n2, k1] * W_W^{n2 k1}             (twiddle)
      X[k1, k2] = sum_n2 B[n2, k1] W_N2^{n2 k2}       (complex DFT)
    Each stage keeps integer-exact phase; the shorter accumulations
    (N1, then N2 terms) round no worse than the monolithic matmul.
    """
    w = frames.shape[-1]
    n1 = _CT_N1
    n2 = w // n1
    dt = frames.dtype
    x = frames.reshape(*frames.shape[:-1], n1, n2)

    c1, s1 = _ct_twiddle(n1, n1, n1, dt)  # inner W_N1
    tc, ts = _ct_twiddle(n2, n1, w, dt)   # twiddle W_W [n2, k1]
    c2, s2 = _ct_twiddle(n2, n2, n2, dt)  # outer W_N2

    # inner: contract n1 (the second-to-last dim of x) -> A[..., n2, k1]
    are = _dot(x, c1, x.ndim - 2)
    aim = -_dot(x, s1, x.ndim - 2)
    # twiddle: multiply by e^{-i 2pi n2 k1 / W}
    bre = are * tc + aim * ts
    bim = aim * tc - are * ts
    # outer: contract n2 (second-to-last of B) -> X[..., k1, k2]
    xre = _dot(bre, c2, bre.ndim - 2) + _dot(bim, s2, bim.ndim - 2)
    xim = _dot(bim, c2, bim.ndim - 2) - _dot(bre, s2, bre.ndim - 2)
    mags = jnp.sqrt(xre * xre + xim * xim)  # [..., k1, k2]
    # linear bin k = k1 + N1*k2 -> order [..., k2, k1]
    mags = jnp.swapaxes(mags, -1, -2).reshape(*frames.shape[:-1], w)
    return mags[..., :n_bins]


def rdft_mags(frames: jnp.ndarray, n_bins: int | None = None) -> jnp.ndarray:
    """|DFT| of `frames [..., W]` → `[..., n_bins]`."""
    w = frames.shape[-1]
    if n_bins is None:
        n_bins = w // 2 + 1
    if w % _CT_N1 == 0 and _use_ct(w):
        return _rdft_mags_ct(frames, n_bins)
    re, im = rdft(frames, n_bins)
    return jnp.sqrt(re * re + im * im)
