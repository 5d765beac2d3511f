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


def rdft_mags(frames: jnp.ndarray, n_bins: int | None = None) -> jnp.ndarray:
    """|DFT| of `frames [..., W]` → `[..., n_bins]`."""
    re, im = rdft(frames, n_bins)
    return jnp.sqrt(re * re + im * im)
