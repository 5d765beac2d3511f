"""Masked reductions and scalar DSP kernels.

The reference summarizes streaming descriptor values with mean/std/median
over growing Vecs (bliss-rs src/timbral.rs, src/temporal.rs:66-77,
src/misc.rs:51-65). On TPU, values live in fixed-size arrays with validity
masks, so every summary here takes an explicit mask.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray, axis=-1) -> jnp.ndarray:
    """Mean over `mask`-selected entries (NaN-safe in masked positions)."""
    zero = jnp.zeros((), values.dtype)
    n = jnp.sum(mask.astype(values.dtype), axis=axis)
    return jnp.sum(jnp.where(mask, values, zero), axis=axis) / jnp.maximum(n, 1)


def masked_std(values: jnp.ndarray, mask: jnp.ndarray, axis=-1) -> jnp.ndarray:
    """Population standard deviation (ddof=0) over masked entries,
    two-pass like ndarray's `std_axis` (used at src/timbral.rs:59-121).
    NaN-safe in masked positions."""
    zero = jnp.zeros((), values.dtype)
    n = jnp.maximum(jnp.sum(mask.astype(values.dtype), axis=axis), 1)
    mean = jnp.sum(jnp.where(mask, values, zero), axis=axis) / n
    d = jnp.where(mask, values - jnp.expand_dims(mean, axis), zero)
    return jnp.sqrt(jnp.sum(d * d, axis=axis) / n)


def masked_quantile_midpoint(
    values: jnp.ndarray, mask: jnp.ndarray, q: float = 0.5
) -> jnp.ndarray:
    """Quantile with Midpoint interpolation over masked entries.

    Matches ndarray-stats' `Midpoint`: `(x[floor((n-1)q)] + x[ceil((n-1)q)])/2`
    on the sorted valid values (used for the BPM median at
    src/temporal.rs:71-76 and the tuning threshold at src/chroma.rs:381-384).
    Returns NaN-free garbage when no entry is valid — gate on `mask.any()`
    at the caller.
    """
    big = jnp.asarray(jnp.inf, values.dtype)
    filled = jnp.where(mask, values, big)
    s = jnp.sort(filled, axis=-1)
    n = jnp.sum(mask.astype(jnp.int32), axis=-1)
    pos = (n - 1).astype(jnp.float32) * q
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, values.shape[-1] - 1)
    hi = jnp.clip(jnp.ceil(pos).astype(jnp.int32), 0, values.shape[-1] - 1)
    vlo = jnp.take_along_axis(s, lo[..., None], axis=-1)[..., 0]
    vhi = jnp.take_along_axis(s, hi[..., None], axis=-1)[..., 0]
    half = jnp.asarray(0.5, values.dtype)
    return (vlo + vhi) * half


def geometric_mean(values: jnp.ndarray, axis=-1) -> jnp.ndarray:
    """Geometric mean of non-negative values; 0 if any value is 0.

    Log-domain equivalent of the exponent/mantissa product trick at
    src/utils.rs:101-117 (log2 of 0 is -inf, whose mean maps back to 0).
    """
    logs = jnp.log2(values)
    return jnp.exp2(jnp.mean(logs, axis=axis))


def zero_crossing_count(signal: jnp.ndarray, length=None) -> jnp.ndarray:
    """Count sign changes of the `x > 0` predicate (Essentia algorithm,
    src/utils.rs:81-95). Only the first `length` samples participate."""
    t = signal.shape[-1]
    pos = signal > 0
    change = pos[..., 1:] != pos[..., :-1]
    if length is not None:
        idx = jnp.arange(1, t, dtype=jnp.int32)
        change = change & (idx < jnp.asarray(length, jnp.int32))
    return jnp.sum(change.astype(jnp.int32), axis=-1)


def normalize_range(value, min_value: float, max_value: float):
    """Min-max normalization into [-1, 1] (Normalize trait,
    src/utils.rs:70-77)."""
    return 2.0 * (value - min_value) / (max_value - min_value) - 1.0
