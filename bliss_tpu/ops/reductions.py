"""Masked reductions and scalar DSP kernels.

The reference summarizes streaming descriptor values with mean/std/median
over growing Vecs (bliss-rs src/timbral.rs, src/temporal.rs:66-77,
src/misc.rs:51-65). On TPU, values live in fixed-size arrays with validity
masks, so every summary here takes an explicit mask.
"""

from __future__ import annotations

import os

import jax
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


#: Threshold for switching large-input quantiles to bitwise-bisection
#: selection on TPU. Round 1 measured the *fori_loop* bisect running
#: ~1000x off roofline on the axon backend and parked it; a statically
#: UNROLLED 32-iteration bisect has no such pathology — measured on the
#: chip (tmp/probe_median.py, [8, 4.76M] masked median, the chroma
#: tuning-threshold shape): sort 139.9 ms, unrolled bisect 14.6 ms
#: (9.6x), bit-identical results. CPU keeps the sort (fast there, and
#: the golden-parity path). The fori variant remains for the
#: cross-shard median in parallel/longsong.py where a distributed sort
#: isn't an option.
_BISECT_THRESHOLD = 1 << 20


def _use_bisect(n: int) -> bool:
    return n >= _BISECT_THRESHOLD and jax.default_backend() == "tpu"


def _radix_plane_bytes(shape) -> int:
    """VMEM footprint of the byte-radix kernel's int8 plane for a 2-D
    input: rows padded to 32, cols to 128 (ops/pallas_select.py
    `_pad_to_tile`). The plane is a single ungridded VMEM block, so the
    dispatch must bound it (very long songs grow the pip_track frame
    count past the ~16 MB VMEM budget)."""
    r, c = shape
    return (-(-r // 32) * 32) * (-(-c // 128) * 128)


def _float_sort_key(x: jnp.ndarray) -> jnp.ndarray:
    """Order-isomorphic unsigned integer key of a float array (IEEE)."""
    if x.dtype == jnp.float64:
        i = jax.lax.bitcast_convert_type(x, jnp.int64)
        bias = jnp.uint64(1) << jnp.uint64(63)
        u = i.astype(jnp.uint64)
        return jnp.where(i < 0, ~u, u | bias)
    i = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    bias = jnp.uint32(0x80000000)
    u = i.astype(jnp.uint32)
    return jnp.where(i < 0, ~u, u | bias)


def _key_to_float(key, dtype):
    """Inverse of `_float_sort_key`."""
    if dtype == jnp.float64:
        bias = jnp.uint64(1) << jnp.uint64(63)
        i = jnp.where(
            key & bias != 0, (key ^ bias).astype(jnp.int64),
            (~key).astype(jnp.int64),
        )
        return jax.lax.bitcast_convert_type(i, jnp.float64)
    bias = jnp.uint32(0x80000000)
    i = jnp.where(
        key & bias != 0, (key ^ bias).astype(jnp.int32),
        (~key).astype(jnp.int32),
    )
    return jax.lax.bitcast_convert_type(i, jnp.float32)


def _kth_smallest_bisect(values: jnp.ndarray, mask: jnp.ndarray, k):
    """Exact k-th smallest masked value via bisection on the float's
    order-isomorphic integer key (32/64 rounds of a masked count)."""
    dtype = values.dtype
    keys = _float_sort_key(values)
    utype = keys.dtype
    allones = ~jnp.asarray(0, utype)
    keys = jnp.where(mask, keys, allones)
    # materialize once: without the barrier XLA fuses the (expensive)
    # producer of `values` into every bisection iteration
    keys, mask = jax.lax.optimization_barrier((keys, mask))
    bits = 64 if dtype == jnp.float64 else 32

    def body(_, bounds):
        lo, hi = bounds
        mid = lo + (hi - lo) // jnp.asarray(2, utype)
        cnt = jnp.sum((keys <= mid) & mask, dtype=jnp.int32)
        take_low = cnt >= k + 1
        one = jnp.asarray(1, utype)
        return (
            jnp.where(take_low, lo, mid + one),
            jnp.where(take_low, mid, hi),
        )

    lo = jnp.asarray(0, utype)
    hi = allones - jnp.asarray(1, utype)
    key, _ = jax.lax.fori_loop(0, bits, body, (lo, hi))
    return _key_to_float(key, dtype)


def _kth_smallest_bisect_unrolled_pair(
    values: jnp.ndarray, mask: jnp.ndarray, k1, k2
):
    """Two k-selections via statically unrolled bitwise bisection.

    Unrolled because on the axon TPU backend a fori_loop reduction runs
    ~1000x off roofline while the identical unrolled program hits ~15 ms
    for 32 masked counts over 38M keys (see _BISECT_THRESHOLD note).
    Paired because both bisection states count against the SAME key
    array each iteration — XLA fuses the two masked sums into one sweep,
    so the quantile midpoint's (floor, ceil) selections cost one pass'
    memory traffic instead of two.
    """
    dtype = values.dtype
    keys = _float_sort_key(values)
    utype = keys.dtype
    allones = ~jnp.asarray(0, utype)
    keys = jnp.where(mask, keys, allones)
    keys = jax.lax.optimization_barrier(keys)
    bits = 64 if dtype == jnp.float64 else 32
    one = jnp.asarray(1, utype)
    two = jnp.asarray(2, utype)
    lo1 = lo2 = jnp.asarray(0, utype)
    hi1 = hi2 = allones - one
    # the masked count needs no `& mask`: masked keys are pinned to
    # all-ones above, and mid <= allones-1 always, so masked entries can
    # never satisfy `keys <= mid`. Re-anding with `mask` here is not just
    # redundant — `mask` is usually a fused producer chain (e.g. the
    # pip_track peak stencil over a 400 MB spectrogram), and referencing
    # it inside the unrolled loop makes XLA rematerialize that whole
    # chain once per bisection step (measured: 21 ms -> 7 ms for the
    # [8 x 4.76M] tuning-threshold median when dropped).
    for _ in range(bits):
        mid1 = lo1 + (hi1 - lo1) // two
        mid2 = lo2 + (hi2 - lo2) // two
        cnt1 = jnp.sum(keys <= mid1, dtype=jnp.int32)
        cnt2 = jnp.sum(keys <= mid2, dtype=jnp.int32)
        take_low1 = cnt1 >= k1 + 1
        take_low2 = cnt2 >= k2 + 1
        lo1 = jnp.where(take_low1, lo1, mid1 + one)
        hi1 = jnp.where(take_low1, mid1, hi1)
        lo2 = jnp.where(take_low2, lo2, mid2 + one)
        hi2 = jnp.where(take_low2, mid2, hi2)
    return _key_to_float(lo1, dtype), _key_to_float(lo2, dtype)


def masked_quantile_midpoint_all(
    values: jnp.ndarray, mask: jnp.ndarray, q: float = 0.5
) -> jnp.ndarray:
    """`masked_quantile_midpoint` over ALL elements of an nD array.

    Shape-preserving on purpose: flattening a TPU-tiled [rows, frames]
    array whose minor dim is not lane-aligned (e.g. the [1430, 3329]
    pip_track magnitudes) costs a full re-tiling relayout; the bisection
    only needs global masked counts, which reduce over any shape.
    """
    if values.ndim == 1 or not _use_bisect(values.size):
        return masked_quantile_midpoint(values.ravel(), mask.ravel(), q)
    if (
        values.ndim == 2
        and values.dtype == jnp.float32
        and os.environ.get("BLISS_PALLAS_SELECT") != "0"
        # explicit backend guard: the radix kernel is a TPU pallas_call;
        # don't let the dispatch depend on _use_bisect's internals
        and jax.default_backend() == "tpu"
        # the int8 plane is one ungridded VMEM block — bound it so very
        # long songs (plane bytes scale with song length) fall back to
        # the HBM bisect instead of blowing the ~16 MB VMEM budget
        and _radix_plane_bytes(values.shape) <= 8 << 20
    ):
        # byte-radix kernel: VMEM-resident planes replace 32 full-array
        # HBM count sweeps (~5x less traffic, see ops/pallas_select.py)
        from .pallas_select import masked_quantile_midpoint_radix

        return masked_quantile_midpoint_radix(values, mask, q)
    n = jnp.sum(mask.astype(jnp.int32))
    pos = (n - 1).astype(jnp.float32) * q
    lo_k = jnp.maximum(jnp.floor(pos).astype(jnp.int32), 0)
    hi_k = jnp.maximum(jnp.ceil(pos).astype(jnp.int32), 0)
    vlo, vhi = _kth_smallest_bisect_unrolled_pair(values, mask, lo_k, hi_k)
    mid = (vlo + vhi) * jnp.asarray(0.5, values.dtype)
    return jnp.where(n > 0, mid, jnp.asarray(jnp.inf, values.dtype))


def masked_quantile_midpoint(
    values: jnp.ndarray, mask: jnp.ndarray, q: float = 0.5
) -> jnp.ndarray:
    """Quantile with Midpoint interpolation over masked entries.

    Matches ndarray-stats' `Midpoint`: `(x[floor((n-1)q)] + x[ceil((n-1)q)])/2`
    on the sorted valid values (used for the BPM median at
    src/temporal.rs:71-76 and the tuning threshold at src/chroma.rs:381-384).
    Large inputs use exact bisection selection instead of a full sort.
    An all-False mask returns +inf on every path (the sort path fills
    with +inf naturally; the bisect path is guarded so both backends
    agree on the degenerate case) — still gate on `mask.any()` at the
    caller when +inf is not a usable sentinel.
    """
    n = jnp.sum(mask.astype(jnp.int32), axis=-1)
    pos = (n - 1).astype(jnp.float32) * q
    if values.ndim == 1 and _use_bisect(values.shape[-1]):
        lo_k = jnp.maximum(jnp.floor(pos).astype(jnp.int32), 0)
        hi_k = jnp.maximum(jnp.ceil(pos).astype(jnp.int32), 0)
        vlo, vhi = _kth_smallest_bisect_unrolled_pair(
            values, mask, lo_k, hi_k
        )
        mid = (vlo + vhi) * jnp.asarray(0.5, values.dtype)
        # empty mask: the bisect converges into the all-ones (NaN) key
        # range; pin it to the sort path's +inf so the backends agree
        return jnp.where(n > 0, mid, jnp.asarray(jnp.inf, values.dtype))
    big = jnp.asarray(jnp.inf, values.dtype)
    filled = jnp.where(mask, values, big)
    s = jnp.sort(filled, axis=-1)
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
