"""Pallas TPU kernel: exact masked k-th-smallest by byte-radix bisection.

The XLA bisect selection (ops/reductions.py
`_kth_smallest_bisect_unrolled_pair`) runs 32 unrolled masked counts,
each a full HBM sweep of the f32 sort-key array — ~4.9 GB of traffic
for the tuning-threshold median over an 8x5-min batch (~5-8 ms).

This kernel replaces it with a 4-level byte radix: per level an int8
"plane" (this level's key byte where the element's higher bytes match
the already-selected prefix, a sentinel elsewhere) is DMA'd to VMEM
ONCE and bisected there in 8 unrolled iterations; HBM sees each plane
once plus one key sweep per level to build the next plane. Total
traffic drops ~5x and the count sweeps run at VMEM bandwidth.

Exactness: identical order statistics to the 32-bit bisect — the radix
walks the same unsigned-key order (reference semantics: ndarray-stats
Midpoint quantile, bliss-rs src/chroma.rs:381-384). Sentinel subtlety:
int8 has no spare value above +127, so a valid byte 0xFF collides with
the sentinel. Harmless by construction — the bisect never counts
mid > 0xFE, so a k-th element with byte 0xFF is reached when every
count at mid <= 0xFE falls short (lo converges to 0xFF), and the
below-bucket count at 0xFE excludes sentinels; the next level's plane
re-derives membership from the FULL prefix compare against the u32
keys plus the original mask, so sentinels never leak in.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SENT = 127  # int8 sentinel (= byte 0xFF after the +-128 offset)


def _make_bisect8_kernel(rows: int, row_chunk: int):
    """8-iteration bisect for the k-th smallest byte in an int8 plane.

    The plane stays int8 in VMEM (half the footprint of bf16, which
    matters for the double-buffered pipeline); v5e has no int8 ordered
    compare, so each count pass converts row-chunks to f32 first (the
    supported dequantize pattern) and compares there — bytes 0..255 are
    exact in f32. Excluded elements hold _SENT. Writes
    `[bucket_byte, count_below_bucket]` (int32) to `out_ref[0, :2]`.
    """
    assert rows % row_chunk == 0, (rows, row_chunk)
    n_chunks = rows // row_chunk

    def count_le(plane_ref, mid):
        """#elements <= mid (mid in signed-offset space, f32).

        fori_loop (not an unrolled Python loop) so only ONE widened
        chunk is live — unrolling made Mosaic keep every segment's f32
        temporaries on the VMEM stack at once (measured OOM)."""

        def body(ch, cnt):
            seg = plane_ref[
                pl.ds(ch * row_chunk, row_chunk), :
            ].astype(jnp.float32)
            s = jnp.sum((seg <= mid).astype(jnp.int32), dtype=jnp.int32)
            # pin the carry dtype: under x64 (CPU interpret mode) the
            # add would weakly promote and break the fori carry contract
            return (cnt + s).astype(jnp.int32)

        return jax.lax.fori_loop(0, n_chunks, body, jnp.int32(0))

    def kernel(k_ref, plane_ref, out_ref):
        k = k_ref[0, 0]
        lo = jnp.int32(0)
        hi = jnp.int32(254)
        for _ in range(8):
            mid = lo + (hi - lo) // 2
            cnt = count_le(plane_ref, (mid - 128).astype(jnp.float32))
            take_low = cnt >= k + 1
            lo = jnp.where(take_low, lo, mid + 1)
            hi = jnp.where(take_low, mid, hi)
        bucket = lo  # in [0, 255]
        below = jnp.where(
            bucket > 0,
            count_le(plane_ref, (bucket - 129).astype(jnp.float32)),
            0,
        )
        out_ref[0, 0] = bucket
        out_ref[0, 1] = below

    return kernel


def _row_chunk(rows: int) -> int:
    """Largest divisor of `rows` keeping the f32 widen chunk <= ~3 MB of
    VMEM (rows are pre-padded to a multiple of 32)."""
    for ch in (160, 128, 96, 64, 32):
        if rows % ch == 0:
            return ch
    return 32 if rows % 32 == 0 else rows


def _bisect8(plane: jnp.ndarray, k: jnp.ndarray, interpret: bool = False):
    """Run the bisect kernel on an int8 plane `[Rp, Cp]` (tile-padded)."""
    rows = plane.shape[0]
    out = pl.pallas_call(
        _make_bisect8_kernel(rows, _row_chunk(rows)),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
        interpret=interpret,
    )(k.reshape(1, 1), plane)
    return out[0, 0], out[0, 1]


def _pad_to_tile(x: jnp.ndarray, fill) -> jnp.ndarray:
    r, c = x.shape
    rp = -(-r // 32) * 32
    cp = -(-c // 128) * 128
    if (rp, cp) == (r, c):
        return x
    return jnp.pad(x, ((0, rp - r), (0, cp - c)), constant_values=fill)


_SENT16 = 32767  # i16 sentinel (= u16 0xFFFF after the +-32768 offset)


def _make_bisect16_pair_kernel(rows: int, row_chunk: int):
    """16-iteration bisect for TWO order statistics in one i16 plane.

    The fused tuning estimator (models/chroma.py) selects the midpoint
    median's floor/ceil ranks over one u16 half of the sort keys; both
    ranks share every count pass (one chunk widen, two compares), so a
    level costs ~half of two independent bisects. Plane values are u16
    bytes offset by -32768 (no 16-bit ordered compare either — chunks
    widen to f32, where 0..65535 is exact); excluded elements hold
    `_SENT16`, with the same never-count-the-top-value construction as
    the int8 kernel. Writes `[b_f, b_c, below_f, below_c]` (int32,
    `below_*` = #elements in buckets strictly below `b_*`) to
    `out_ref[0, :4]`.
    """
    assert rows % row_chunk == 0, (rows, row_chunk)
    n_chunks = rows // row_chunk

    def count_le2(plane_ref, mid_f, mid_c):
        def body(ch, cnt):
            seg = plane_ref[
                pl.ds(ch * row_chunk, row_chunk), :
            ].astype(jnp.float32)
            s_f = jnp.sum((seg <= mid_f).astype(jnp.int32), dtype=jnp.int32)
            s_c = jnp.sum((seg <= mid_c).astype(jnp.int32), dtype=jnp.int32)
            return (
                (cnt[0] + s_f).astype(jnp.int32),
                (cnt[1] + s_c).astype(jnp.int32),
            )

        return jax.lax.fori_loop(
            0, n_chunks, body, (jnp.int32(0), jnp.int32(0))
        )

    def widen(mid):
        return (mid - 32768).astype(jnp.float32)

    def kernel(k_ref, plane_ref, out_ref):
        kf = k_ref[0, 0]
        kc = k_ref[0, 1]
        lo_f = jnp.int32(0)
        hi_f = jnp.int32(65534)
        lo_c = jnp.int32(0)
        hi_c = jnp.int32(65534)
        for _ in range(16):
            mid_f = lo_f + (hi_f - lo_f) // 2
            mid_c = lo_c + (hi_c - lo_c) // 2
            cf, cc = count_le2(plane_ref, widen(mid_f), widen(mid_c))
            tl_f = cf >= kf + 1
            tl_c = cc >= kc + 1
            lo_f = jnp.where(tl_f, lo_f, mid_f + 1)
            hi_f = jnp.where(tl_f, mid_f, hi_f)
            lo_c = jnp.where(tl_c, lo_c, mid_c + 1)
            hi_c = jnp.where(tl_c, mid_c, hi_c)
        bl_f, bl_c = count_le2(plane_ref, widen(lo_f - 1), widen(lo_c - 1))
        out_ref[0, 0] = lo_f
        out_ref[0, 1] = lo_c
        out_ref[0, 2] = jnp.where(lo_f > 0, bl_f, 0)
        out_ref[0, 3] = jnp.where(lo_c > 0, bl_c, 0)

    return kernel


def bisect16_pair(
    plane: jnp.ndarray, ks: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Run the paired 16-bit bisect on an i16 plane `[R, C]`.

    `ks` is `[1, 2]` int32 (floor/ceil ranks). Returns `[1, 4]` int32
    `[bucket_f, bucket_c, below_f, below_c]`. The plane is tile-padded
    here with the sentinel.
    """
    plane = _pad_to_tile(plane, _SENT16)
    rows = plane.shape[0]
    out = pl.pallas_call(
        _make_bisect16_pair_kernel(rows, _row_chunk(rows)),
        in_specs=[
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 4), jnp.int32),
        interpret=interpret,
        # the i16 plane (~9 MB for an 8x5-min bucket) is double-buffered
        # under vmap's batch grid dim; the 16 MB default scoped-vmem
        # limit OOMs — raise it (v5e VMEM is far larger)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=40 << 20),
    )(ks, plane)
    return out


@functools.partial(jax.jit, static_argnames=("q", "interpret"))
def masked_quantile_midpoint_radix(
    values: jnp.ndarray,
    mask: jnp.ndarray,
    q: float = 0.5,
    interpret: bool = False,
) -> jnp.ndarray:
    """Midpoint-interpolated masked quantile via the radix kernel.

    `values` is a 2-D f32 array (any tiling), `mask` bool of the same
    shape. Matches `masked_quantile_midpoint_all` exactly (+inf on an
    all-False mask).
    """
    from .reductions import _float_sort_key, _key_to_float

    assert values.ndim == 2, values.shape
    dtype = values.dtype
    keys = _float_sort_key(values)  # uint32
    keys = jnp.where(mask, keys, ~jnp.uint32(0))
    keys = jax.lax.optimization_barrier(keys)

    n = jnp.sum(mask.astype(jnp.int32))
    pos = (n - 1).astype(jnp.float32) * q
    ks = (
        jnp.maximum(jnp.floor(pos).astype(jnp.int32), 0),
        jnp.maximum(jnp.ceil(pos).astype(jnp.int32), 0),
    )

    prefixes = [jnp.uint32(0), jnp.uint32(0)]
    rem = list(ks)
    for level in range(4):
        shift = 24 - 8 * level
        byte = ((keys >> shift) & jnp.uint32(0xFF)).astype(jnp.int32)
        sb = (byte - 128).astype(jnp.int8)
        outs = []
        for s in range(2):
            if level == 0:
                member = mask
            else:
                hi_bits = keys >> jnp.uint32(shift + 8)
                member = mask & (hi_bits == prefixes[s])
            plane = _pad_to_tile(
                jnp.where(member, sb, jnp.int8(_SENT)), _SENT
            )
            plane = jax.lax.optimization_barrier(plane)
            outs.append(_bisect8(plane, rem[s], interpret=interpret))
        for s in range(2):
            bucket, below = outs[s]
            prefixes[s] = (prefixes[s] << jnp.uint32(8)) | bucket.astype(
                jnp.uint32
            )
            rem[s] = rem[s] - below

    v1 = _key_to_float(prefixes[0], dtype)
    v2 = _key_to_float(prefixes[1], dtype)
    mid = (v1 + v2) * jnp.asarray(0.5, dtype)
    return jnp.where(n > 0, mid, jnp.asarray(jnp.inf, dtype))
