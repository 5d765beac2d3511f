"""Pallas TPU kernel: small-cardinality histogram of an int32 plane.

The tuning estimator needs a 100-bin histogram over the ~[1430, 3360]
pip_track index plane (src/chroma.rs:334-359). A scatter-add is
pathological on TPU; the XLA compare-and-reduce workaround
(`sum(idx[..., None] == iota(100))`, models/chroma.py) is correct but
memory-bound: XLA materializes/sweeps the plane per comparison group
(measured ~8 ms inside the tuning stage per 8x5-min batch). This kernel
reads the plane ONCE into VMEM and does all 100 comparisons in-core,
emitting one [8, 128] partial-count tile per grid block; the caller sums
the tiny partials.

Counts are exact: accumulation is f32 (< 2^24 elements per block) and
the cross-block sum is integer-valued f32 (exact up to 2^24 total).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_ROW_BLOCK = 256
#: VMEM budget per input block (bytes). Blocks are double-buffered
#: under the grid (and vmap prepends a batch grid dim), so the limit
#: seen by the compiler is ~2x this plus the [8, 128] out tile; 6 MB
#: keeps long-song planes (cols scales with frames — 13316 for the
#: 21-min medley bucket, which OOMed the default 16 MB scoped-vmem
#: limit at rb=256) well inside it. Exactness is unaffected: partial
#: counts are integer-valued f32, any block grouping sums exactly.
_BLOCK_BYTES = 6 << 20


def _row_block(cols: int, bytes_per_elem: int) -> int:
    """Largest multiple-of-8 row block (<= _ROW_BLOCK) whose input
    block(s) fit the VMEM budget; at least 8 rows."""
    rb = _BLOCK_BYTES // max(1, cols * bytes_per_elem)
    return max(8, min(_ROW_BLOCK, (rb // 8) * 8))


def _make_kernel(n_bins: int, cols: int):
    def kernel(idx_ref, out_ref):
        idx = idx_ref[:, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        # per-bin masked counts; bins live on lanes of one output row
        row = jnp.zeros((1, _LANES), jnp.float32)
        for b in range(n_bins):
            cnt = jnp.sum((idx == b).astype(jnp.float32))
            row = row + jnp.where(lane == b, cnt, 0.0)
        out_ref[:, :] = jnp.broadcast_to(row, (8, _LANES)) * jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 0) == 0,
            1.0,
            0.0,
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("n_bins",))
def histogram_int_plane(idx: jnp.ndarray, n_bins: int) -> jnp.ndarray:
    """Counts of `idx == b` for b in [0, n_bins) over an int32 array.

    `n_bins` must be <= 128 (bins live on lanes). Values outside
    [0, n_bins) are ignored (the caller uses `n_bins` as the masked-out
    sentinel). Returns `[n_bins]` int32.
    """
    assert n_bins <= _LANES, n_bins
    if idx.ndim == 1:
        idx = idx.reshape(1, -1)
    if idx.ndim > 2:
        idx = idx.reshape(-1, idx.shape[-1])
    rows, cols = idx.shape
    rb = min(_row_block(cols, 4), -(-rows // 8) * 8)
    rpad = -(-rows // rb) * rb
    if rpad != rows:
        idx = jnp.pad(idx, ((0, rpad - rows), (0, 0)), constant_values=-1)
    n_blocks = rpad // rb

    partials = pl.pallas_call(
        _make_kernel(n_bins, cols),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((rb, cols), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((8, _LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_blocks * 8, _LANES), jnp.float32),
    )(idx)
    return jnp.sum(partials, axis=0)[:n_bins].astype(jnp.int32)


def _make_threshold_kernel(n_bins: int):
    def kernel(tk_ref, idx_ref, key_ref, out_ref):
        # int8 bins widen to f32 (the supported dequantize pattern;
        # 0..127 exact); the key gate is a native i32 compare
        idx = idx_ref[:, :].astype(jnp.float32)
        ge = (key_ref[:, :] >= tk_ref[0, 0]).astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        row = jnp.zeros((1, _LANES), jnp.float32)
        for b in range(n_bins):
            cnt = jnp.sum(jnp.where(idx == float(b), ge, 0.0))
            row = row + jnp.where(lane == b, cnt, 0.0)
        out_ref[:, :] = jnp.broadcast_to(row, (8, _LANES)) * jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 0) == 0,
            1.0,
            0.0,
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("n_bins", "interpret"))
def histogram_threshold_plane(
    idx8: jnp.ndarray,
    skey: jnp.ndarray,
    tk: jnp.ndarray,
    n_bins: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Counts of `(idx8 == b) & (skey >= tk)` for b in [0, n_bins).

    The fused tuning estimator's final pass (models/chroma.py): `idx8`
    is the int8 tuning-bin plane (sentinel >= n_bins for non-peaks),
    `skey` the signed-shifted f32 sort keys (order-isomorphic i32), and
    `tk` the `[1, 1]` i32 threshold key of the median magnitude — one
    read of both planes replaces a select + separate histogram. Returns
    `[n_bins]` int32 exact counts.
    """
    assert n_bins <= _LANES, n_bins
    assert idx8.shape == skey.shape and idx8.ndim == 2
    rows, cols = idx8.shape
    # idx8 (1 B) + skey (4 B) planes share the block's VMEM footprint
    rb = min(_row_block(cols, 5), -(-rows // 8) * 8)
    rpad = -(-rows // rb) * rb
    if rpad != rows:
        idx8 = jnp.pad(idx8, ((0, rpad - rows), (0, 0)), constant_values=-1)
        skey = jnp.pad(skey, ((0, rpad - rows), (0, 0)))
    n_blocks = rpad // rb

    partials = pl.pallas_call(
        _make_threshold_kernel(n_bins),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((rb, cols), lambda i: (i, 0)),
            pl.BlockSpec((rb, cols), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((8, _LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_blocks * 8, _LANES), jnp.float32),
        interpret=interpret,
    )(tk, idx8, skey)
    return jnp.sum(partials, axis=0)[:n_bins].astype(jnp.int32)
