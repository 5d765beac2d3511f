"""Pallas TPU kernel: fused framing + window + DFT magnitudes.

The XLA path materializes the strided frames `[n_frames, W]` in HBM (4x
data amplification at 75% overlap) and reads them back twice (cos and
sin matmuls). This kernel reads the signal essentially once: the signal
is pre-sliced (still on the XLA side, cheap contiguous copies) into one
modest slab per 256-frame block — consecutive slabs only duplicate the
`window - hop` tail samples, ~1.6% — and each slab is DMA'd to VMEM
once by the standard BlockSpec pipeline, where the whole
frame/window/DFT/magnitude computation happens in-core:

    out[f, b] = |sum_c (slab[f + c] * win_c) @ twiddle_c|

with `width = hop` lanes per slab row, frame `f`'s c-th chunk is exactly
slab row `f + c` — purely static slicing, no per-frame gather, no
unaligned vector loads, and (crucially for the axon/libtpu stack, which
faults on grid>1 kernels with program_id-dependent manual DMA offsets)
**no manual DMA at all**.

Covers the 512/128 timbral and 512/256 tempo pipelines; the chroma
8192/2205 framing (hop not lane-aligned) stays on the XLA path.

Measured on TPU v5e via the axon tunnel (tmp/probe_pallas_slab.py,
warm): 5-min song, 512/128: 3.6 ms vs 120.6 ms XLA (33x); 512/256:
2.4 ms vs 36.3 ms (15x); max rel err vs the XLA matmul-DFT 2.6e-7.
Under jax.vmap (the [B, T] batch-of-songs path) the kernel picks up a
leading grid dimension automatically.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LANES = 128
_FBLOCK = 256  # frames per grid step


def supported(window: int, hop: int) -> bool:
    """Lane-aligned hop (slab rows = hops) and window a multiple of it."""
    return (
        hop % _LANES == 0
        and window % hop == 0
        # twiddles (2 x [W, ~W/2+pad] f32) must fit VMEM comfortably
        and window <= 1024
    )


def _make_kernel(window: int, width: int, fblock: int, nb: int):
    chunks = window // width

    def kernel(slab_ref, cos_ref, sin_ref, win_ref, out_ref):
        re = jnp.zeros((fblock, nb), jnp.float32)
        im = jnp.zeros((fblock, nb), jnp.float32)
        for c in range(chunks):
            rows = slab_ref[0, c : c + fblock, :]  # [fblock, width]
            piece = rows * win_ref[0:1, c * width : (c + 1) * width]
            dn = (((1,), (0,)), ((), ()))
            re += jax.lax.dot_general(
                piece, cos_ref[c * width : (c + 1) * width, :],
                dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            im += jax.lax.dot_general(
                piece, sin_ref[c * width : (c + 1) * width, :],
                dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        out_ref[:, :] = jnp.sqrt(re * re + im * im)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("window", "hop", "n_frames", "n_bins")
)
def pallas_frame_dft_mags(
    signal: jnp.ndarray,
    window: int,
    hop: int,
    n_frames: int,
    n_bins: int | None = None,
) -> jnp.ndarray:
    """|DFT| of hann-windowed strided frames of `signal`.

    Frame f covers `signal[f*hop : f*hop + window]`; the caller prepends
    any offset/reflection padding (cheap concats). Returns
    `[n_frames, n_bins]` f32. Requires `supported(window, hop)`.
    """
    from .windows import hann_periodic

    assert supported(window, hop), (window, hop)
    if n_bins is None:
        n_bins = window // 2 + 1
    width = hop
    chunks = window // width
    fblock = _FBLOCK
    nf_pad = -(-n_frames // fblock) * fblock
    nb_pad = -(-n_bins // _LANES) * _LANES

    # twiddles with integer-exact phase (see ops.dft)
    n = jax.lax.broadcasted_iota(jnp.int32, (window, nb_pad), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (window, nb_pad), 1)
    theta = ((n * k) % window).astype(jnp.float32) * (2.0 * math.pi / window)
    cos_m = jnp.cos(theta)
    sin_m = -jnp.sin(theta)

    need = (nf_pad + chunks - 1) * width
    t = signal.shape[-1]
    if t < need:
        signal = jnp.pad(signal, (0, need - t))
    sig2d = signal[:need].reshape(-1, width)
    n_blocks = nf_pad // fblock
    slab_rows = fblock + chunks - 1
    slabs = jax.vmap(
        lambda i: jax.lax.dynamic_slice(
            sig2d, (i * fblock, jnp.int32(0)), (slab_rows, width)
        )
    )(jnp.arange(n_blocks, dtype=jnp.int32))

    out = pl.pallas_call(
        _make_kernel(window, width, fblock, nb_pad),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, slab_rows, width), lambda f: (f, 0, 0)),
            pl.BlockSpec((window, nb_pad), lambda f: (0, 0)),
            pl.BlockSpec((window, nb_pad), lambda f: (0, 0)),
            pl.BlockSpec((1, window), lambda f: (0, 0)),
        ],
        out_specs=pl.BlockSpec((fblock, nb_pad), lambda f: (f, 0)),
        out_shape=jax.ShapeDtypeStruct((nf_pad, nb_pad), jnp.float32),
    )(slabs, cos_m, sin_m, hann_periodic(window).reshape(1, window))
    return out[:n_frames, :n_bins]
