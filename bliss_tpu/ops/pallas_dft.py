"""Pallas TPU kernel: fused framing + window + DFT magnitudes.

The XLA path materializes the strided frames `[n_frames, W]` in HBM (4x
data amplification at 75% overlap) before the DFT matmul reads them back.
This kernel keeps the signal in HBM and DMAs each frame block's
contiguous signal slab into VMEM once — the overlapping samples never
round-trip through HBM.

The framing itself costs nothing: with `hop % 128 == 0` the slab viewed
as `[rows, 128]` makes frame `i`'s c-th 128-sample chunk exactly row
`i*(hop/128) + c`, so the windowed-frame DFT

    out[i, b] = sum_c (slab2d[i*rpf + c] * win_c) @ twiddle_c

is `W/128` *statically-sliced* `[FB, 128] @ [128, BB]` MXU matmuls — no
per-frame gather, no unaligned vector loads (which Mosaic rejects).

Covers the 512/128 timbral and 512/256 tempo pipelines; the chroma
8192/2205 framing (hop not lane-aligned) stays on the XLA path.

STATUS: experimental — validated in interpreter mode (abs err ~1.4e-6
vs rfft), but the current axon/libtpu stack faults the TPU worker on
ANY kernel combining grid > 1 with a `program_id`-dependent manual DMA
source offset (minimal repro: a 2-step grid DMA-ing
`sig_ref.at[pl.ds(fb*256, 260)]` into scratch; a 1-step grid of the
identical kernel runs fine). Until that is fixed upstream, the
production paths keep the XLA matmul-DFT (which is within ~2x of this
kernel's modeled gain — the frame materialization it avoids is ~0.1 s
per 8-song batch).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_FRAME_BLOCK = 256
_BIN_BLOCK = 256


def supported(window: int, hop: int) -> bool:
    return window % _LANES == 0 and hop % _LANES == 0 and hop <= window


def _make_kernel(window: int, hop: int, fblock: int):
    rpf = hop // _LANES  # slab rows per frame step
    chunks = window // _LANES
    slab_rows = fblock * rpf + chunks

    def kernel(sig_ref, cos_ref, sin_ref, win_ref, out_ref, slab, sem):
        fb = pl.program_id(0)

        @pl.when(pl.program_id(1) == 0)
        def _():
            start = fb * (fblock * rpf)  # in slab-row units
            dma = pltpu.make_async_copy(
                sig_ref.at[pl.ds(start, slab_rows)], slab, sem
            )
            dma.start()
            dma.wait()

        bb = cos_ref.shape[1]
        re = jnp.zeros((fblock, bb), jnp.float32)
        im = jnp.zeros((fblock, bb), jnp.float32)
        for c in range(chunks):
            rows = slab[c : c + fblock * rpf : rpf, :]  # [fblock, 128]
            # keep everything 2-D: 1-D VMEM vectors miscompile on TPU
            piece = rows * win_ref[0:1, c * _LANES : (c + 1) * _LANES]
            dn = (((1,), (0,)), ((), ()))
            re += jax.lax.dot_general(
                piece, cos_ref[c * _LANES : (c + 1) * _LANES, :],
                dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
            im += jax.lax.dot_general(
                piece, sin_ref[c * _LANES : (c + 1) * _LANES, :],
                dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
        out_ref[:, :] = jnp.sqrt(re * re + im * im)

    return kernel, slab_rows


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
    fblock, bblock = _FRAME_BLOCK, _BIN_BLOCK
    nb_pad = -(-n_bins // bblock) * bblock
    nf_pad = -(-n_frames // fblock) * fblock
    rpf = hop // _LANES

    # twiddles with integer-exact phase (see ops.dft)
    n = jax.lax.broadcasted_iota(jnp.int32, (window, nb_pad), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (window, nb_pad), 1)
    phase = (n * k) % window
    theta = phase.astype(jnp.float32) * (2.0 * math.pi / window)
    cos_m = jnp.cos(theta)
    sin_m = -jnp.sin(theta)

    need = nf_pad * hop + window
    if signal.shape[-1] < need:
        signal = jnp.pad(signal, (0, need - signal.shape[-1]))
    else:
        signal = signal[:need]
    sig2d = signal.reshape(-1, _LANES)

    kernel, slab_rows = _make_kernel(window, hop, fblock)
    grid = (nf_pad // fblock, nb_pad // bblock)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # signal stays in HBM
            pl.BlockSpec(
                (window, bblock), lambda f, b: (0, b), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (window, bblock), lambda f, b: (0, b), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hann window [1, W]
        ],
        out_specs=pl.BlockSpec(
            (fblock, bblock), lambda f, b: (f, b), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nf_pad, nb_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((slab_rows, _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(sig2d, cos_m, sin_m, hann_periodic(window).reshape(1, window))
    return out[:n_frames, :n_bins]
