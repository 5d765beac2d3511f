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


def _make_timbral_kernel(window: int, width: int, fblock: int, nb: int):
    """Slab DFT + the three spectral descriptors, fused in VMEM.

    Emits per-frame raw reductions (total, weighted-by-bin, rolloff
    'below' count, log2-sum, arithmetic sum) over the buggy 256-bin
    layout instead of the [F, 256] magnitudes — the descriptor stage's
    HBM traffic drops from ~470 MB of mags (written once, re-read by
    cumsum/log2/sum passes) to a [F, 128] row of scalars.

    The twiddle matrices arrive already in the aubio overflow layout
    (src/aubio.rs:237-261): `nb == window//2` columns where column
    half-1 carries the *Nyquist* phase — exactly 2x128 lanes for W=512
    instead of padding half+1 bins to 3x128 (1/3 less MXU work).

    Known TPU-only tolerance (advisor r3): the rolloff cumsum below is a
    Hillis-Steele ladder whose f32 summation order differs from XLA's
    cumsum, so the `below` count can differ by one bin from the unfused
    path when a bin sits exactly on the 95%-energy threshold. This is
    input-sensitive tie behavior off the golden path (CPU keeps the
    unfused f64 pipeline) — do not chase it as a parity bug; the
    interpret-mode test asserts `atol=1` on `below` for this reason.
    """
    chunks = window // width
    half = window // 2  # buggy layout: bins 0..half-2 ++ Nyquist

    def kernel(slab_ref, cos_ref, sin_ref, win_ref, out_ref):
        # Neumaier-compensated accumulation across the `chunks` partial
        # dots: the flatness descriptor reads near-noise-floor bins of
        # quiet frames, where the f32 accumulation error of an effective
        # K=window dot is the dominant drift term of the whole corpus
        # audit (the mp3 golden fixture's 1.1e-4, PERF §26). Compensating
        # the cross-chunk sums keeps the error at the in-dot K=width
        # level — ~5 extra VPU ops per chunk, no MXU cost.
        re = jnp.zeros((fblock, nb), jnp.float32)
        im = jnp.zeros((fblock, nb), jnp.float32)
        re_c = jnp.zeros((fblock, nb), jnp.float32)
        im_c = jnp.zeros((fblock, nb), jnp.float32)

        def comp_add(s, c_, p):
            t = s + p
            c_ = c_ + jnp.where(
                jnp.abs(s) >= jnp.abs(p), (s - t) + p, (p - t) + s
            )
            return t, c_

        for c in range(chunks):
            rows = slab_ref[0, c : c + fblock, :]
            piece = rows * win_ref[0:1, c * width : (c + 1) * width]
            dn = (((1,), (0,)), ((), ()))
            pre = jax.lax.dot_general(
                piece, cos_ref[c * width : (c + 1) * width, :],
                dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            pim = jax.lax.dot_general(
                piece, sin_ref[c * width : (c + 1) * width, :],
                dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            re, re_c = comp_add(re, re_c, pre)
            im, im_c = comp_add(im, im_c, pim)
        re = re + re_c
        im = im + im_c
        mags = jnp.sqrt(re * re + im * im)  # [fblock, half] buggy layout

        bins = jax.lax.broadcasted_iota(jnp.int32, (fblock, half), 1).astype(
            jnp.float32
        )
        total = jnp.sum(mags, axis=1)
        weighted = jnp.sum(mags * bins, axis=1)
        sq = mags * mags
        # inclusive scan via Hillis-Steele log-shifts (Mosaic has no
        # cumsum lowering; XLA's TPU cumsum lowers to the same shifted
        # add ladder, just through HBM instead of VMEM)
        cumsum = sq
        shift = 1
        while shift < half:
            z = jnp.zeros((fblock, shift), jnp.float32)
            cumsum = cumsum + jnp.concatenate(
                [z, cumsum[:, : half - shift]], axis=1
            )
            shift *= 2
        energy = cumsum[:, half - 1]
        target = energy * jnp.float32(0.95)
        below = jnp.sum(
            (cumsum < target[:, None]).astype(jnp.float32), axis=1
        )
        logs = jnp.log2(mags)
        logsum = jnp.sum(logs, axis=1)

        out_ref[:, :] = jnp.concatenate(
            [
                total[:, None],
                weighted[:, None],
                below[:, None],
                logsum[:, None],
                energy[:, None],
                jnp.zeros((fblock, 123), jnp.float32),
            ],
            axis=1,
        )

    return kernel


def _rev7(x: int) -> int:
    b = 0
    for _ in range(7):
        b = (b << 1) | (x & 1)
        x >>= 1
    return b


def _make_timbral_fft_kernel(window: int, width: int, fblock: int):
    """Timbral descriptors from an FFT-STRUCTURED spectrum.

    Why not the matmul-DFT: the reference pipeline's magnitudes come
    from an f32 FFT (aubio hanningz + f32 FFT, src/utils.rs:26-64 /
    src/aubio.rs:237-261), whose per-stage f32 roundings bias the
    flatness of real-world quiet material by ~1e-4 relative to exact
    arithmetic. A near-exact transform (matmul-DFT at HIGHEST, measured
    1.7e-7 of f64) therefore sits ~1.1e-4 from the reference value —
    OVER the ≤1e-4 corpus contract — while any true radix-2 f32 FFT
    lands ~2e-5 from it (same rounding statistics; measured for XLA's
    FFT, numpy's pocketfft and this kernel's exact arithmetic,
    tmp/probe_difroll.py → PERF r4).

    Structure (W=512): radix-4 across the 4 hop-width chunks (exact
    adds/subs), per-plane twiddle, then a 7-stage DIF radix-2 over the
    128 lanes via paired `pltpu.roll`s — output bins arrive in
    bit-reversed lane order, which only permutes CONSTANTS: per-plane
    bin masks/weights bake the buggy-256 layout, and the rolloff's
    ordered cumulative energy is recovered with one permuted-triangular
    [128,128] matmul + running per-plane adds. Emits the same
    `[F, 5]` raw rows as `_make_timbral_kernel`.
    """
    from jax.experimental.pallas import tpu as pltpu

    assert window == 512 and width == 128, (window, width)
    rev = [_rev7(i) for i in range(128)]

    def kernel(slab_ref, consts_ref, pt_ref, win_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

        w = []
        for c in range(4):
            rows = slab_ref[0, c : c + fblock, :]
            w.append(rows * win_ref[0:1, c * width : (c + 1) * width])
        # radix-4 across chunks: plane q holds A_q = sum_c w_c W_4^{cq}
        planes = [
            (w[0] + w[1] + w[2] + w[3], None),
            (w[0] - w[2], -(w[1] - w[3])),
            (w[0] - w[1] + w[2] - w[3], None),
            (w[0] - w[2], (w[1] - w[3])),
        ]

        dn = (((1,), (0,)), ((), ()))
        mags = []
        for q in range(3):
            are, aim = planes[q]
            # plane twiddle W_512^{n1 q} (consts rows 0..7: tc/ts per q)
            tc = consts_ref[2 * q : 2 * q + 1, :]
            ts = consts_ref[2 * q + 1 : 2 * q + 2, :]
            if aim is None:
                re = are * tc
                im = are * ts
            else:
                re = are * tc - aim * ts
                im = aim * tc + are * ts
            # 7-stage DIF radix-2 over lanes (rows 8..21: wc/ws per stage)
            for s, m in enumerate((128, 64, 32, 16, 8, 4, 2)):
                hm = m // 2
                topm = (lane % m) < hm
                wc = consts_ref[8 + 2 * s : 9 + 2 * s, :]
                ws = consts_ref[9 + 2 * s : 10 + 2 * s, :]
                pre = jnp.where(
                    topm,
                    pltpu.roll(re, shift=128 - hm, axis=1),
                    pltpu.roll(re, shift=hm, axis=1),
                )
                pim = jnp.where(
                    topm,
                    pltpu.roll(im, shift=128 - hm, axis=1),
                    pltpu.roll(im, shift=hm, axis=1),
                )
                sre, sim = re + pre, im + pim
                dre, dim = pre - re, pim - im
                re = jnp.where(topm, sre, dre * wc - dim * ws)
                im = jnp.where(topm, sim, dre * ws + dim * wc)
            mags.append(jnp.sqrt(re * re + im * im))

        # plane 3 is the rfft mirror of plane 1: for a real frame
        # |X[3+4·rev(L)]| = |X[512−(3+4·rev(L))]| = |X[1+4·rev(127−L)]|
        # (complement commutes with bit reversal), i.e. mags3 is mags1
        # lane-REVERSED. One 0/1 permutation matmul (HIGHEST f32 dots
        # reconstruct f32 exactly from the bf16 splits) replaces the
        # whole plane-3 twiddle + 7-stage ladder; the mirrored values
        # carry plane 1's genuine per-stage f32-FFT roundings, staying
        # in the reference's noise class (see docstring).
        ri = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
        rj = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)
        rmat = (ri + rj == _LANES - 1).astype(jnp.float32)
        mags.append(
            jax.lax.dot_general(
                mags[1], rmat, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        )

        # descriptor reductions with bit-rev-aware constants
        # (consts rows 22..29: mask_q, weight_q interleaved)
        total = jnp.zeros((fblock,), jnp.float32)
        weighted = jnp.zeros((fblock,), jnp.float32)
        logsum = jnp.zeros((fblock,), jnp.float32)
        energy = jnp.zeros((fblock,), jnp.float32)
        sqs = []
        for q in range(4):
            mask = consts_ref[22 + 2 * q : 23 + 2 * q, :]
            wgt = consts_ref[23 + 2 * q : 24 + 2 * q, :]
            mq = mags[q]
            total = total + jnp.sum(mq * mask, axis=1)
            weighted = weighted + jnp.sum(mq * wgt, axis=1)
            logsum = logsum + jnp.sum(
                jnp.where(mask > 0, jnp.log2(mq), 0.0), axis=1
            )
            sq = mq * mq * mask
            sqs.append(sq)
            energy = energy + jnp.sum(sq, axis=1)

        s_all = sqs[0] + sqs[1] + sqs[2] + sqs[3]
        e_excl = jax.lax.dot_general(
            s_all, pt_ref[:, :], dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        target = energy * jnp.float32(0.95)
        below = jnp.zeros((fblock,), jnp.float32)
        run = e_excl
        for q in range(4):
            mask = consts_ref[22 + 2 * q : 23 + 2 * q, :]
            run = run + sqs[q]
            below = below + jnp.sum(
                jnp.where(
                    mask > 0,
                    (run < target[:, None]).astype(jnp.float32),
                    0.0,
                ),
                axis=1,
            )

        out_lane = jax.lax.broadcasted_iota(jnp.int32, (fblock, 128), 1)
        out_ref[:, :] = jnp.where(
            out_lane == 0,
            total[:, None],
            jnp.where(
                out_lane == 1,
                weighted[:, None],
                jnp.where(
                    out_lane == 2,
                    below[:, None],
                    jnp.where(
                        out_lane == 3,
                        logsum[:, None],
                        jnp.where(out_lane == 4, energy[:, None], 0.0),
                    ),
                ),
            ),
        )

    return kernel


def _timbral_fft_consts():
    """[32, 128] constant rows + the [128,128] permuted-triangular
    prefix matrix for `_make_timbral_fft_kernel` (f32, host-exact)."""
    import numpy as np

    rev = np.array([_rev7(i) for i in range(128)], np.int32)
    rows = np.zeros((32, 128), np.float32)
    n1 = np.arange(128)
    for q in range(4):
        th = (n1 * q) % 512 * (2.0 * np.pi / 512.0)
        rows[2 * q] = np.cos(th)
        rows[2 * q + 1] = -np.sin(th)
    for s, m in enumerate((128, 64, 32, 16, 8, 4, 2)):
        hm = m // 2
        j = np.maximum(n1 % m - hm, 0)
        rows[8 + 2 * s] = np.cos(j * 2.0 * np.pi / m)
        rows[9 + 2 * s] = -np.sin(j * 2.0 * np.pi / m)
    for q in range(4):
        b = q + 4 * rev  # bin id at lane L
        keep = (b <= 254) | (b == 256)
        rows[22 + 2 * q] = keep.astype(np.float32)
        rows[23 + 2 * q] = np.where(
            keep, np.where(b == 256, 255, b), 0
        ).astype(np.float32)
    pt = (rev[:, None] < rev[None, :]).astype(np.float32)
    return rows, pt


def _timbral_fft() -> bool:
    """FFT-structured timbral kernel (the accuracy-contract default for
    512/128 — see `_make_timbral_fft_kernel`). BLISS_TIMBRAL_FFT=0
    reverts to the flat matmul-DFT kernel."""
    import os

    return os.environ.get("BLISS_TIMBRAL_FFT", "1") != "0"


def pallas_frame_dft_timbral(
    signal: jnp.ndarray, window: int, hop: int, n_frames: int
) -> jnp.ndarray:
    """Fused slab framing + spectral descriptor reductions.

    Returns `[n_frames, 5]` f32 rows `(total, weighted, below, logsum,
    energy)` over the buggy-256 layout. Frame f covers
    `signal[f*hop : f*hop + window]` (caller prepends offset padding).
    The spectrum comes from the FFT-structured kernel by default
    (matching the reference's f32-FFT noise statistics — the corpus
    flatness contract); `BLISS_TIMBRAL_FFT=0` selects the flat
    matmul-DFT kernel.
    """
    use_fft = _timbral_fft() and window == 512 and hop == 128
    return _pallas_frame_dft_timbral_impl(
        signal, window, hop, n_frames, use_fft
    )


@functools.partial(
    jax.jit, static_argnames=("window", "hop", "n_frames", "use_fft")
)
def _pallas_frame_dft_timbral_impl(
    signal: jnp.ndarray, window: int, hop: int, n_frames: int, use_fft: bool
) -> jnp.ndarray:
    import numpy as np

    from .windows import hann_periodic

    assert supported(window, hop), (window, hop)
    width = hop
    chunks = window // width
    fblock = _FBLOCK
    nf_pad = -(-n_frames // fblock) * fblock
    half = window // 2
    assert half % _LANES == 0, window  # buggy layout is lane-exact
    nb_pad = half

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

    if use_fft:
        rows, pt = _timbral_fft_consts()
        out = pl.pallas_call(
            _make_timbral_fft_kernel(window, width, fblock),
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((1, slab_rows, width), lambda f: (f, 0, 0)),
                pl.BlockSpec((32, 128), lambda f: (0, 0)),
                pl.BlockSpec((128, 128), lambda f: (0, 0)),
                pl.BlockSpec((1, window), lambda f: (0, 0)),
            ],
            out_specs=pl.BlockSpec((fblock, 128), lambda f: (f, 0)),
            out_shape=jax.ShapeDtypeStruct((nf_pad, 128), jnp.float32),
        )(
            slabs,
            jnp.asarray(rows),
            jnp.asarray(pt),
            hann_periodic(window).reshape(1, window),
        )
        return out[:n_frames, :5]

    # twiddles directly in the buggy overflow layout: column half-1
    # carries bin `half` (the Nyquist) — see _make_timbral_kernel
    n = jax.lax.broadcasted_iota(jnp.int32, (window, nb_pad), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (window, nb_pad), 1)
    k = jnp.where(k == half - 1, half, k)
    theta = ((n * k) % window).astype(jnp.float32) * (2.0 * math.pi / window)
    cos_m = jnp.cos(theta)
    sin_m = -jnp.sin(theta)

    out = pl.pallas_call(
        _make_timbral_kernel(window, width, fblock, nb_pad),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, slab_rows, width), lambda f: (f, 0, 0)),
            pl.BlockSpec((window, nb_pad), lambda f: (0, 0)),
            pl.BlockSpec((window, nb_pad), lambda f: (0, 0)),
            pl.BlockSpec((1, window), lambda f: (0, 0)),
        ],
        out_specs=pl.BlockSpec((fblock, 128), lambda f: (f, 0)),
        out_shape=jax.ShapeDtypeStruct((nf_pad, 128), jnp.float32),
    )(slabs, cos_m, sin_m, hann_periodic(window).reshape(1, window))
    return out[:n_frames, :5]


def _specflux_b16x3() -> bool:
    """3-pass bf16x3 dots for the SpecFlux DFT (vs HIGHEST's 6 passes).
    The onset function feeds a thresholded peak picker and a MEDIAN of
    quantized beat periods — the ~2^-16 relative magnitude noise either
    leaves the BPM bit-identical or flips it by a whole discrete step
    (which the corpus drift contract would catch loudly). Measured
    identical tempo features on the fixture corpus; BLISS_SPECFLUX_PREC
    =highest restores the 6-pass dots."""
    import os

    return os.environ.get("BLISS_SPECFLUX_PREC", "b16x3") != "highest"


def _make_specflux_kernel(
    window: int, width: int, fblock: int, nb: int, b16x3: bool
):
    """Slab DFT + SpecFlux onset, fused in VMEM.

    Computes magnitudes for `fblock + 1` frames per block (one lookback
    frame for the cross-block previous-frame difference) and emits per
    frame `(flux, total)` where flux = sum_bins max(m[h] - m[h-1], 0)
    (SpecFlux, reference src/aubio.rs:432-468) and total = sum_bins m[h].
    The caller replaces flux[0] with total[0] (aubio's first frame diffs
    against zeros, which the slab's lookback pseudo-frame is not).
    """
    chunks = window // width
    half = window // 2  # DFT matmul covers bins 0..half-1 (lane-exact)

    def kernel(slab_ref, cos_ref, sin_ref, win_ref, out_ref):
        dn = (((1,), (0,)), ((), ()))

        def dot3(ah, al, bh, bl):
            d = functools.partial(
                jax.lax.dot_general, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
            return d(ah, bh) + (d(ah, bl) + d(al, bh))

        re = jnp.zeros((fblock + 1, nb), jnp.float32)
        im = jnp.zeros((fblock + 1, nb), jnp.float32)
        nyq = jnp.zeros((fblock + 1,), jnp.float32)
        for c in range(chunks):
            rows = slab_ref[0, c : c + fblock + 1, :]
            piece = rows * win_ref[0:1, c * width : (c + 1) * width]
            if b16x3:
                ph, pl_ = _split_bf16(piece)
                ch_, cl_ = _split_bf16(
                    cos_ref[c * width : (c + 1) * width, :]
                )
                sh_, sl_ = _split_bf16(
                    sin_ref[c * width : (c + 1) * width, :]
                )
                re += dot3(ph, pl_, ch_, cl_)
                im += dot3(ph, pl_, sh_, sl_)
            else:
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
            # Nyquist bin on the VPU: X_{W/2} = sum_n x[n] (-1)^n (real),
            # so the bin-count stays at `half` = exact lanes instead of
            # padding half+1 up to the next 128 multiple (1/3 less MXU)
            sgn = 1.0 - 2.0 * (
                jax.lax.broadcasted_iota(
                    jnp.int32, (1, width), 1
                ) % 2
            ).astype(jnp.float32)
            nyq += jnp.sum(piece * sgn, axis=1)
        mags = jnp.sqrt(re * re + im * im)  # [fblock+1, half]
        nyq_mag = jnp.abs(nyq)  # [fblock+1]
        diff = mags[1:, :] - mags[:-1, :]
        flux = jnp.sum(jnp.maximum(diff, 0.0), axis=1) + jnp.maximum(
            nyq_mag[1:] - nyq_mag[:-1], 0.0
        )
        total = jnp.sum(mags[1:, :], axis=1) + nyq_mag[1:]
        # lane-select instead of concatenate: Mosaic's tpu.concatenate
        # chokes on mixed (N,1)/(N,126) column layouts ("result/input
        # offset mismatch on non-concat dimension")
        out_lane = jax.lax.broadcasted_iota(jnp.int32, (fblock, 128), 1)
        out_ref[:, :] = jnp.where(
            out_lane == 0,
            flux[:, None],
            jnp.where(out_lane == 1, total[:, None], 0.0),
        )

    return kernel


def pallas_frame_dft_specflux(
    signal: jnp.ndarray, window: int, hop: int, n_frames: int
) -> jnp.ndarray:
    """SpecFlux onset function of hann-windowed strided frames.

    Frame f covers `signal[f*hop : f*hop + window]` (caller prepends any
    offset padding). Returns `[n_frames]` f32 onset values matching
    `onset_function(pvoc_mags(frames))` — the magnitudes never leave
    VMEM. Env-default precision is resolved here, outside the jit cache
    key (see _specflux_b16x3)."""
    return _pallas_frame_dft_specflux_impl(
        signal, window, hop, n_frames, _specflux_b16x3()
    )


@functools.partial(
    jax.jit, static_argnames=("window", "hop", "n_frames", "b16x3")
)
def _pallas_frame_dft_specflux_impl(
    signal: jnp.ndarray, window: int, hop: int, n_frames: int, b16x3: bool
) -> jnp.ndarray:
    from .windows import hann_periodic

    assert supported(window, hop), (window, hop)
    width = hop
    chunks = window // width
    fblock = _FBLOCK
    nf_pad = -(-n_frames // fblock) * fblock
    half = window // 2
    assert half % _LANES == 0, window
    nb_pad = half  # bins 0..half-1; the kernel adds the Nyquist on VPU

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
    # one zero lookback row: kernel row r = global sample row r - 1, so
    # each block carries its previous frame for the flux difference
    sig2d = jnp.concatenate(
        [jnp.zeros((1, width), signal.dtype), sig2d], axis=0
    )
    n_blocks = nf_pad // fblock
    slab_rows = fblock + chunks
    slabs = jax.vmap(
        lambda i: jax.lax.dynamic_slice(
            sig2d, (i * fblock, jnp.int32(0)), (slab_rows, width)
        )
    )(jnp.arange(n_blocks, dtype=jnp.int32))

    out = pl.pallas_call(
        _make_specflux_kernel(window, width, fblock, nb_pad, b16x3),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, slab_rows, width), lambda f: (f, 0, 0)),
            pl.BlockSpec((window, nb_pad), lambda f: (0, 0)),
            pl.BlockSpec((window, nb_pad), lambda f: (0, 0)),
            pl.BlockSpec((1, window), lambda f: (0, 0)),
        ],
        out_specs=pl.BlockSpec((fblock, 128), lambda f: (f, 0)),
        out_shape=jax.ShapeDtypeStruct((nf_pad, 128), jnp.float32),
    )(slabs, cos_m, sin_m, hann_periodic(window).reshape(1, window))
    flux = out[:n_frames, 0]
    total = out[:n_frames, 1]
    # first frame: aubio diffs against an all-zero previous frame, i.e.
    # onset[0] = sum(max(m[0], 0)) = total[0]
    return jnp.concatenate([total[:1], flux[1:]])


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


# --- fused Cooley-Tukey DFT for the big chroma window (8192/2205) ------------
#
# The hop (2205) is not lane-aligned, so the slab trick above does not
# apply; framing stays on the XLA side. What the kernel removes is the
# CT decomposition's intermediate HBM traffic: the XLA path (ops/dft.py
# _rdft_mags_ct) materializes six [F, 8192]-sized complex stage arrays
# (~10 GB round-trip per 8x5-min batch, measured ~27 ms); here every
# stage lives in VMEM and HBM sees only frames-in / magnitudes-out.
#
# Layout trick that makes every op a plain 2D matmul (Mosaic has no
# rank-3 contractions): with W = N2*128 (n = n2*128 + n1, n1 the lane
# dim; k = k2 + N2*k1), pre-transpose frames to [n2, F*128] outside.
# Then
#   inner   A = C2 @ xw            [N2, N2] x [N2, FB*128]
#   twiddle B = A * t (pre-tiled)  elementwise in [N2, FB*128]
#   outer   X = B' @ C1            [N2*FB, 128] x [128, 128]
# with only trailing/leading 128-aligned reshapes between stages.

def _ct_fblock() -> int:
    """Frames per grid step (VMEM: ~14 MB at W=8192, FB=32)."""
    import os

    return int(os.environ.get("BLISS_CT_FBLOCK", "32"))


def _ct_precision():
    """MXU precision for the CT stages. Mosaic lowers only DEFAULT and
    HIGHEST dots (Precision.HIGH raises NotImplementedError in
    _dot_general_lowering_rule); DEFAULT's single bf16 pass is far too
    coarse for the 1e-5 parity budget, so HIGHEST it is."""
    return jax.lax.Precision.HIGHEST


def _ct_b16x3() -> bool:
    """Use manual 3-pass bf16x3 dots (Precision.HIGH emulation) instead
    of HIGHEST's 6 passes in the CT kernel. Halves the kernel's MXU time
    (measured 8.25 ms vs ~15-20 ms per 8x5-min batch, PERF r4) at a
    measured ~1e-6 feature-level cost — still well inside the ≤1e-4
    corpus drift contract. BLISS_CT_PREC=highest restores 6-pass."""
    import os

    return os.environ.get("BLISS_CT_PREC", "b16x3") != "highest"


def _split_bf16(a):
    """f32 -> (hi, lo) bf16 pair with a + err == hi + lo (err ~ 2^-16)."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def supported_ct(window: int) -> bool:
    """Windows the fused CT kernel covers: W = N2*128, N2 in [8, 128]."""
    n2 = window // _LANES
    return window % _LANES == 0 and 8 <= n2 <= 128


def _make_ct_fused_kernel(n2: int, fblock: int, hop: int, b16x3: bool):
    """CT kernel with IN-KERNEL framing.

    The XLA framing pass (vmapped dynamic_slice over the reflect-padded
    signal) writes `window/hop`-amplified frames through HBM — measured
    10.6 ms per 8x5-min batch for the 8192/2205 chroma framing, with the
    kernel then re-reading the same 786 MB. Here each grid step DMAs one
    overlapping signal window (Element-indexed block whose 8-row-aligned
    start the index map computes; the sub-row residual arrives as a
    per-block scalar row) and extracts its `fblock` frames in VMEM: a
    dynamic sublane slice + a dynamic lane roll per frame — no per-frame
    HBM traffic at all. Measured 26.3 -> 12.5 ms for framing+DFT, output
    bit-identical to the XLA-framed kernel (the CT math is unchanged).
    """
    precision = _ct_precision()
    w = n2 * _LANES

    def kernel(r_ref, x_ref, c2_ref, s2_ref, tc_ref, ts_ref, c1_ref,
               s1_ref, win_ref, out_ref):
        from jax.experimental.pallas import tpu as pltpu

        dn = (((1,), (0,)), ((), ()))

        def dot(a, b):
            return jax.lax.dot_general(
                a, b, dimension_numbers=dn,
                preferred_element_type=jnp.float32, precision=precision,
            )

        def dot3(ah, al, bh, bl):
            d = functools.partial(
                jax.lax.dot_general, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
            return d(ah, bh) + (d(ah, bl) + d(al, bh))

        r = r_ref[0, 0]  # frame 0's sample offset within this block
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (n2, _LANES), 1)
        cols = []
        for j in range(fblock):
            e = r + hop * j
            row = e // 128
            lane = jnp.remainder(e, 128)
            rows = x_ref[pl.ds(row, n2 + 1), :]          # [n2+1, 128]
            rolled = pltpu.roll(                          # left-roll lane
                rows, shift=jnp.remainder(128 - lane, 128), axis=1
            )
            frame = jnp.where(
                lane_iota < 128 - lane, rolled[:n2, :], rolled[1:, :]
            )
            cols.append(frame)  # frame j in [n2, n1] layout
        xw = jnp.concatenate(cols, axis=1) * win_ref[:, :]

        if b16x3:
            xh, xl = _split_bf16(xw)
            c2h, c2l = _split_bf16(c2_ref[:, :])
            s2h, s2l = _split_bf16(s2_ref[:, :])
            are = dot3(c2h, c2l, xh, xl)
            aim = -dot3(s2h, s2l, xh, xl)
        else:
            are = dot(c2_ref[:, :], xw)
            aim = -dot(s2_ref[:, :], xw)
        tc = tc_ref[:, :]
        ts = ts_ref[:, :]
        bre = are * tc + aim * ts
        bim = aim * tc - are * ts
        b2re = bre.reshape(n2 * fblock, _LANES)
        b2im = bim.reshape(n2 * fblock, _LANES)
        if b16x3:
            reh, rel = _split_bf16(b2re)
            imh, iml = _split_bf16(b2im)
            c1h, c1l = _split_bf16(c1_ref[:, :])
            s1h, s1l = _split_bf16(s1_ref[:, :])
            xre = dot3(reh, rel, c1h, c1l) + dot3(imh, iml, s1h, s1l)
            xim = dot3(imh, iml, c1h, c1l) - dot3(reh, rel, s1h, s1l)
        else:
            xre = dot(b2re, c1_ref[:, :]) + dot(b2im, s1_ref[:, :])
            xim = dot(b2im, c1_ref[:, :]) - dot(b2re, s1_ref[:, :])
        mags = jnp.sqrt(xre * xre + xim * xim)
        out_ref[:, :, :] = mags.reshape(n2, fblock, _LANES)

    return kernel


def _make_ct_kernel(n2: int, fblock: int, b16x3: bool = False):
    precision = _ct_precision()

    def kernel(x_ref, c2_ref, s2_ref, tc_ref, ts_ref, c1_ref, s1_ref,
               win_ref, out_ref):
        dn = (((1,), (0,)), ((), ()))

        def dot(a, b):
            return jax.lax.dot_general(
                a, b, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=precision,
            )

        def dot3(ah, al, bh, bl):
            # bf16x3 (Precision.HIGH emulation, Mosaic won't lower HIGH):
            # 3 DEFAULT bf16 passes; the dropped lo*lo term is ~2^-16
            # relative — measured ~1e-6 at the chroma-feature level
            d = functools.partial(
                jax.lax.dot_general, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
            return d(ah, bh) + (d(ah, bl) + d(al, bh))

        xb = x_ref[:, :, :]                        # [FB, n2, 128] natural
        # sublane-only permutation (lanes fixed) — measured cheaper in
        # VMEM than the 870 MB XLA transpose pass it replaces
        xt = jnp.transpose(xb, (1, 0, 2))          # [n2, FB, 128]
        xw = xt.reshape(n2, fblock * 128) * win_ref[:, :]
        if b16x3:
            xh, xl = _split_bf16(xw)
            c2h, c2l = _split_bf16(c2_ref[:, :])
            s2h, s2l = _split_bf16(s2_ref[:, :])
            are = dot3(c2h, c2l, xh, xl)
            aim = -dot3(s2h, s2l, xh, xl)
        else:
            are = dot(c2_ref[:, :], xw)            # [n2, FB*128]
            aim = -dot(s2_ref[:, :], xw)
        tc = tc_ref[:, :]
        ts = ts_ref[:, :]
        bre = are * tc + aim * ts
        bim = aim * tc - are * ts
        b2re = bre.reshape(n2 * fblock, _LANES)    # [(k2 f), n1]
        b2im = bim.reshape(n2 * fblock, _LANES)
        if b16x3:
            reh, rel = _split_bf16(b2re)
            imh, iml = _split_bf16(b2im)
            c1h, c1l = _split_bf16(c1_ref[:, :])
            s1h, s1l = _split_bf16(s1_ref[:, :])
            xre = dot3(reh, rel, c1h, c1l) + dot3(imh, iml, s1h, s1l)
            xim = dot3(imh, iml, c1h, c1l) - dot3(reh, rel, s1h, s1l)
        else:
            xre = dot(b2re, c1_ref[:, :]) + dot(b2im, s1_ref[:, :])
            xim = dot(b2im, c1_ref[:, :]) - dot(b2re, s1_ref[:, :])
        mags = jnp.sqrt(xre * xre + xim * xim)     # [(k2 f), k1]
        out_ref[:, :, :] = mags.reshape(n2, fblock, _LANES)

    return kernel


def ct_band_spectrum(out3: jnp.ndarray, k1_count: int) -> jnp.ndarray:
    """Bin-major `[k1_count*n2, fpad]` low-bin band of a NATIVE CT output.

    `out3` is the kernel's untouched `[n2, fpad, 128]` block (`native=True`
    below); element `[k2, f, k1]` holds bin `k1*n2 + k2`. Transposing only
    the first `k1_count` lanes yields bins `[0, k1_count*n2)` bin-major —
    the pip_track pitch band (150-4000 Hz -> bins 56..1485 at 8192/22050,
    src/chroma.rs:275-287) needs just `k1_count=24` of the 65 kept lanes,
    so this costs ~37% of the full post-CT transpose it replaces.
    """
    n2 = out3.shape[0]
    fpad = out3.shape[1]
    return jnp.transpose(out3[:, :, :k1_count], (2, 0, 1)).reshape(
        k1_count * n2, fpad
    )


def ct_valid_max(out3: jnp.ndarray, window: int) -> jnp.ndarray:
    """Per-frame max over the REAL rfft bins of a native CT output `[fpad]`.

    Element `[k2, f, k1]` is bin `k1*n2 + k2`; lanes/rows whose bin
    exceeds `window//2` are rfft mirrors (equal magnitudes in exact math
    but not guaranteed bit-equal), so they are masked to 0 — exact for
    FINITE magnitudes, which are >= 0. Under that assumption the result
    is bit-identical to `jnp.max(bin_major_spectrum, axis=0)` (f32 max is
    order-independent). A NaN in a masked mirror position is silently
    dropped (where a hypothetical max over the mirrors would propagate
    it); a NaN in a kept position propagates normally.
    """
    import numpy as np

    n2 = out3.shape[0]
    lanes = out3.shape[2]
    binidx = (
        np.arange(lanes)[None, :] * n2 + np.arange(n2)[:, None]
    )  # [n2, lanes]
    valid = jnp.asarray(binidx <= window // 2)[:, None, :]
    return jnp.max(jnp.where(valid, out3, 0.0), axis=(0, 2))


def pallas_stft_mags_ct_fused(
    padded: jnp.ndarray,
    window: int,
    hop: int,
    n_frames: int,
    n_bins: int | None = None,
    fblock: int | None = None,
    b16x3: bool | None = None,
    native: bool = False,
) -> jnp.ndarray:
    """|DFT| spectrum `[n_bins, n_frames]` straight from the padded
    signal — frame `f` is `padded[f*hop : f*hop + window]`, extracted
    inside the kernel (see `_make_ct_fused_kernel`). Bit-identical to
    `pallas_stft_mags_ct(frame_signal_reflect-style frames, ...)` at the
    same precision flags, minus the framing pass's HBM traffic.

    With `native=True` the kernel's raw `[n2, fpad, 128]` output block is
    returned UNtransposed (element `[k2, f, k1]` = bin `k1*n2 + k2`;
    lanes past `(n_bins-1)//n2` and bins past `window//2` are rfft-mirror
    garbage the consumer must zero-weight; frame columns past `n_frames`
    are pad garbage). Layout-aware consumers (`ct_band_spectrum` for the
    tuning band, `models.chroma.chroma_stft_from_native`'s dot_general)
    skip the ~4 ms/batch bin-major (2,0,1) post-transpose entirely.

    TPU-only (Element-indexed blocks + `pltpu.roll` have no interpret
    support guarantee); `supported_ct(window)` required.
    """
    if fblock is None:
        fblock = _ct_fblock()
    if b16x3 is None:
        b16x3 = _ct_b16x3()
    return _pallas_stft_mags_ct_fused_impl(
        padded, window, hop, n_frames, n_bins, fblock, b16x3, native
    )


@functools.partial(
    jax.jit,
    static_argnames=("window", "hop", "n_frames", "n_bins", "fblock",
                     "b16x3", "native"),
)
def _pallas_stft_mags_ct_fused_impl(
    padded: jnp.ndarray,
    window: int,
    hop: int,
    n_frames: int,
    n_bins: int | None,
    fblock: int,
    b16x3: bool,
    native: bool = False,
) -> jnp.ndarray:
    import numpy as np

    from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    import jax._src.pallas.core as pcore

    from .windows import hann_periodic

    w = window
    assert supported_ct(w), w
    n2 = w // _LANES
    if n_bins is None:
        n_bins = w // 2 + 1
    fpad = -(-n_frames // fblock) * fblock
    n_blocks = fpad // fblock
    dt = jnp.float32

    def tw(rows, cols, mod):
        r = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
        theta = ((r * c) % mod).astype(dt) * (2.0 * math.pi / mod)
        return jnp.cos(theta), jnp.sin(theta)

    c2, s2 = tw(n2, n2, n2)
    t_c, t_s = tw(n2, _LANES, w)
    c1, s1 = tw(_LANES, _LANES, 128)
    tcb = jnp.tile(t_c[:, None, :], (1, fblock, 1)).reshape(n2, fblock * 128)
    tsb = jnp.tile(t_s[:, None, :], (1, fblock, 1)).reshape(n2, fblock * 128)
    win2 = hann_periodic(w).astype(dt).reshape(n2, _LANES)
    winb = jnp.tile(win2[:, None, :], (1, fblock, 1)).reshape(
        n2, fblock * 128
    )

    # signal rows: block b starts at the 8-aligned floor of sample
    # hop*fblock*b; the in-block residual (< 1024 + 127) rides rvec
    in_rows = -(-((fblock - 1) * hop + w + 1024) // 128) // 8 * 8 + 8
    starts = (hop * fblock) * np.arange(n_blocks, dtype=np.int64)
    srow = (starts // 128) // 8 * 8
    rvec = jnp.asarray(
        np.broadcast_to(
            (starts - 128 * srow)[:, None, None], (n_blocks, 8, 128)
        ).reshape(n_blocks * 8, 128),
        jnp.int32,
    )
    rows_needed = int(srow[-1]) + in_rows
    t = padded.shape[0]
    rpad = rows_needed * 128
    if t < rpad:
        padded = jnp.pad(padded, (0, rpad - t))
    else:
        padded = padded[:rpad]
    sig2d = padded.reshape(-1, 128)

    def sig_index(fb):
        return ((hop * fblock * fb) // 128) // 8 * 8, 0

    out = pl.pallas_call(
        _make_ct_fused_kernel(n2, fblock, hop, b16x3),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda fb: (fb, 0)),
            pl.BlockSpec(
                (pcore.Element(in_rows), pcore.Element(128)), sig_index
            ),
            pl.BlockSpec((n2, n2), lambda fb: (0, 0)),
            pl.BlockSpec((n2, n2), lambda fb: (0, 0)),
            pl.BlockSpec((n2, fblock * 128), lambda fb: (0, 0)),
            pl.BlockSpec((n2, fblock * 128), lambda fb: (0, 0)),
            pl.BlockSpec((_LANES, _LANES), lambda fb: (0, 0)),
            pl.BlockSpec((_LANES, _LANES), lambda fb: (0, 0)),
            pl.BlockSpec((n2, fblock * 128), lambda fb: (0, 0)),
        ],
        out_specs=pl.BlockSpec((n2, fblock, _LANES), lambda fb: (0, fb, 0)),
        out_shape=jax.ShapeDtypeStruct((n2, fpad, _LANES), jnp.float32),
    )(rvec, sig2d, c2, s2, tcb, tsb, c1, s1, winb)

    if native:
        return out
    k1_keep = (n_bins - 1) // n2 + 1
    spec = jnp.transpose(out[:, :, :k1_keep], (2, 0, 1)).reshape(
        k1_keep * n2, fpad
    )
    return spec[:n_bins, :n_frames]


def pallas_stft_mags_ct(
    frames: jnp.ndarray,
    n_frames: int,
    n_bins: int | None = None,
    interpret: bool = False,
    fblock: int | None = None,
    b16x3: bool | None = None,
) -> jnp.ndarray:
    """|DFT| of hann-windowed `frames [F, W]` -> spectrum `[n_bins, n_frames]`.

    Transposed (bins-major) output, matching `ops.spectral.stft`'s
    orientation. Requires `supported_ct(W)`. F may exceed `n_frames`
    (padded frames are computed and sliced away).

    The env defaults (BLISS_CT_FBLOCK / BLISS_CT_PREC) are resolved here,
    OUTSIDE the jitted impl, so they join the jit cache key — flipping
    them mid-process takes effect instead of silently reusing the first
    trace.
    """
    if fblock is None:
        fblock = _ct_fblock()
    if b16x3 is None:
        b16x3 = _ct_b16x3()
    return _pallas_stft_mags_ct_impl(
        frames, n_frames, n_bins, interpret, fblock, b16x3
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_frames", "n_bins", "interpret", "fblock", "b16x3"),
)
def _pallas_stft_mags_ct_impl(
    frames: jnp.ndarray,
    n_frames: int,
    n_bins: int | None,
    interpret: bool,
    fblock: int,
    b16x3: bool,
) -> jnp.ndarray:
    from .windows import hann_periodic

    w = frames.shape[-1]
    assert supported_ct(w), w
    n2 = w // _LANES  # W = n2 * 128; k = k2 + n2*k1
    if n_bins is None:
        n_bins = w // 2 + 1
    f = frames.shape[0]
    fpad = -(-f // fblock) * fblock
    dt = jnp.float32

    def tw(rows, cols, mod):
        """cos/sin of 2*pi*((r*c) mod mod)/mod, integer-exact phase."""
        r = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
        theta = ((r * c) % mod).astype(dt) * (2.0 * math.pi / mod)
        return jnp.cos(theta), jnp.sin(theta)

    c2, s2 = tw(n2, n2, n2)           # W_N2^{k2 n2}
    t_c, t_s = tw(n2, _LANES, w)      # W_W^{k2 n1}
    c1, s1 = tw(_LANES, _LANES, 128)  # W_128^{n1 k1}
    # twiddle + window tiled across the frame block's flattened lanes
    tcb = jnp.tile(t_c[:, None, :], (1, fblock, 1)).reshape(n2, fblock * 128)
    tsb = jnp.tile(t_s[:, None, :], (1, fblock, 1)).reshape(n2, fblock * 128)
    win2 = hann_periodic(w).astype(dt).reshape(n2, _LANES)
    winb = jnp.tile(win2[:, None, :], (1, fblock, 1)).reshape(
        n2, fblock * 128
    )

    # [F, W] -> [Fpad, n2, 128]: free HBM reshape, no transpose pass —
    # the (f, n2) -> (n2, f) permutation happens in VMEM inside the
    # kernel (sublane-only, measured cheaper than the XLA copy)
    x3 = frames.reshape(f, n2, _LANES)
    if fpad != f:
        x3 = jnp.pad(x3, ((0, fpad - f), (0, 0), (0, 0)))

    n_blocks = fpad // fblock
    out = pl.pallas_call(
        _make_ct_kernel(n2, fblock, b16x3=b16x3),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((fblock, n2, _LANES), lambda fb: (fb, 0, 0)),
            pl.BlockSpec((n2, n2), lambda fb: (0, 0)),
            pl.BlockSpec((n2, n2), lambda fb: (0, 0)),
            pl.BlockSpec((n2, fblock * 128), lambda fb: (0, 0)),
            pl.BlockSpec((n2, fblock * 128), lambda fb: (0, 0)),
            pl.BlockSpec((_LANES, _LANES), lambda fb: (0, 0)),
            pl.BlockSpec((_LANES, _LANES), lambda fb: (0, 0)),
            pl.BlockSpec((n2, fblock * 128), lambda fb: (0, 0)),
        ],
        out_specs=pl.BlockSpec((n2, fblock, _LANES), lambda fb: (0, fb, 0)),
        out_shape=jax.ShapeDtypeStruct((n2, fpad, _LANES), jnp.float32),
        interpret=interpret,
    )(x3, c2, s2, tcb, tsb, c1, s1, winb)

    # linear bin k = k2 + n2*k1: [k2, F, k1] -> [k1, k2, F] -> [k, F]
    k1_keep = (n_bins - 1) // n2 + 1
    spec = jnp.transpose(out[:, :, :k1_keep], (2, 0, 1)).reshape(
        k1_keep * n2, fpad
    )
    return spec[:n_bins, :n_frames]
