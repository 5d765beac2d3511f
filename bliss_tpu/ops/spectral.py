"""Spectral transforms: STFT and aubio-style phase-vocoder magnitudes.

TPU-first design: one batched `rfft` over `[n_frames, window]` replaces the
reference's per-hop streaming FFTs (bliss-rs src/utils.rs:26-64,
src/aubio.rs:119-426). The aubio FFT-shift (swap halves before the FFT) is
dropped on purpose: for even windows it multiplies bin `k` by `(-1)^k`,
which leaves every quantity bliss consumes (magnitudes, |Re| of the
purely-real DC/Nyquist bins) unchanged.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from .dft import rdft_mags
from .windows import (
    frame_signal,
    frame_signal_reflect,
    hann_periodic,
    n_frames_stft,
)


def _use_matmul_dft() -> bool:
    """MXU matmul-DFT on accelerators, rfft on CPU (f64 golden parity).

    Override with BLISS_FFT=fft|dft.
    """
    forced = os.environ.get("BLISS_FFT")
    if forced == "fft":
        return False
    if forced == "dft":
        return True
    return jax.default_backend() != "cpu"


def _windowed_mags(frames: jnp.ndarray) -> jnp.ndarray:
    """Hann-windowed magnitude spectrum [..., W] → [..., W//2+1]."""
    w = frames.shape[-1]
    windowed = frames * hann_periodic(w)
    if _use_matmul_dft():
        return rdft_mags(windowed)
    return jnp.abs(jnp.fft.rfft(windowed, axis=-1))


def stft(
    signal: jnp.ndarray,
    window_length: int,
    hop_length: int,
    length=None,
    n_frames: int | None = None,
    dtype=None,
) -> jnp.ndarray:
    """Hann-windowed, reflect-padded magnitude STFT.

    Matches the reference `stft` (src/utils.rs:26-64): f32 window and FFT,
    magnitudes optionally cast to `dtype` (the reference stores f64).
    Returns `[window//2 + 1, n_frames]`.

    `length`/`n_frames` allow masked operation over a padded buffer; when
    omitted they default to the full (static) signal length.
    """
    t = signal.shape[-1]
    if length is None:
        length = t
    if n_frames is None:
        n_frames = int(n_frames_stft(t, hop_length))
    if _use_pallas_ct(window_length):
        from . import pallas_dft
        from .windows import reflect_pad_signal

        if _use_pallas_ct_fused():
            # framing happens inside the kernel (no [F, W] HBM pass —
            # measured 26.3 -> 12.5 ms per 8x5-min batch, bit-identical)
            padded = reflect_pad_signal(signal, length, window_length)
            mags_t = pallas_dft.pallas_stft_mags_ct_fused(
                padded, window_length, hop_length, n_frames
            )
        else:
            frames = frame_signal_reflect(
                signal, length, window_length, hop_length, n_frames
            )
            mags_t = pallas_dft.pallas_stft_mags_ct(frames, n_frames)
        if dtype is not None:
            mags_t = mags_t.astype(dtype)
        return mags_t
    frames = frame_signal_reflect(signal, length, window_length, hop_length, n_frames)
    mags = _windowed_mags(frames)
    if dtype is not None:
        mags = mags.astype(dtype)
    return mags.T


def pvoc_mags(frames: jnp.ndarray) -> jnp.ndarray:
    """Correct 257-bin phase-vocoder magnitudes (PVocTempo).

    Reference: src/aubio.rs:274-426. Input `[..., n_frames, window]`,
    output `[..., n_frames, window//2 + 1]`.
    """
    return _windowed_mags(frames)


def pvoc_mags_buggy(frames: jnp.ndarray) -> jnp.ndarray:
    """Buggy 256-bin phase-vocoder magnitudes (timbral PVoc).

    Reproduces aubio's buffer-overflow behavior (src/aubio.rs:237-261):
    256 bins where bin 255 holds the *Nyquist* magnitude `|Re[256]|`
    and true bin 255 is dropped. Input `[..., n_frames, window]`,
    output `[..., n_frames, window//2]`.
    """
    w = frames.shape[-1]
    mags = _windowed_mags(frames)  # [..., half+1]
    return _buggy_256_layout(mags, w)


def _buggy_256_layout(mags: jnp.ndarray, window: int) -> jnp.ndarray:
    """Apply the aubio overflow layout: drop true bin half-1, keep the
    Nyquist in its place (single source of truth for both the framed
    fused path and pvoc_mags_buggy)."""
    half = window // 2
    return jnp.concatenate(
        [mags[..., : half - 1], mags[..., half:]], axis=-1
    )


def _use_pallas() -> bool:
    """Fused Pallas framing+DFT on real TPU (33x/15x vs the XLA path on
    5-min songs, see ops/pallas_dft.py). BLISS_PALLAS=0 disables."""
    if os.environ.get("BLISS_PALLAS") == "0":
        return False
    return jax.default_backend() == "tpu" and _use_matmul_dft()


def _use_pallas_ct_fused() -> bool:
    """In-kernel framing for the CT path (BLISS_PALLAS_CT_FUSED=0 falls
    back to the XLA framing pass + frame-consuming kernel)."""
    return os.environ.get("BLISS_PALLAS_CT_FUSED") != "0"


def _use_pallas_ct(window: int) -> bool:
    """Fused Pallas Cooley-Tukey DFT for the big chroma window on real
    TPU (all CT stages in VMEM, see ops/pallas_dft.py
    pallas_stft_mags_ct). BLISS_PALLAS_CT=0 (or BLISS_PALLAS=0) falls
    back to the XLA CT matmul path."""
    from . import pallas_dft

    if os.environ.get("BLISS_PALLAS_CT") == "0":
        return False
    return _use_pallas() and pallas_dft.supported_ct(window) and window >= 4096


def framed_pvoc_mags(
    signal: jnp.ndarray,
    window: int,
    hop: int,
    offset: int,
    n_frames: int,
    buggy: bool = False,
) -> jnp.ndarray:
    """Magnitudes of hann-windowed strided frames, fusing the framing.

    Frame f covers `signal[f*hop - offset, f*hop - offset + window)` with
    zeros outside the signal (the aubio pvoc sliding-buffer semantics,
    see ops.windows.frame_signal). `buggy=True` applies the 256-bin
    Nyquist-in-bin-255 layout (pvoc_mags_buggy). On TPU this dispatches
    to the fused Pallas kernel (framing never touches HBM); elsewhere it
    frames + windows + transforms via the backend path.
    """
    from . import pallas_dft

    if _use_pallas() and pallas_dft.supported(window, hop):
        if offset:
            signal = jnp.concatenate(
                [jnp.zeros((offset,), signal.dtype), signal]
            )
        mags = pallas_dft.pallas_frame_dft_mags(
            signal, window, hop, n_frames
        )
    else:
        frames = frame_signal(signal, window, hop, offset, n_frames)
        mags = _windowed_mags(frames)
    if buggy:
        mags = _buggy_256_layout(mags, window)
    return mags


def convolve(input_: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """FFT-based "same"-mode convolution, matching src/utils.rs:132-164
    (including its even-length zero-padding and 1/N normalization quirks)."""
    common = input_.shape[0] + kernel.shape[0]
    if common % 2 != 0:
        common -= 1
    fin = jnp.fft.fft(input_, n=common)
    fker = jnp.fft.fft(kernel, n=common)
    # rustfft's inverse is unnormalized and the reference divides by N
    # afterwards — jnp.fft.ifft's built-in 1/N is the same thing.
    out = jnp.fft.ifft(fin * fker)
    start = (kernel.shape[0] - 1) // 2
    return out[start : start + input_.shape[0]].real
