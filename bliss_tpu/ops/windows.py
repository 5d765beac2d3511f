"""Framing and window functions.

TPU-first design note: the reference streams overlapping windows through
stateful descriptor objects (bliss-rs src/utils.rs:26-64, src/aubio.rs:119-426).
Here, a whole song lives on device as one `[T]` array and framing is a
single gather producing `[n_frames, window]`, which XLA fuses with the
window multiply feeding the batched FFT. Ragged lengths are handled with
masks, never with dynamic shapes.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _hann_np(window_length: int) -> np.ndarray:
    # Periodic Hann, computed in f32 exactly like the reference
    # (src/utils.rs:36-40 and src/aubio.rs:151-154 — hanningz
    # `0.5*(1-cos)` equals `0.5-0.5cos` elementwise).
    n = np.arange(window_length, dtype=np.float32)
    return (
        np.float32(0.5)
        - np.float32(0.5)
        * np.cos(np.float32(2.0) * n * np.float32(math.pi) / np.float32(window_length))
    ).astype(np.float32)


def hann_periodic(window_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window of `window_length` (f32 parity with reference)."""
    return jnp.asarray(_hann_np(window_length), dtype=dtype)


def n_frames_strided(length, window_length: int, hop_length: int):
    """Number of complete strided windows (Rust `windows(w).step_by(h)`)."""
    return (length - window_length) // hop_length + 1


def n_frames_stft(length, hop_length: int):
    """Frame count of the reference stft (src/utils.rs:29-32):
    `ceil(len/hop)` rows, truncated by the windows iterator to
    `floor((len-1)/hop) + 1` — the two coincide in this closed form."""
    return (length - 1) // hop_length + 1


def reflect_pad(array: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflect-pad (no edge repeat), matching src/utils.rs:11-24."""
    prefix = array[1 : pad + 1][::-1]
    suffix = array[-(pad + 1) : -1][::-1]
    return jnp.concatenate([prefix, array, suffix])


def _slice_frames(
    padded: jnp.ndarray, starts: jnp.ndarray, window_length: int
) -> jnp.ndarray:
    """Gather contiguous `window_length` windows at `starts`.

    vmapped `dynamic_slice` lowers to an XLA gather whose slice covers the
    whole (contiguous) window — a handful of DMA-friendly row copies —
    instead of the n_frames x window pointwise gather `jnp.take` with a
    2-D index array produces (which runs ~30x slower on TPU).
    """
    import jax

    return jax.vmap(
        lambda s: jax.lax.dynamic_slice(padded, (s,), (window_length,))
    )(starts)


def frame_signal(
    signal: jnp.ndarray,
    window_length: int,
    hop_length: int,
    offset: int = 0,
    n_frames: int | None = None,
) -> jnp.ndarray:
    """Frame `signal` into `[n_frames, window_length]` windows.

    Frame `f` covers samples `[f*hop - offset, f*hop - offset + window)`;
    out-of-range positions read as zero. `offset > 0` reproduces the
    aubio phase-vocoder sliding-buffer semantics (src/aubio.rs:198-212):
    the pvoc's internal buffer at hop `h` holds the last `window` samples
    ending at `h*hop + hop`, i.e. a window starting at `hop*(h+1) - window`.
    """
    t = signal.shape[-1]
    if n_frames is None:
        n_frames = int(n_frames_strided(t, window_length, hop_length))
    if offset:
        signal = jnp.concatenate(
            [jnp.zeros((offset,), signal.dtype), signal]
        )
    # dynamic_slice clamps out-of-range starts; pad the tail so the last
    # frames read zeros instead of sliding backwards
    tail = (n_frames - 1) * hop_length + window_length - (t + offset)
    if tail > 0:
        signal = jnp.concatenate([signal, jnp.zeros((tail,), signal.dtype)])
    starts = jnp.arange(n_frames, dtype=jnp.int32) * hop_length
    return _slice_frames(signal, starts, window_length)


def reflect_pad_signal(
    signal: jnp.ndarray, length, window_length: int
) -> jnp.ndarray:
    """The padding half of `frame_signal_reflect`: reflect-pad a signal
    with a *dynamic* valid `length` so that frame `f` of the reference
    stft equals `padded[f*hop : f*hop + window]`.

    Equivalent to `reflect_pad(signal[:length], window//2)` plus a
    `window`-sized zero tail (so trailing frames read zeros). The static
    prefix reflection is a reversed slice; the dynamic suffix reflection
    around `length` is one `pad`-sized reversed dynamic slice scattered
    at `length + pad`.

    Requires `window_length // 2 <= length - 1` (guaranteed by the
    reference's minimum-song-length check, src/song/mod.rs:417-429) and
    zeros in `signal` beyond `length`.
    """
    import jax

    pad = window_length // 2
    length = jnp.asarray(length, jnp.int32)

    prefix = signal[1 : pad + 1][::-1]
    padded = jnp.concatenate(
        [prefix, signal, jnp.zeros((pad + window_length,), signal.dtype)]
    )
    # suffix reflection: padded[pad + length + i] = signal[length - 2 - i]
    tail_src = jax.lax.dynamic_slice(
        padded, (jnp.maximum(length - 1 - pad, 0) + pad,), (pad,)
    )[::-1]
    return jax.lax.dynamic_update_slice(padded, tail_src, (pad + length,))


def frame_signal_reflect(
    signal: jnp.ndarray,
    length,
    window_length: int,
    hop_length: int,
    n_frames: int,
) -> jnp.ndarray:
    """Frame a reflect-padded signal with a *dynamic* valid `length`
    (reference stft, src/utils.rs:26-64): `reflect_pad_signal` followed
    by contiguous window slices."""
    padded = reflect_pad_signal(signal, length, window_length)
    starts = jnp.arange(n_frames, dtype=jnp.int32) * hop_length
    return _slice_frames(padded, starts, window_length)
