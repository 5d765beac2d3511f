"""Timbral descriptors: spectral centroid / rolloff / flatness + ZCR.

Reference: bliss-rs src/timbral.rs + src/aubio.rs:16-107 (SpecDesc) and
src/aubio.rs:119-265 (buggy 256-bin PVoc). The reference streams 512/128
windows through a stateful phase vocoder; here all frames are computed as
one batched FFT and the three descriptors are fused elementwise passes
over the `[n_frames, 256]` magnitude array.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..features import SAMPLE_RATE
from ..ops import (
    framed_pvoc_mags,
    geometric_mean,
    masked_mean,
    masked_std,
    n_frames_strided,
    normalize_range,
    zero_crossing_count,
)

WINDOW_SIZE = 512  # src/timbral.rs:40
HOP_SIZE = WINDOW_SIZE // 4  # 128, src/timbral.rs:41


def _use_fused_descriptors() -> bool:
    """Fused Pallas DFT+descriptor kernel on real TPU.

    `BLISS_TIMBRAL_FUSED=0` falls back to the mags-materializing path
    (same dispatch conditions as ops.spectral framed_pvoc_mags).
    """
    import os

    from ..ops import pallas_dft
    from ..ops.spectral import _use_pallas

    return (
        os.environ.get("BLISS_TIMBRAL_FUSED") != "0"
        and _use_pallas()
        and pallas_dft.supported(WINDOW_SIZE, HOP_SIZE)
    )


def spectral_frame_mags(signal: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    """[n_frames, 256] buggy pvoc magnitudes of the 512/128 stream.

    The pvoc buffer at hop `h` spans samples `[128h - 384, 128h + 128)`
    (zero history before the song start), see ops.windows.frame_signal.
    """
    return framed_pvoc_mags(
        signal, WINDOW_SIZE, HOP_SIZE, offset=WINDOW_SIZE - HOP_SIZE,
        n_frames=n_frames, buggy=True,
    )


def frame_descriptors_from_mags(mags: jnp.ndarray):
    """Per-frame (centroid_hz, rolloff_hz, flatness) from buggy-256-bin
    magnitudes `[..., F, 256]` — the aubio per-frame math
    (src/aubio.rs:16-58, src/timbral.rs:196-208), shared by the
    non-fused path below and the time-sharded long-song path
    (parallel/longsong.py)."""
    n_bins = WINDOW_SIZE // 2
    total = jnp.sum(mags, axis=-1)
    weighted = jnp.sum(mags * jnp.arange(n_bins, dtype=mags.dtype), axis=-1)
    sq = mags * mags
    cumsum = jnp.cumsum(sq, axis=-1)
    energy = cumsum[..., -1]
    target = energy * jnp.asarray(0.95, mags.dtype)
    below = jnp.sum((cumsum < target[..., None]).astype(jnp.int32), axis=-1)
    geo = geometric_mean(mags, axis=-1)
    arith = jnp.mean(mags, axis=-1)

    centroid_bin = jnp.where(total == 0.0, 0.0, weighted / total)
    centroid_hz = centroid_bin * (SAMPLE_RATE / WINDOW_SIZE)
    roll_bin = jnp.where(energy == 0.0, 0, below + 1).astype(energy.dtype)
    roll_bin = jnp.minimum(roll_bin, WINDOW_SIZE / 2.0)
    rolloff_hz = roll_bin * (SAMPLE_RATE / WINDOW_SIZE)
    flatness = jnp.where(
        geo == 0.0, 0.0, geo / jnp.where(arith == 0.0, 1.0, arith)
    )
    return centroid_hz, rolloff_hz, flatness


def summarize_spectral(
    centroid_hz: jnp.ndarray,
    rolloff_hz: jnp.ndarray,
    flatness: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Normalized mean+std summaries of the three per-frame series
    (SpectralDesc getters, src/timbral.rs:57-122)."""
    half_sr = SAMPLE_RATE / 2.0
    feats = [
        normalize_range(masked_mean(centroid_hz, mask), 0.0, half_sr),
        normalize_range(masked_std(centroid_hz, mask), 0.0, half_sr),
        normalize_range(masked_mean(rolloff_hz, mask), 0.0, half_sr),
        normalize_range(masked_std(rolloff_hz, mask), 0.0, half_sr),
        normalize_range(masked_mean(flatness, mask), 0.0, 1.0),
        normalize_range(masked_std(flatness, mask), 0.0, 1.0),
    ]
    return jnp.stack(feats).astype(jnp.float32)


def spectral_features(signal: jnp.ndarray, length) -> jnp.ndarray:
    """Six timbral features: normalized mean+std of centroid (Hz),
    rolloff (Hz) and flatness. Matches SpectralDesc getters
    (src/timbral.rs:57-122) summarizing aubio per-frame values.
    """
    t = signal.shape[-1]
    n_frames_max = int(n_frames_strided(t, WINDOW_SIZE, HOP_SIZE))
    n_valid = n_frames_strided(jnp.asarray(length, jnp.int32), WINDOW_SIZE, HOP_SIZE)
    mask = jnp.arange(n_frames_max, dtype=jnp.int32) < n_valid

    n_bins = WINDOW_SIZE // 2
    if _use_fused_descriptors():
        # fused Pallas path: the [F, 256] magnitudes never leave VMEM —
        # the kernel emits per-frame raw reductions (ops/pallas_dft.py)
        from ..ops.pallas_dft import pallas_frame_dft_timbral

        offset = WINDOW_SIZE - HOP_SIZE
        padded = jnp.concatenate(
            [jnp.zeros((offset,), signal.dtype), signal]
        )
        raw = pallas_frame_dft_timbral(
            padded, WINDOW_SIZE, HOP_SIZE, n_frames_max
        )  # [F, 5]: total, weighted, below, logsum, energy
        total, weighted = raw[:, 0], raw[:, 1]
        below, logsum, energy = raw[:, 2], raw[:, 3], raw[:, 4]
        geo = jnp.exp2(logsum / n_bins)
        arith = total / n_bins

        centroid_bin = jnp.where(total == 0.0, 0.0, weighted / total)
        centroid_hz = centroid_bin * (SAMPLE_RATE / WINDOW_SIZE)
        # dtype-parametric cast: the fused TPU path is f32, but the CPU
        # x64 golden-parity path must stay f64 end-to-end (advisor r3)
        roll_bin = jnp.where(energy == 0.0, 0, below + 1).astype(
            energy.dtype
        )
        # aubio PR#318 workaround (src/timbral.rs:185-187)
        roll_bin = jnp.minimum(roll_bin, WINDOW_SIZE / 2.0)
        rolloff_hz = roll_bin * (SAMPLE_RATE / WINDOW_SIZE)
        flatness = jnp.where(
            geo == 0.0, 0.0, geo / jnp.where(arith == 0.0, 1.0, arith)
        )
    else:
        mags = spectral_frame_mags(signal, n_frames_max)  # [F, 256]
        centroid_hz, rolloff_hz, flatness = frame_descriptors_from_mags(
            mags
        )

    return summarize_spectral(centroid_hz, rolloff_hz, flatness, mask)


def zcr_feature(signal: jnp.ndarray, length) -> jnp.ndarray:
    """Zero-crossing rate over the whole sample array, normalized
    (src/timbral.rs:231-258)."""
    crossings = zero_crossing_count(signal, length)
    rate = crossings.astype(jnp.float32) / jnp.asarray(length, jnp.float32)
    return normalize_range(rate, 0.0, 1.0).astype(jnp.float32)
