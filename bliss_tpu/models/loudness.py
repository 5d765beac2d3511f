"""Loudness descriptor (mean energy → dB SPL), reference src/misc.rs.

The reference feeds `chunks(1024)` — including the final partial chunk —
through `level_lin` and summarizes mean/std in dB over [-90, 0]
(src/misc.rs:43-71, chunking at src/song/mod.rs:476-484).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import masked_mean, masked_std, normalize_range

WINDOW_SIZE = 1024  # src/misc.rs:44


def summarize_levels(level: jnp.ndarray, chunk_len: jnp.ndarray) -> jnp.ndarray:
    """Mean/std of per-chunk linear levels → normalized dB features
    (src/misc.rs:43-71). Shared by `loudness_features` and the
    time-sharded long-song path (parallel/longsong.py)."""
    mask = chunk_len > 0
    mean_value = masked_mean(level, mask)
    std_value = masked_std(level, mask)
    floor = jnp.asarray(1e-9, level.dtype)
    mean_value = jnp.maximum(mean_value, floor)
    std_value = jnp.maximum(std_value, floor)
    mean_db = 10.0 * jnp.log10(mean_value)
    std_db = 10.0 * jnp.log10(std_value)
    return jnp.stack(
        [
            normalize_range(mean_db, -90.0, 0.0),
            normalize_range(std_db, -90.0, 0.0),
        ]
    ).astype(jnp.float32)


def loudness_features(signal: jnp.ndarray, length) -> jnp.ndarray:
    t = signal.shape[-1]
    n_chunks_max = -(-t // WINDOW_SIZE)
    pad = n_chunks_max * WINDOW_SIZE - t
    if pad:
        signal = jnp.pad(signal, (0, pad))
    length = jnp.asarray(length, jnp.int32)

    idx = jnp.arange(n_chunks_max, dtype=jnp.int32) * WINDOW_SIZE
    # per-chunk valid sample count: 1024 for full chunks, remainder for the
    # final partial chunk, 0 past the end
    chunk_len = jnp.clip(length - idx, 0, WINDOW_SIZE)
    # samples beyond `length` are zero by construction, so the energy sum
    # needs no masking — only the divisor does (level_lin divides by the
    # actual chunk length, src/misc.rs:12-18)
    sample_idx = jnp.arange(t + pad, dtype=jnp.int32)
    masked = jnp.where(sample_idx < length, signal, 0.0).reshape(
        n_chunks_max, WINDOW_SIZE
    )
    energy = jnp.sum(masked * masked, axis=-1)
    level = energy / jnp.maximum(chunk_len, 1).astype(signal.dtype)
    return summarize_levels(level, chunk_len)
