"""The fused analysis program: samples → bliss feature vector.

Replaces the reference's 5-thread descriptor fan-out
(bliss-rs src/song/mod.rs:402-508) with ONE jit-compiled XLA program per
(bucketed) song length. All descriptors read the same on-device sample
buffer; XLA fuses the elementwise work around the three batched FFTs
(512/128 timbral, 512/256 tempo, 8192/2205 chroma).

Ragged song lengths are handled by bucketing the padded buffer size
(powers-of-two steps) so a library analysis compiles O(log T) programs,
then masking inside the graph.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import AnalysisError

from . import chroma as chroma_model
from . import loudness as loudness_model
from . import tempo as tempo_model
from . import timbral as timbral_model

#: Minimum analyzable length = the largest descriptor window
#: (src/song/mod.rs:417-429).
MIN_SAMPLES = chroma_model.WINDOW_SIZE  # 8192


def analyze_samples(
    signal: jnp.ndarray, length, version: int = 2, dtype=None
) -> jnp.ndarray:
    """Pure function: `[T]` f32 samples (+ valid `length`) → features.

    Returns 23 (version 2) or 20 (version 1) f32 features ordered
    [tempo, zcr, centroid×2, rolloff×2, flatness×2, loudness×2, chroma…]
    (src/song/mod.rs:493-506).
    """
    signal = signal.astype(jnp.float32)
    tempo = tempo_model.tempo_feature(signal, length)
    zcr = timbral_model.zcr_feature(signal, length)
    spectral = timbral_model.spectral_features(signal, length)
    loud = loudness_model.loudness_features(signal, length)
    chroma = chroma_model.chroma_features(signal, length, version, dtype)
    return jnp.concatenate(
        [tempo[None], zcr[None], spectral, loud, chroma]
    ).astype(jnp.float32)


def bucket_length(n: int, min_bucket: int = 1 << 14) -> int:
    """Smallest padded size holding `n`: powers of two with 4 subdivisions
    per octave, bounding both recompiles (O(log T) buckets) and padding
    waste (≤ ~19%)."""
    if n <= min_bucket:
        return min_bucket
    p = 1 << (max(n - 1, 1)).bit_length()  # next pow2 >= n
    for num in (5, 6, 7):  # p/2 * {1.25, 1.5, 1.75}
        cand = (p >> 3) * num
        if cand >= n:
            return cand
    return p


@functools.lru_cache(maxsize=64)
def _compiled_single(padded_len: int, version: int):
    fn = functools.partial(analyze_samples, version=version)
    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def _compiled_batch(padded_len: int, version: int):
    fn = jax.vmap(functools.partial(analyze_samples, version=version))
    return jax.jit(fn)


def build_analyzer(version: int = 2):
    """Host-facing analyzer with bucketed compilation caching.

    Returns `analyze(np_samples) -> np.ndarray[features]`.
    """

    def analyze(samples: np.ndarray) -> np.ndarray:
        from ..utils.retry import retry_transient

        samples = np.asarray(samples, dtype=np.float32)
        n = samples.shape[-1]
        if n < MIN_SAMPLES:
            raise AnalysisError("empty or too short song.")
        padded_len = bucket_length(n)
        buf = np.zeros(padded_len, dtype=np.float32)
        buf[:n] = samples
        fn = _compiled_single(padded_len, version)
        # the tunneled remote-compile/execute path occasionally drops a
        # connection mid-flight (observed: "response body closed before
        # all bytes were read"); retry those — and only those
        out = retry_transient(lambda: fn(jnp.asarray(buf), n))
        return np.asarray(out)

    return analyze


def analyze_batch(
    batch: np.ndarray, lengths: np.ndarray, version: int = 2
) -> np.ndarray:
    """Analyze a `[B, T]` padded batch of songs in one device program."""
    batch = jnp.asarray(batch, dtype=jnp.float32)
    lengths = jnp.asarray(lengths, dtype=jnp.int32)
    fn = _compiled_batch(batch.shape[-1], version)
    return np.asarray(fn(batch, lengths))
