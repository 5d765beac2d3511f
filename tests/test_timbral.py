"""Timbral descriptor tests vs reference expectations
(src/timbral.rs:260-443, src/misc.rs:73-123)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bliss_tpu.io.decoder import FFmpegDecoder
from bliss_tpu.models.loudness import loudness_features
from bliss_tpu.models.timbral import spectral_features, zcr_feature


def _spectral(signal):
    sig = jnp.asarray(np.asarray(signal, np.float32))
    return np.asarray(spectral_features(sig, sig.shape[0]))


def test_zcr(decoded_s16_mono):
    # the production path feeds the WHOLE array in one do_ call
    # (src/song/mod.rs:470-474); the golden e2e vector has -0.849141.
    # (The reference's own unit test chunks the signal, which drops
    # boundary crossings and yields the slightly different -0.85036.)
    sig = jnp.asarray(decoded_s16_mono)
    out = float(zcr_feature(sig, decoded_s16_mono.shape[0]))
    assert abs(out - (-0.849141)) < 1e-5


def test_zcr_boundaries():
    sig = jnp.asarray(np.zeros(1024, np.float32))
    assert float(zcr_feature(sig, 1024)) == -1.0
    sig = jnp.asarray(np.tile([-1.0, 1.0], 512).astype(np.float32))
    assert abs(float(zcr_feature(sig, 1024)) - 0.9980469) < 0.001


def test_spectral_features_golden(decoded_s16_mono):
    out = _spectral(decoded_s16_mono)
    # centroid mean/std (src/timbral.rs:397-414, tol 1e-4... use 1e-4)
    assert abs(out[0] - (-0.75483)) < 1e-4
    assert abs(out[1] - (-0.87916887)) < 1e-4
    # rolloff mean/std (tol 0.01 in reference)
    assert abs(out[2] - (-0.6326486)) < 0.01
    assert abs(out[3] - (-0.7260933)) < 0.01
    # flatness mean/std (tol 0.01)
    assert abs(out[4] - (-0.77610075)) < 0.01
    assert abs(out[5] - (-0.8148179)) < 0.01


def test_spectral_boundaries_silence():
    """A silent signal gives -1 (the normalization floor) for centroid,
    rolloff and flatness mean+std (src/timbral.rs:301-309, 352-360,
    423-432 — the zero-chunk halves of the *_boundaries tests)."""
    out = _spectral(np.zeros(1024, np.float32))
    np.testing.assert_allclose(out, [-1.0] * 6, atol=1e-7)


def test_spectral_tone(data_dir):
    song = FFmpegDecoder.decode(data_dir / "tone_11080Hz.flac")
    out = _spectral(song.sample_array)
    assert abs(out[0] - 0.97266) < 1e-4
    assert abs(out[1] - (-0.9609926)) < 1e-4
    assert abs(out[2] - 0.9967681) < 1e-3
    assert abs(out[3] - (-0.99615175)) < 1e-3


def test_spectral_white_noise(data_dir):
    song = FFmpegDecoder.decode(data_dir / "white_noise.mp3")
    out = _spectral(song.sample_array)
    assert abs(out[4] - 0.5785303) < 0.001
    assert abs(out[5] - (-0.9426308)) < 0.001


def test_loudness(decoded_s16_mono):
    sig = jnp.asarray(decoded_s16_mono)
    # reference test uses chunks_exact => compare on truncated length
    length = (decoded_s16_mono.shape[0] // 1024) * 1024
    out = np.asarray(loudness_features(sig, length))
    assert abs(out[0] - 0.271263) < 0.01
    assert abs(out[1] - 0.2577181) < 0.01


def test_loudness_boundaries():
    sig = jnp.asarray(np.zeros(1024, np.float32))
    out = np.asarray(loudness_features(sig, 1024))
    np.testing.assert_allclose(out, [-1.0, -1.0], atol=1e-6)

    sig = jnp.asarray(np.ones(1024, np.float32))
    out = np.asarray(loudness_features(sig, 1024))
    np.testing.assert_allclose(out, [1.0, -1.0], atol=1e-6)

    sig = jnp.asarray(-np.ones(1024, np.float32))
    out = np.asarray(loudness_features(sig, 1024))
    np.testing.assert_allclose(out, [1.0, -1.0], atol=1e-6)
