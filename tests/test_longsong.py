"""Sequence-parallel chroma: sharded vs single-device parity on the
8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bliss_tpu.models.chroma import chroma_features
from bliss_tpu.parallel import make_mesh
from bliss_tpu.parallel.longsong import sharded_chroma_features


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh(8, axis="time")


def _single(signal, length):
    return np.asarray(
        chroma_features(jnp.asarray(signal), length, 2, jnp.float32)
    )


def test_sharded_matches_single_synthetic(mesh):
    rng = np.random.default_rng(0)
    t = 8 * 32768  # 262144, ~12 s
    sig = (rng.normal(size=t) * 0.1).astype(np.float32)
    # a musical-ish component so features are non-degenerate
    sig += 0.3 * np.sin(
        2 * np.pi * 440.0 * np.arange(t) / 22050.0
    ).astype(np.float32)
    out = sharded_chroma_features(mesh, sig, t)
    ref = _single(sig, t)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_sharded_masked_length(mesh):
    rng = np.random.default_rng(1)
    t = 8 * 32768
    length = t - 50000
    sig = np.zeros(t, np.float32)
    sig[:length] = (rng.normal(size=length) * 0.1).astype(np.float32)
    out = sharded_chroma_features(mesh, sig, length)
    ref = _single(sig, length)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_sharded_real_song(mesh, decoded_s16_mono):
    t = 8 * 32768
    sig = np.zeros(t, np.float32)
    n = decoded_s16_mono.shape[0]
    sig[:n] = decoded_s16_mono
    out = sharded_chroma_features(mesh, sig, n)
    ref = _single(sig, n)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_sharded_non_divisible_length(mesh):
    """T not a mesh multiple: the pad+mask path must match exactly."""
    rng = np.random.default_rng(3)
    t = 8 * 32768 + 12345  # ragged
    sig = (rng.normal(size=t) * 0.1).astype(np.float32)
    sig += 0.2 * np.sin(
        2 * np.pi * 523.25 * np.arange(t) / 22050.0
    ).astype(np.float32)
    out = sharded_chroma_features(mesh, sig, t)
    ref = _single(sig, t)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_sharded_short_signal(mesh):
    """A signal shorter than mesh*min-shard still works (pad-to-viable)."""
    rng = np.random.default_rng(4)
    t = 30011  # < 8 * (8192+2205)
    sig = (rng.normal(size=t) * 0.1).astype(np.float32)
    out = sharded_chroma_features(mesh, sig, t)
    ref = _single(sig, t)
    np.testing.assert_allclose(out, ref, atol=2e-5)
