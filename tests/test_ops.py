"""Golden-fixture tests of the DSP substrate, mirroring the reference's
inline tests (src/utils.rs:193-552)."""

import numpy as np
import pytest

import jax.numpy as jnp

from bliss_tpu.ops import (
    convolve,
    geometric_mean,
    masked_mean,
    masked_quantile_midpoint,
    masked_std,
    reflect_pad,
    stft,
    zero_crossing_count,
)
from bliss_tpu.models.chroma import hz_to_octs


def test_convolve(data_dir):
    expected = np.load(data_dir / "convolve.npy")
    input_ = jnp.arange(0.0, 1000.0, 0.5, dtype=jnp.float64)
    kernel = jnp.ones(100, dtype=jnp.float64)
    out = np.asarray(convolve(input_, kernel))
    np.testing.assert_allclose(out, expected, atol=1e-7)

    expected = np.load(data_dir / "convolve_odd.npy")
    kernel = jnp.ones(99, dtype=jnp.float64)
    out = np.asarray(convolve(input_, kernel))
    np.testing.assert_allclose(out, expected, atol=1e-7)


def test_geometric_mean():
    assert float(geometric_mean(jnp.array([0.0, 1, 2, 3, 4, 5, 6, 7]))) == 0.0
    vals = jnp.array([4.0, 2, 1, 4, 2, 1, 2, 2])
    assert abs(float(geometric_mean(vals)) - 2.0) < 1e-4
    vals = jnp.array([256.0, 4, 2, 1, 4, 2, 1, 2])
    assert abs(float(geometric_mean(vals)) - 3.668016172818685) < 1e-4


def test_reflect_pad():
    arr = jnp.arange(0.0, 100000.0)
    out = np.asarray(reflect_pad(arr, 3))
    np.testing.assert_array_equal(out[:4], [3.0, 2.0, 1.0, 0.0])
    np.testing.assert_array_equal(out[3:100003], np.arange(100000.0))
    np.testing.assert_array_equal(out[100003:], [99998.0, 99997.0, 99996.0])


def test_hz_to_octs():
    freqs = jnp.array([32.0, 64, 128, 256], dtype=jnp.float64)
    expected = [0.16864029, 1.16864029, 2.16864029, 3.16864029]
    out = np.asarray(hz_to_octs(freqs, 0.5, 10))
    np.testing.assert_allclose(out, expected, atol=1e-4)


def test_stft(data_dir):
    """STFT vs librosa golden fixture (src/utils.rs:527-541)."""
    from bliss_tpu.io.decoder import FFmpegDecoder

    expected = np.load(data_dir / "librosa-stft.npy").astype(np.float64)
    song = FFmpegDecoder.decode(data_dir / "piano.flac")
    out = np.asarray(stft(jnp.asarray(song.sample_array), 2048, 512))
    assert out.shape[0] == expected.shape[0]
    n = min(out.shape[1], expected.shape[1])
    np.testing.assert_allclose(out[:, :n], expected[:, :n], atol=1e-4)


def test_stft_masked_matches_unmasked():
    """Masked STFT over a padded buffer == STFT of the exact-size signal."""
    rng = np.random.default_rng(0)
    sig = rng.normal(size=30011).astype(np.float32)
    full = np.asarray(stft(jnp.asarray(sig), 2048, 512))
    padded = np.zeros(40960, np.float32)
    padded[: sig.shape[0]] = sig
    from bliss_tpu.ops import n_frames_stft

    nf = int(n_frames_stft(sig.shape[0], 512))
    masked = np.asarray(
        stft(jnp.asarray(padded), 2048, 512, length=sig.shape[0], n_frames=nf)
    )
    np.testing.assert_allclose(masked, full, atol=1e-5)


def test_zero_crossing_count():
    sig = jnp.array([0.0] * 1024)
    assert int(zero_crossing_count(sig)) == 0
    sig = jnp.array([-1.0, 1.0] * 512)
    assert int(zero_crossing_count(sig)) == 1023


def test_masked_reductions():
    vals = jnp.array([1.0, 2.0, 3.0, 99.0, 98.0])
    mask = jnp.array([True, True, True, False, False])
    assert abs(float(masked_mean(vals, mask)) - 2.0) < 1e-6
    expected_std = np.std([1.0, 2.0, 3.0])
    assert abs(float(masked_std(vals, mask)) - expected_std) < 1e-6


def test_masked_median_midpoint():
    # odd count: exact middle; even count: midpoint of the two middles
    vals = jnp.array([5.0, 1.0, 3.0, 100.0])
    mask = jnp.array([True, True, True, False])
    assert float(masked_quantile_midpoint(vals, mask)) == 3.0
    mask = jnp.array([True, True, True, True])
    assert float(masked_quantile_midpoint(vals, mask)) == 4.0


def test_kth_smallest_bisect_exact():
    """The bisection selection primitive (used for the cross-shard median
    in parallel/longsong.py) is bit-exact vs sorting."""
    from bliss_tpu.ops.reductions import _kth_smallest_bisect

    rng = np.random.default_rng(3)
    for dtype in (np.float32, np.float64):
        x = rng.normal(size=5001).astype(dtype)
        x[::5] = -x[::5]
        mask = rng.uniform(size=x.shape) > 0.4
        ref = np.sort(x[mask])
        for k in (0, 1, len(ref) // 2, len(ref) - 1):
            got = _kth_smallest_bisect(
                jnp.asarray(x), jnp.asarray(mask), k
            )
            assert float(got) == ref[k], (dtype, k)


def test_kth_smallest_bisect_unrolled_pair():
    """The paired unrolled bisect (the TPU large-median path) matches a
    host sort for both (floor, ceil) ranks, on exact float keys."""
    import numpy as np

    from bliss_tpu.ops.reductions import _kth_smallest_bisect_unrolled_pair

    rng = np.random.default_rng(3)
    vals = rng.normal(size=4001).astype(np.float32)
    mask = rng.random(4001) < 0.7
    sel = np.sort(vals[mask])
    for k1, k2 in [(0, 1), (17, 18), (len(sel) - 2, len(sel) - 1)]:
        v1, v2 = _kth_smallest_bisect_unrolled_pair(
            jnp.asarray(vals), jnp.asarray(mask), k1, k2
        )
        assert np.float32(v1) == sel[k1]
        assert np.float32(v2) == sel[k2]
