"""Chroma descriptor tests vs reference golden fixtures
(src/chroma.rs:479-867)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bliss_tpu.io.decoder import FFmpegDecoder
from bliss_tpu.models import chroma as C
from bliss_tpu.ops import stft


def test_chroma_filter(data_dir):
    expected = np.load(data_dir / "chroma-filter.npy")
    filt = np.asarray(C.chroma_filter(2048, -0.1, jnp.float64, 22050))
    np.testing.assert_allclose(filt, expected, atol=1e-9)


def test_pip_track(data_dir):
    spectrum = jnp.asarray(np.load(data_dir / "spectrum-chroma.npy"))
    expected_mags = np.sort(np.load(data_dir / "spectrum-chroma-mags.npy"))
    expected_pitches = np.sort(
        np.load(data_dir / "spectrum-chroma-pitches.npy")
    )
    mask = jnp.ones(spectrum.shape[1], bool)
    pitches, mags, peak_mask = C.pip_track(spectrum, mask, 2048)
    pitches = np.sort(np.asarray(pitches)[np.asarray(peak_mask)])
    mags = np.sort(np.asarray(mags)[np.asarray(peak_mask)])
    np.testing.assert_allclose(pitches, expected_pitches, atol=1e-8)
    np.testing.assert_allclose(mags, expected_mags, atol=1e-8)


def test_estimate_tuning(data_dir):
    spectrum = jnp.asarray(np.load(data_dir / "spectrum-chroma.npy"))
    mask = jnp.ones(spectrum.shape[1], bool)
    tuning = float(C.estimate_tuning(spectrum, mask, 2048))
    assert abs(tuning - (-0.09999999999999998)) < 1e-6


def test_estimate_tuning_empty():
    spectrum = jnp.zeros((4097, 1), jnp.float64)
    mask = jnp.ones(1, bool)
    assert float(C.estimate_tuning(spectrum, mask, 8192)) == 0.0


def test_estimate_tuning_decode(decoded_s16_mono):
    sig = jnp.asarray(decoded_s16_mono)
    spectrum = stft(sig, 8192, 2205, dtype=jnp.float64)
    mask = jnp.ones(spectrum.shape[1], bool)
    tuning = float(C.estimate_tuning(spectrum, mask, 8192))
    assert abs(tuning - (-0.04999999999999999)) < 1e-6


def test_chroma_stft_decode(data_dir, decoded_s16_mono):
    expected = np.load(data_dir / "chroma.npy")
    sig = jnp.asarray(decoded_s16_mono)
    spectrum = stft(sig, 8192, 2205, dtype=jnp.float64)
    chroma = np.asarray(
        C.chroma_stft_from_spectrum(spectrum, -0.04999999999999999, 8192)
    )
    assert chroma.shape == expected.shape
    np.testing.assert_allclose(chroma, expected, atol=1e-7)


def test_extract_interval_features(data_dir):
    # the fixture is already-sharpened chroma: it feeds the inner
    # product-of-powers directly (src/chroma.rs:512-540)
    chroma = jnp.asarray(np.load(data_dir / "chroma-interval.npy"))
    expected = np.load(data_dir / "interval-feature-matrix.npy")
    out = np.asarray(C.extract_interval_features(chroma))
    np.testing.assert_allclose(out, expected, atol=1e-7)


def test_chroma_interval_features(data_dir):
    chroma = jnp.asarray(np.load(data_dir / "chroma.npy"))
    mask = jnp.ones(chroma.shape[1], bool)
    out = np.asarray(C.chroma_interval_features(chroma, mask))
    expected = [
        0.03860284, 0.02185281, 0.04224379, 0.06385278, 0.07311148,
        0.02512566, 0.00319899, 0.00311308, 0.00107433, 0.00241861,
    ]
    np.testing.assert_allclose(out, expected, atol=1e-8)


def test_normalize_feature_sequence():
    arr = jnp.asarray(
        np.array([[0.1, 0.3, 0.4, 0.0], [1.1, 0.53, 1.01, 0.0]])
    )
    expected = np.array(
        [
            [0.08333333, 0.36144578, 0.28368794, 0.0],
            [0.91666667, 0.63855422, 0.71631206, 0.0],
        ]
    )
    np.testing.assert_allclose(
        np.asarray(C.normalize_feature_sequence(arr)), expected, atol=1e-7
    )


def _full_chroma(samples, version=2):
    sig = jnp.asarray(np.asarray(samples, np.float32))
    return np.asarray(
        C.chroma_features(sig, sig.shape[0], version, jnp.float64)
    )


def test_chroma_desc(decoded_s16_mono):
    expected = [
        -0.34292513, -0.62803423, -0.28095096, 0.08686459, 0.24446082,
        -0.5723257, 0.23292065, 0.19981146, -0.58594406, -0.06784296,
    ]
    out = _full_chroma(decoded_s16_mono)
    np.testing.assert_allclose(out[:10], expected, atol=1e-7)


def test_chroma_desc_v1(decoded_s16_mono):
    expected = [
        -0.35661936, -0.63578653, -0.29593682, 0.06421304, 0.21852458,
        -0.581239, -0.9466835, -0.9481153, -0.9820945, -0.95968974,
    ]
    out = _full_chroma(decoded_s16_mono, version=1)
    np.testing.assert_allclose(out, expected, atol=1e-7)


@pytest.mark.parametrize(
    "name,idx",
    [
        ("Cmaj.ogg", 6),
        ("Dmaj.ogg", 6),
        ("Cmin.ogg", 7),
        ("Cdim.ogg", 8),
        ("Caug.ogg", 9),
    ],
)
def test_triads(data_dir, name, idx):
    song = FFmpegDecoder.decode(data_dir / "chroma" / name)
    out = _full_chroma(song.sample_array)
    assert int(np.argmax(out)) == idx
    for i in range(6, 10):
        if i == idx:
            assert out[i] > 0.8
        else:
            assert out[i] < 0.0


@pytest.mark.parametrize(
    "name,idx",
    [
        ("minor_second.ogg", 0),
        ("major_second.ogg", 1),
        ("minor_third.ogg", 2),
        ("major_third.ogg", 3),
        ("perfect_fourth.ogg", 4),
        ("perfect_fifth.ogg", 4),
        ("tritone.ogg", 5),
        ("minor_sixth.ogg", 3),
        ("major_sixth.ogg", 2),
        ("minor_seventh.ogg", 1),
        ("major_seventh.ogg", 0),
    ],
)
def test_intervals(data_dir, name, idx):
    song = FFmpegDecoder.decode(data_dir / "chroma" / name)
    out = _full_chroma(song.sample_array)
    assert int(np.argmax(out)) == idx
    for i in range(6):
        if i == idx:
            assert out[i] > 0.9
        else:
            assert out[i] < 0.0


def test_l2_norm_features(data_dir):
    song = FFmpegDecoder.decode(data_dir / "chroma" / "dyad_tritone_IC6.ogg")
    assert _full_chroma(song.sample_array)[10] > 0.9
    song = FFmpegDecoder.decode(data_dir / "chroma" / "Cmaj_triads.ogg")
    assert _full_chroma(song.sample_array)[11] > 0.9
    song = FFmpegDecoder.decode(
        data_dir / "chroma" / "triad_aug_maximize_ratio.ogg"
    )
    assert _full_chroma(song.sample_array)[12] > 0.7


def test_edge_cases(data_dir):
    expected_silence = [
        -0.18350339, -0.18350339, -0.18350339, -0.18350339, -0.18350339,
        -0.18350339, 0.0, 0.0, 0.0, 0.0,
    ]
    song = FFmpegDecoder.decode(data_dir / "silence.ogg")
    out = _full_chroma(song.sample_array)
    np.testing.assert_allclose(out[:10], expected_silence, atol=1e-7)

    expected_noise = [
        -0.17531848, -0.1804418, -0.18354797, -0.18585062, -0.1875512,
        -0.18838519, -0.00026643276, -0.0002770424, 0.0016055107,
        -0.0010639429,
    ]
    song = FFmpegDecoder.decode(data_dir / "white_noise.mp3")
    out = _full_chroma(song.sample_array)
    np.testing.assert_allclose(out[:10], expected_noise, atol=1e-7)


def test_pitch_tuning(data_dir):
    """src/chroma.rs test_pitch_tuning: histogram mode of the
    pitch-tuning.npy frequencies is -0.1."""
    pitch = np.load(data_dir / "pitch-tuning.npy")
    out = C.pitch_tuning(jnp.asarray(pitch), None, 0.05, 12)
    assert float(out) == pytest.approx(-0.1, abs=1e-12)


def test_pitch_tuning_no_frequencies():
    """src/chroma.rs test_pitch_tuning_no_frequencies: empty input
    yields 0.0."""
    out = C.pitch_tuning(jnp.asarray(np.array([], np.float64)), None, 0.05, 12)
    assert float(out) == 0.0
