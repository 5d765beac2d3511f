"""End-to-end Song/Analysis tests vs the golden 23-dim vector
(src/song/mod.rs:524-843)."""

import pathlib
import numpy as np
import pytest

from bliss_tpu import (
    Analysis,
    AnalysisIndex,
    AnalysisIndexV1,
    AnalysisOptions,
    FeaturesVersion,
    NUMBER_FEATURES,
    Song,
)
from bliss_tpu.errors import AnalysisError, ProviderError
from bliss_tpu.io.decoder import FFmpegDecoder

GOLDEN_V2 = [
    0.3846389, -0.849141, -0.75481045, -0.8790748, -0.63258266,
    -0.7258959, -0.7757379, -0.8146726, 0.2716726, 0.25779057,
    -0.34292513, -0.62803423, -0.28095096, 0.08686459, 0.24446082,
    -0.5723257, 0.23292065, 0.19981146, -0.58594406, -0.06784296,
    -0.06000763, -0.58485717, -0.07880378,
]

GOLDEN_V1 = [
    0.3846389, -0.849141, -0.75481045, -0.8790748, -0.63258266,
    -0.7258959, -0.7757379, -0.8146726, 0.2716726, 0.25779057,
    -0.35661936, -0.63578653, -0.29593682, 0.06421304, 0.21852458,
    -0.581239, -0.9466835, -0.9481153, -0.9820945, -0.95968974,
]


def test_analyze_golden(data_dir):
    song = FFmpegDecoder.song_from_path(data_dir / "s16_mono_22_5kHz.flac")
    np.testing.assert_allclose(song.analysis.as_vec(), GOLDEN_V2, atol=1e-5)
    assert song.features_version == FeaturesVersion.latest()


def test_analyze_v1(data_dir):
    song = FFmpegDecoder.song_from_path(
        data_dir / "s16_mono_22_5kHz.flac",
        AnalysisOptions(features_version=FeaturesVersion.VERSION1),
    )
    np.testing.assert_allclose(song.analysis.as_vec(), GOLDEN_V1, atol=1e-5)
    assert song.features_version == FeaturesVersion.VERSION1


def test_analysis_too_small():
    with pytest.raises(AnalysisError, match="empty or too short song."):
        Song.analyze([0.0])
    with pytest.raises(AnalysisError):
        Song.analyze([])


def test_index_analysis(data_dir):
    song = FFmpegDecoder.song_from_path(data_dir / "s16_mono_22_5kHz.flac")
    assert abs(song.analysis[AnalysisIndex.TEMPO] - 0.3846389) < 1e-5
    assert abs(song.analysis[AnalysisIndex.CHROMA10] - (-0.06784296)) < 1e-5


def test_index_analysis_old_version():
    a = Analysis([1.0] * 20, FeaturesVersion.VERSION1)
    assert a[AnalysisIndexV1.TEMPO] == 1.0
    assert a[AnalysisIndexV1.CHROMA10] == 1.0
    with pytest.raises(IndexError, match="incompatible indexes"):
        a[AnalysisIndex.CHROMA13]


def test_new_analysis_wrong_feature_count():
    with pytest.raises(ProviderError):
        Analysis([1.0], FeaturesVersion.VERSION2)


def test_analysis_distance():
    a = Analysis([0.0] * 20, FeaturesVersion.VERSION1)
    b = Analysis([1.0] * 20, FeaturesVersion.VERSION1)
    assert abs(a.distance(b) - 4.472136) < 1e-6


def test_analysis_distance_mismatched_versions():
    a = Analysis([0.0] * 20, FeaturesVersion.VERSION1)
    b = Analysis([0.0] * 23, FeaturesVersion.VERSION2)
    with pytest.raises(ProviderError, match="Mismatched features version"):
        a.distance(b)


def test_distance_metric_features_version():
    m1 = FeaturesVersion.VERSION1.distance_metric()
    assert abs(m1(np.zeros(20), np.ones(20)) - 4.47213595) < 1e-6
    m2 = FeaturesVersion.VERSION2.distance_metric()
    assert abs(m2(np.zeros(23), np.ones(23)) - 3.4999998) < 1e-6


def test_number_features():
    assert NUMBER_FEATURES == 23
    assert FeaturesVersion.VERSION1.feature_count == 20
    assert FeaturesVersion.VERSION1.feature_weights().shape == (20, 20)
    assert FeaturesVersion.VERSION2.feature_weights().shape == (23, 23)


# The reference's exact Debug-snapshot f32 values for
# data/s16_mono_22_5kHz.flac (src/song/mod.rs:711-735). Constructing the
# Analysis from these values directly pins the *format* contract (variant
# names, ordering, shortest-roundtrip f32 notation, raw-vector trailer)
# independent of the 1e-5 numeric tolerance of the pipeline itself.
_DEBUG_V2_VALUES = [
    0.3846389, -0.849141, -0.7548105, -0.8790748, -0.63258266,
    -0.7258959, -0.775738, -0.8146726, 0.2716726, 0.25779057,
    -0.34292513, -0.62803423, -0.28095096, 0.08686459, 0.24446082,
    -0.5723257, 0.23292065, 0.19981146, -0.58594406, -0.06784296,
    -0.06000763, -0.58485717, -0.07880378,
]

_DEBUG_V1_VALUES = [
    0.3846389, -0.849141, -0.7548105, -0.8790748, -0.63258266,
    -0.7258959, -0.775738, -0.8146726, 0.2716726, 0.25779057,
    -0.35661936, -0.63578653, -0.29593682, 0.06421304, 0.21852458,
    -0.581239, -0.9466835, -0.9481153, -0.9820945, -0.95968974,
]


def test_debug_analysis():
    """Debug-format snapshot (src/song/mod.rs:710-723 test_debug_analysis)."""
    a = Analysis(_DEBUG_V2_VALUES, FeaturesVersion.VERSION2)
    assert repr(a) == (
        "Analysis (Version 2) { Tempo: 0.3846389, Zcr: -0.849141, "
        "MeanSpectralCentroid: -0.7548105, "
        "StdDeviationSpectralCentroid: -0.8790748, "
        "MeanSpectralRolloff: -0.63258266, "
        "StdDeviationSpectralRolloff: -0.7258959, "
        "MeanSpectralFlatness: -0.775738, "
        "StdDeviationSpectralFlatness: -0.8146726, "
        "MeanLoudness: 0.2716726, StdDeviationLoudness: 0.25779057, "
        "Chroma1: -0.34292513, Chroma2: -0.62803423, Chroma3: -0.28095096, "
        "Chroma4: 0.08686459, Chroma5: 0.24446082, Chroma6: -0.5723257, "
        "Chroma7: 0.23292065, Chroma8: 0.19981146, Chroma9: -0.58594406, "
        "Chroma10: -0.06784296, Chroma11: -0.06000763, "
        "Chroma12: -0.58485717, Chroma13: -0.07880378 } /* [0.3846389, "
        "-0.849141, -0.7548105, -0.8790748, -0.63258266, -0.7258959, "
        "-0.775738, -0.8146726, 0.2716726, 0.25779057, -0.34292513, "
        "-0.62803423, -0.28095096, 0.08686459, 0.24446082, -0.5723257, "
        "0.23292065, 0.19981146, -0.58594406, -0.06784296, -0.06000763, "
        "-0.58485717, -0.07880378] */"
    )


def test_debug_analysis_v1():
    """(src/song/mod.rs:725-746 test_debug_analysis_v1)."""
    a = Analysis(_DEBUG_V1_VALUES, FeaturesVersion.VERSION1)
    assert repr(a) == (
        "Analysis (Version 1) { Tempo: 0.3846389, Zcr: -0.849141, "
        "MeanSpectralCentroid: -0.7548105, "
        "StdDeviationSpectralCentroid: -0.8790748, "
        "MeanSpectralRolloff: -0.63258266, "
        "StdDeviationSpectralRolloff: -0.7258959, "
        "MeanSpectralFlatness: -0.775738, "
        "StdDeviationSpectralFlatness: -0.8146726, "
        "MeanLoudness: 0.2716726, StdDeviationLoudness: 0.25779057, "
        "Chroma1: -0.35661936, Chroma2: -0.63578653, Chroma3: -0.29593682, "
        "Chroma4: 0.06421304, Chroma5: 0.21852458, Chroma6: -0.581239, "
        "Chroma7: -0.9466835, Chroma8: -0.9481153, Chroma9: -0.9820945, "
        "Chroma10: -0.95968974 } /* [0.3846389, -0.849141, -0.7548105, "
        "-0.8790748, -0.63258266, -0.7258959, -0.775738, -0.8146726, "
        "0.2716726, 0.25779057, -0.35661936, -0.63578653, -0.29593682, "
        "0.06421304, 0.21852458, -0.581239, -0.9466835, -0.9481153, "
        "-0.9820945, -0.95968974] */"
    )


def test_debug_analysis_matches_golden_pipeline(data_dir):
    """The end-to-end repr agrees with the reference snapshot once values
    are within the pipeline's 1e-5 tolerance: same shape, names, and
    value-prefix agreement on every field."""
    song = FFmpegDecoder.song_from_path(data_dir / "s16_mono_22_5kHz.flac")
    r = repr(song.analysis)
    assert r.startswith("Analysis (Version 2) { Tempo: 0.38463")
    assert " /* [" in r and r.endswith("] */")


def test_analysis_padding_invariant(decoded_s16_mono):
    """The same samples analyzed inside different padded buckets must give
    identical features — the masking must fully isolate the padding."""
    import jax.numpy as jnp

    from bliss_tpu.models.analyzer import analyze_samples

    n = decoded_s16_mono.shape[0]
    outs = []
    for padded in (262144, 393216):
        buf = np.zeros(padded, np.float32)
        buf[:n] = decoded_s16_mono
        outs.append(np.asarray(analyze_samples(jnp.asarray(buf), n)))
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-6)


def test_song_distance():
    """src/song/mod.rs test_song_distance: Song-level distance delegates
    to the version's default metric (sqrt(20) = 4.472136)."""
    n = FeaturesVersion.VERSION1.feature_count
    a = Song(
        path=pathlib.Path("a"),
        analysis=Analysis(np.zeros(n, np.float32), FeaturesVersion.VERSION1),
    )
    b = Song(
        path=pathlib.Path("b"),
        analysis=Analysis(np.ones(n, np.float32), FeaturesVersion.VERSION1),
    )
    assert abs(a.distance(b) - 4.472136) < 1e-6


def test_song_distance_mismatched_versions():
    """src/song/mod.rs test_song_distance_mismatched_versions."""
    a = Song(
        path=pathlib.Path("a"),
        analysis=Analysis(
            np.zeros(FeaturesVersion.VERSION1.feature_count, np.float32),
            FeaturesVersion.VERSION1,
        ),
    )
    b = Song(
        path=pathlib.Path("b"),
        analysis=Analysis(
            np.zeros(FeaturesVersion.VERSION2.feature_count, np.float32),
            FeaturesVersion.VERSION2,
        ),
    )
    with pytest.raises(ProviderError, match="Mismatched features version"):
        a.distance(b)


def test_debug_analysis_wrong_number_fields():
    """src/song/mod.rs test_debug_analysis_wrong_number_fields: a
    mismatched field count Debug-formats with 'Version ?' and raw values
    only."""
    a = Analysis.__new__(Analysis)
    a._vec = np.zeros(10, np.float32)
    a.features_version = FeaturesVersion.VERSION1
    assert repr(a) == (
        "Analysis (Version ?) /* [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, "
        "0.0, 0.0] */"
    )
