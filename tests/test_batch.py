"""Batched-analysis driver tests: parity with the per-song path."""

import numpy as np
import pytest

from bliss_tpu.errors import BlissError
from bliss_tpu.io.batch import analyze_paths_batched
from bliss_tpu.io.decoder import FFmpegDecoder
from bliss_tpu.song import AnalysisOptions, Song


def test_batched_matches_single(data_dir):
    paths = [
        data_dir / "s16_mono_22_5kHz.flac",
        data_dir / "piano.flac",
        data_dir / "s32_stereo_44_1_kHz.mp3",
        data_dir / "nonexistent.flac",
    ]
    batched = dict(analyze_paths_batched(FFmpegDecoder, paths, batch_size=2))
    single = dict(FFmpegDecoder.analyze_paths(paths[:3]))

    assert isinstance(batched[paths[3]], BlissError)
    for p in paths[:3]:
        b, s = batched[p], single[p]
        assert isinstance(b, Song) and isinstance(s, Song)
        np.testing.assert_allclose(
            b.analysis.as_arr1(), s.analysis.as_arr1(), atol=5e-5
        )
        assert b.title == s.title


def test_batched_cue(data_dir):
    results = list(
        analyze_paths_batched(
            FFmpegDecoder, [data_dir / "testcue.cue"], batch_size=4
        )
    )
    songs = [r for _, r in results if isinstance(r, Song)]
    errors = [r for _, r in results if isinstance(r, BlissError)]
    assert len(songs) == 3
    assert len(errors) == 1
    first = min(songs, key=lambda s: str(s.path))
    assert first.title == "Renaissance"
    assert first.cue_info is not None
    expected_first = [
        0.38463724, -0.85219246, -0.761946, -0.8904667, -0.63892543,
        -0.73945934, -0.80040205, -0.82372904, 0.33865356, 0.32481194,
        -0.3433048, -0.6278722, -0.2809375, 0.08685577, 0.24455929,
        -0.5721703, 0.23292911, 0.19979906, -0.5859135, -0.06785172,
        -0.05990714, -0.58482605, -0.078823924,
    ]
    np.testing.assert_allclose(
        first.analysis.as_vec(), expected_first, atol=5e-5
    )


def test_batched_version1(data_dir):
    from bliss_tpu import FeaturesVersion
    from bliss_tpu.song import AnalysisOptions

    opts = AnalysisOptions(features_version=FeaturesVersion.VERSION1)
    results = dict(
        analyze_paths_batched(
            FFmpegDecoder, [data_dir / "s16_mono_22_5kHz.flac"], opts
        )
    )
    (song,) = results.values()
    assert song.features_version == FeaturesVersion.VERSION1
    assert len(song.analysis.as_vec()) == 20
    single = FFmpegDecoder.song_from_path(
        data_dir / "s16_mono_22_5kHz.flac", opts
    )
    np.testing.assert_allclose(
        song.analysis.as_arr1(), single.analysis.as_arr1(), atol=5e-5
    )
