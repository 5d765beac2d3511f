"""CUE-sheet tests vs the reference (src/cue.rs:248-674)."""

import pathlib

import numpy as np
import pytest

from bliss_tpu import FeaturesVersion
from bliss_tpu.cue import BlissCue, parse_cue
from bliss_tpu.errors import BlissError, DecodingError
from bliss_tpu.io.decoder import FFmpegDecoder
from bliss_tpu.song import Song


def test_parse_cue(data_dir):
    sheet = parse_cue(data_dir / "testcue.cue")
    assert sheet.performer == "Polochon_street"
    assert sheet.title == "Album for CUE test"
    assert ("GENRE", "Random") in sheet.comments
    assert ("DISCNUMBER", "1") in sheet.comments
    assert len(sheet.files) == 2
    assert sheet.files[0].file == "testcue.flac"
    assert len(sheet.files[0].tracks) == 3
    t2 = sheet.files[0].tracks[1]
    assert t2.title == "Piano"
    assert t2.indices[0][1] == pytest.approx(11 + 5 / 75.0)


def test_songs_from_path(data_dir):
    results = BlissCue.songs_from_path(
        FFmpegDecoder, data_dir / "testcue.cue"
    )
    # 3 songs from testcue.flac + 1 error for not-existing.wav
    songs = [r for r in results if isinstance(r, Song)]
    errors = [r for r in results if isinstance(r, BlissError)]
    assert len(songs) == 3
    assert len(errors) == 1

    first = songs[0]
    assert first.title == "Renaissance"
    assert first.artist == "David TMX"
    assert first.album == "Album for CUE test"
    assert first.album_artist == "Polochon_street"
    assert first.genre == "Random"
    assert first.disc_number == 1
    assert first.track_number == 1
    assert str(first.path).endswith("testcue.cue/CUE_TRACK001")
    assert first.cue_info is not None
    assert first.cue_info.audio_file_path.name == "testcue.flac"
    assert first.duration == pytest.approx(11 + 5 / 75.0, abs=0.01)

    # golden vectors from the reference CUE test (src/cue.rs:272-303)
    expected_first = [
        0.38463724, -0.85219246, -0.761946, -0.8904667, -0.63892543,
        -0.73945934, -0.80040205, -0.82372904, 0.33865356, 0.32481194,
        -0.3433048, -0.6278722, -0.2809375, 0.08685577, 0.24455929,
        -0.5721703, 0.23292911, 0.19979906, -0.5859135, -0.06785172,
        -0.05990714, -0.58482605, -0.078823924,
    ]
    np.testing.assert_allclose(
        songs[0].analysis.as_vec(), expected_first, atol=1e-5
    )


def test_empty_cue(data_dir):
    results = BlissCue.songs_from_path(FFmpegDecoder, data_dir / "empty.cue")
    # empty.wav → "empty audio file" error; not-existing.wav → decode error
    assert isinstance(results[0], DecodingError)
    assert "empty audio file" in str(results[0])


def test_no_tags_cue(data_dir):
    results = BlissCue.songs_from_path(
        FFmpegDecoder, data_dir / "no-tags-cue.cue"
    )
    songs = [r for r in results if isinstance(r, Song)]
    assert len(songs) == 3
    assert songs[0].album is None
    assert songs[0].genre is None
    assert songs[0].disc_number is None


def test_analyze_paths_with_cue(data_dir):
    from bliss_tpu.song import AnalysisOptions

    results = list(
        FFmpegDecoder.analyze_paths(
            [
                data_dir / "nonexistent",
                data_dir / "piano.flac",
                data_dir / "nonexistent.cue",
            ],
            AnalysisOptions(number_cores=2),
        )
    )
    ok = [isinstance(r, Song) for _, r in results]
    assert ok == [False, True, False]
