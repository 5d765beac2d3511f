"""Bit-exact decode tests via adler32 hashes, mirroring the reference
(src/song/decoder/ffmpeg.rs:379-527)."""

import zlib

import numpy as np
import pytest

from bliss_tpu.errors import DecodingError
from bliss_tpu.io.decoder import FFmpegDecoder, _parse_track_number


def _decode_hash(path):
    song = FFmpegDecoder.decode(path)
    return zlib.adler32(np.asarray(song.sample_array, np.float32).tobytes())


@pytest.mark.parametrize(
    "name,expected",
    [
        ("s16_mono_22_5kHz.flac", 0x5E01930B),
        ("s32_mono_44_1_kHz.flac", 0xA0F8B8AF),
        ("s32_stereo_44_1_kHz.flac", 0xBBCBA1CF),
        ("s16_stereo_22_5kHz.flac", 0x1D7B2D6D),
        ("s32_stereo_44_1_kHz.mp3", 0x69CA6906),
        ("no_channel.wav", 0xD594429C),
        ("piano.wav", 0xDE831E82),
    ],
)
def test_decode_hashes(data_dir, name, expected):
    assert _decode_hash(data_dir / name) == expected


def test_tags(data_dir):
    song = FFmpegDecoder.decode(data_dir / "s16_mono_22_5kHz.flac")
    assert song.artist == "David TMX"
    assert song.album_artist == "David TMX - Album Artist"
    assert song.title == "Renaissance"
    assert song.album == "Renaissance"
    assert song.track_number == 2
    assert song.disc_number == 1
    assert song.genre == "Pop"
    assert abs(song.duration * 1000 - 11070.0) < 10.0


def test_special_tags(data_dir):
    song = FFmpegDecoder.decode(data_dir / "special-tags.mp3")
    assert song.disc_number == 2
    assert song.track_number == 6


def test_unsupported_tags(data_dir):
    song = FFmpegDecoder.decode(data_dir / "unsupported-tags.mp3")
    assert song.track_number is None


def test_empty_tags(data_dir):
    song = FFmpegDecoder.decode(data_dir / "no_tags.flac")
    assert song.artist is None
    assert song.title is None
    assert song.album is None
    assert song.track_number is None
    assert song.disc_number is None
    assert song.genre is None


def test_decode_errors(data_dir):
    with pytest.raises(DecodingError):
        FFmpegDecoder.decode("nonexistent")
    with pytest.raises(DecodingError, match="No audio stream"):
        FFmpegDecoder.decode(data_dir / "picture.png")


def test_parse_track_number():
    assert _parse_track_number("02") == 2
    assert _parse_track_number("06/24") == 6
    assert _parse_track_number("02test/05") is None
    assert _parse_track_number(None) is None


def test_decode_capacity_fix_ogg(data_dir):
    """src/song/decoder/ffmpeg.rs test_decode_right_capacity_vec: the
    capacity_fix.ogg fixture decodes fully (the Rust Vec-capacity
    assertions are allocation-strategy specific; here we assert the
    decoded length is sane for the ~10s file)."""
    song = FFmpegDecoder.decode(data_dir / "capacity_fix.ogg")
    n = np.asarray(song.sample_array).shape[0]
    assert n > 5 * 22050
    assert abs(n / 22050 - song.duration) < 1.0


def test_pre_analyzed_song_to_song_empty_fails():
    """src/song/decoder/ffmpeg.rs test_try_from: converting a default
    (sample-less) PreAnalyzedSong into a Song fails."""
    from bliss_tpu.errors import AnalysisError
    from bliss_tpu.io.decoder import PreAnalyzedSong

    with pytest.raises(AnalysisError):
        PreAnalyzedSong().to_song()


def test_analyze_paths_mixed_results(data_dir):
    """src/song/decoder/ffmpeg.rs test_analyze_paths: a nonexistent path
    yields an error, a real song yields a Song."""
    from bliss_tpu.song import Song

    results = dict(
        (str(p), r)
        for p, r in FFmpegDecoder.analyze_paths(
            [data_dir / "nonexistent", data_dir / "piano.flac"]
        )
    )
    assert not isinstance(results[str(data_dir / "nonexistent")], Song)
    assert isinstance(results[str(data_dir / "piano.flac")], Song)


def test_analyze_paths_with_cores(data_dir):
    """src/song/decoder/ffmpeg.rs test_analyze_paths_with_cores: a core
    count far above the machine's works, and a nonexistent CUE errors."""
    from bliss_tpu.song import AnalysisOptions, Song

    opts = AnalysisOptions(number_cores=2**62)
    results = dict(
        (str(p), r)
        for p, r in FFmpegDecoder.analyze_paths_with_options(
            [
                data_dir / "nonexistent",
                data_dir / "piano.flac",
                data_dir / "nonexistent.cue",
            ],
            opts,
        )
    )
    assert isinstance(results[str(data_dir / "piano.flac")], Song)
    assert not isinstance(results[str(data_dir / "nonexistent")], Song)
    assert not isinstance(results[str(data_dir / "nonexistent.cue")], Song)


def test_analyze_paths_empty(data_dir):
    """src/song/decoder/ffmpeg.rs test_analyze_paths_with_cores_empty_paths."""
    from bliss_tpu.song import AnalysisOptions

    assert (
        list(FFmpegDecoder.analyze_paths_with_options([], AnalysisOptions()))
        == []
    )
