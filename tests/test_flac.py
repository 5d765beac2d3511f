"""Pure-Python FLAC decoder + FallbackDecoder tests.

Mirrors the reference's second-decode-stack methodology
(symphonia.rs:701-750: cross-decoder mean-abs tolerances with equal
lengths; song/mod.rs:636-689: golden vector via the fallback stack) and
adds FLAC's own STREAMINFO MD5 as a decoder-correctness oracle.
"""

import shutil

import numpy as np
import pytest

from bliss_tpu.errors import DecodingError
from bliss_tpu.io.decoder import FFmpegDecoder
from bliss_tpu.io.fallback import FallbackDecoder, FlacDecoder
from bliss_tpu.io.flac import MAX_DECODE_RETRIES, read_flac, verify_md5

ALL_FLAC = [
    "s16_mono_22_5kHz.flac",
    "s16_stereo_22_5kHz.flac",
    "s16_mono_44_1_kHz.flac",
    "s32_mono_44_1_kHz.flac",
    "s32_stereo_44_1_kHz.flac",
    "tone_11080Hz.flac",
    "piano.flac",
    "no_tags.flac",
    "testcue.flac",
]


@pytest.mark.parametrize("name", ALL_FLAC)
def test_flac_md5_oracle(data_dir, name):
    """The decoded PCM matches STREAMINFO's MD5 — bit-exact decode."""
    assert verify_md5(data_dir / name)


@pytest.mark.parametrize(
    "name,tol",
    [
        # mirror of the reference tolerance table (symphonia.rs:701-750);
        # our same-rate FLAC decode is bit-exact so ε-class rows use the
        # f32-epsilon-scale bound literally
        ("piano.flac", np.finfo(np.float32).eps),
        ("s16_mono_22_5kHz.flac", np.finfo(np.float32).eps),
        ("s16_stereo_22_5kHz.flac", np.finfo(np.float32).eps),
        ("s16_mono_44_1_kHz.flac", 1e-5),
        ("s32_mono_44_1_kHz.flac", 1e-5),
        ("s32_stereo_44_1_kHz.flac", 1e-5),
        ("tone_11080Hz.flac", 0.175),
        ("no_tags.flac", 0.175),
    ],
)
def test_flac_cross_decoder_tolerance(data_dir, name, tol):
    ours = FlacDecoder.decode(data_dir / name).sample_array
    ffmpeg = FFmpegDecoder.decode(data_dir / name).sample_array
    assert len(ours) == len(ffmpeg), name  # symphonia.rs:732-737
    assert float(np.abs(ours - ffmpeg).mean()) < tol


def test_flac_tags(data_dir):
    song = FlacDecoder.decode(data_dir / "s16_mono_22_5kHz.flac")
    assert song.title == "Renaissance"
    assert song.artist == "David TMX"
    assert song.album == "Renaissance"
    assert song.track_number == 2
    no_tags = FlacDecoder.decode(data_dir / "no_tags.flac")
    assert no_tags.title is None and no_tags.artist is None


def test_flac_corrupt_frame_resync(data_dir, tmp_path):
    """A corrupted mid-stream frame is skipped (≤3 retries) and the rest
    of the stream still decodes (symphonia.rs:159-179 semantics)."""
    src = data_dir / "s16_mono_22_5kHz.flac"
    clean, rate, bps, _, _ = read_flac(src)
    data = bytearray(src.read_bytes())
    # corrupt a bit in the middle of the audio region (past metadata)
    data[len(data) // 2] ^= 0xFF
    bad = tmp_path / "corrupt.flac"
    bad.write_bytes(bytes(data))
    pcm, rate2, _, _, _ = read_flac(bad)
    assert rate2 == rate
    # one frame (≤65536 samples) may be lost; the rest must survive
    assert pcm.shape[0] >= clean.shape[0] - 65536
    assert pcm.shape[0] <= clean.shape[0]


def test_flac_too_corrupt_raises(data_dir, tmp_path):
    src = data_dir / "s16_mono_22_5kHz.flac"
    data = bytearray(src.read_bytes())
    # trash a long stretch: more than MAX_DECODE_RETRIES frames die
    start = len(data) // 3
    for i in range(start, min(len(data), start + 200_000), 97):
        data[i] ^= 0x5A
    bad = tmp_path / "verycorrupt.flac"
    bad.write_bytes(bytes(data))
    with pytest.raises(DecodingError):
        read_flac(bad)
    assert MAX_DECODE_RETRIES == 3


def test_flac_missing_and_invalid(tmp_path):
    with pytest.raises(DecodingError, match="No such file"):
        FlacDecoder.decode(tmp_path / "nope.flac")
    junk = tmp_path / "junk.flac"
    junk.write_bytes(b"this is not a flac file at all")
    with pytest.raises(DecodingError):
        FlacDecoder.decode(junk)


def test_fallback_decoder_dispatch(data_dir, tmp_path):
    flac = FallbackDecoder.decode(data_dir / "piano.flac")
    wav = FallbackDecoder.decode(data_dir / "piano.wav")
    assert flac.sample_array.size and wav.sample_array.size
    # magic sniffing for extensionless copies
    noext = tmp_path / "mystery"
    shutil.copyfile(data_dir / "piano.flac", noext)
    sniffed = FallbackDecoder.decode(noext)
    np.testing.assert_array_equal(sniffed.sample_array, flac.sample_array)
    unknown = tmp_path / "unknown.bin"
    unknown.write_bytes(b"\x89PNG not audio at all")
    with pytest.raises(DecodingError, match="unsupported format"):
        FallbackDecoder.decode(unknown)


def test_golden_vector_via_fallback(data_dir):
    """End-to-end analysis through the FFI-free stack matches the golden
    vector (reference symphonia variant: song/mod.rs:636-689)."""
    song = FallbackDecoder.song_from_path(data_dir / "s16_mono_22_5kHz.flac")
    golden = [
        0.3846389, -0.849141, -0.75481045, -0.8790748, -0.63258266,
        -0.7258959, -0.7757379, -0.8146726, 0.2716726, 0.25779057,
        -0.34292513, -0.62803423, -0.28095096, 0.08686459, 0.24446082,
        -0.5723257, 0.23292065, 0.19981146, -0.58594406, -0.06784296,
        -0.06000763, -0.58485717, -0.07880378,
    ]
    np.testing.assert_allclose(song.analysis.as_vec(), golden, atol=1e-5)
    assert song.title == "Renaissance"
