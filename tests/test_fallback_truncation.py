"""Truncation robustness for the FFI-free fallback decoders: a file cut
at ANY byte offset must either decode (partial data) or raise a
BlissError — never hang or escape with a raw exception. Mirrors the
reference's decode-error tolerance (symphonia.rs:159-179 retry loop) and
guards the r2 review fixes (vorbis dim-0 loop, out-of-range mode,
partial-packet NameError)."""

import pathlib

import numpy as np
import pytest

from bliss_tpu.errors import BlissError


FIXTURES = [
    "s16_mono_22_5kHz.flac",
    "s32_stereo_44_1_kHz.mp3",
    "silence.ogg",
    "piano.wav",
]


@pytest.mark.parametrize("name", FIXTURES)
@pytest.mark.parametrize("keep_frac", [0.08, 0.35, 0.72, 0.97])
def test_truncated_file_decodes_or_raises(data_dir, tmp_path, name, keep_frac):
    from bliss_tpu.io.fallback import FallbackDecoder

    src = (data_dir / name).read_bytes()
    cut = tmp_path / name
    cut.write_bytes(src[: max(64, int(len(src) * keep_frac))])
    try:
        out = FallbackDecoder.decode(cut)
    except BlissError:
        return  # clean decode error is acceptable
    # partial decode: sane finite samples, no more than the full file
    samples = np.asarray(out.sample_array)
    assert np.isfinite(samples).all()
    full = np.asarray(FallbackDecoder.decode(data_dir / name).sample_array)
    assert samples.shape[0] <= full.shape[0]


@pytest.mark.parametrize("name", FIXTURES)
def test_bitflipped_file_decodes_or_raises(data_dir, tmp_path, name):
    """Flip a byte in the middle of the stream: resync/retry or clean
    error, never a crash."""
    from bliss_tpu.io.fallback import FallbackDecoder

    src = bytearray((data_dir / name).read_bytes())
    for offset_frac in (0.5, 0.66, 0.8):
        i = int(len(src) * offset_frac)
        mutated = bytearray(src)
        mutated[i] ^= 0xFF
        cut = tmp_path / f"flip_{i}_{name}"
        cut.write_bytes(bytes(mutated))
        try:
            out = FallbackDecoder.decode(cut)
        except BlissError:
            continue
        assert np.isfinite(np.asarray(out.sample_array)).all()
