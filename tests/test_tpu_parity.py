"""Opt-in real-TPU parity test (BLISS_TEST_TPU=1).

The CPU/f64 path is golden-exact (see test_song.py); the TPU/f32
production path must stay within the BASELINE.md accuracy contract of
<=1e-4 per feature vs the reference golden vector
(/root/reference/src/song/mod.rs:553-591). Measured drift after the
matmul-precision fix (PERF.md round 2): non-chroma <=4e-6, chroma
<=4e-7 — the former 3.9e-4 chroma gap was TPU's default-bf16 matmul in
the chroma-filter product, not DFT accumulation.

The batched TPU driver additionally ships samples over the tunnel in
the block-floating-point wire format (io/batch.py); this fixture is a
straight-s16 source, which that format round-trips bit-exactly, so the
same bound holds end to end.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("BLISS_TEST_TPU") != "1",
    reason="real-TPU parity test; set BLISS_TEST_TPU=1",
)

GOLDEN_V2 = [
    0.3846389, -0.849141, -0.75481045, -0.8790748, -0.63258266,
    -0.7258959, -0.7757379, -0.8146726, 0.2716726, 0.25779057,
    -0.34292513, -0.62803423, -0.28095096, 0.08686459, 0.24446082,
    -0.5723257, 0.23292065, 0.19981146, -0.58594406, -0.06784296,
    -0.06000763, -0.58485717, -0.07880378,
]


def test_tpu_golden_drift(data_dir):
    from bliss_tpu.io.decoder import FFmpegDecoder
    from bliss_tpu.models.analyzer import build_analyzer

    song = FFmpegDecoder.decode(data_dir / "s16_mono_22_5kHz.flac")
    feats = build_analyzer(2)(song.sample_array)
    err = np.abs(feats - np.asarray(GOLDEN_V2))
    assert np.isfinite(feats).all()
    # BASELINE contract is 1e-4; assert 2e-5 (measured 4.2e-6, 5x margin)
    # so precision regressions are caught well inside the contract
    np.testing.assert_array_less(err, 2e-5)


def test_tpu_golden_drift_batched_wire(data_dir):
    """End-to-end through the batched driver incl. the quantized wire."""
    from bliss_tpu.io.batch import analyze_paths_batched
    from bliss_tpu.io.decoder import FFmpegDecoder

    (song,) = dict(
        analyze_paths_batched(
            FFmpegDecoder, [data_dir / "s16_mono_22_5kHz.flac"]
        )
    ).values()
    err = np.abs(song.analysis.as_arr1() - np.asarray(GOLDEN_V2, np.float32))
    # straight-s16 source: the i16b wire is bit-exact, same bound applies
    np.testing.assert_array_less(err, 2e-5)
