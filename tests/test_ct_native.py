"""CT-native consumer equivalence (CPU-checkable half of BLISS_CT_NATIVE).

The production path feeds the CT kernel's untouched `[n2, fpad, 128]`
output block to layout-aware consumers instead of paying the bin-major
post-transpose (PERF.md round 4). The kernel itself is TPU-only, but the
consumers are plain XLA: these tests rebuild a synthetic native block
from a bin-major spectrum (element `[k2, f, k1]` = bin `k1*n2 + k2`,
rfft-mirror positions filled with the mirrored magnitude, pad frames
with garbage) and assert the consumers reproduce the transposed path —
bit-identically for the band/max/tuning, tightly for the chroma matmul
(whose Neumaier chunk grouping differs: k2-major 512-bin chunks vs
contiguous 512-bin chunks).

On-chip, `tests/test_tpu_parity.py` + the full-corpus drift contract
cover the real kernel output end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bliss_tpu.models import chroma as chroma_model
from bliss_tpu.ops import pallas_dft

WINDOW = chroma_model.WINDOW_SIZE  # 8192
N2 = WINDOW // 128  # 64
N_BINS = WINDOW // 2 + 1  # 4097
LANES = 128


def _native_block(spec: np.ndarray, fpad: int) -> np.ndarray:
    """[N2, fpad, 128] native CT block from a bin-major [4097, F] spectrum.

    Mirror positions (bin > 4096) get the mirrored-bin magnitude; frame
    columns past F get garbage (large values, to catch missing masks).
    """
    n_frames = spec.shape[1]
    out3 = np.full((N2, fpad, LANES), 7.7e7, np.float32)
    for k1 in range(LANES):
        for k2 in range(N2):
            b = k1 * N2 + k2
            src = b if b <= WINDOW // 2 else WINDOW - b
            if src < N_BINS:
                out3[k2, :n_frames, k1] = spec[src]
    return out3


@pytest.fixture(scope="module")
def spec_pair():
    rng = np.random.default_rng(7)
    n_frames = 37
    fpad = 64  # kernel pads frames to a multiple of fblock
    spec = (rng.random((N_BINS, n_frames), np.float32) ** 4) * 3.0
    # plant unambiguous peaks in the pitch band so tuning is nontrivial
    for f in range(n_frames):
        spec[100 + 11 * (f % 50), f] = 5.0 + f * 0.01
    return spec, _native_block(spec, fpad), n_frames


def test_ct_band_spectrum_bit_exact(spec_pair):
    spec, out3, n_frames = spec_pair
    beginning, end = chroma_model._pitch_band(WINDOW)
    k1_count = (end - 1) // N2 + 1
    band = np.asarray(
        pallas_dft.ct_band_spectrum(jnp.asarray(out3), k1_count)
    )[:, :n_frames]
    assert band.shape[0] >= end
    np.testing.assert_array_equal(band, spec[: k1_count * N2])


def test_ct_valid_max_bit_exact(spec_pair):
    spec, out3, n_frames = spec_pair
    ref = np.max(spec, axis=0)
    got = np.asarray(pallas_dft.ct_valid_max(jnp.asarray(out3), WINDOW))
    np.testing.assert_array_equal(got[:n_frames], ref)


def test_estimate_tuning_band_identical(spec_pair):
    spec, out3, n_frames = spec_pair
    frame_mask = jnp.arange(n_frames) < (n_frames - 4)
    full = chroma_model.estimate_tuning(
        jnp.asarray(spec), frame_mask, WINDOW
    )
    beginning, end = chroma_model._pitch_band(WINDOW)
    k1_count = (end - 1) // N2 + 1
    band = pallas_dft.ct_band_spectrum(jnp.asarray(out3), k1_count)[
        :, :n_frames
    ]
    ref_max = pallas_dft.ct_valid_max(jnp.asarray(out3), WINDOW)[:n_frames]
    banded = chroma_model.estimate_tuning(
        band, frame_mask, WINDOW, ref_max=ref_max
    )
    assert float(full) == float(banded)


def test_chroma_stft_native_matches_transposed(spec_pair):
    spec, out3, n_frames = spec_pair
    tuning = jnp.asarray(-0.07, jnp.float32)
    want = np.asarray(
        chroma_model.chroma_stft_from_spectrum(
            jnp.asarray(spec), tuning, WINDOW
        )
    )
    got = np.asarray(
        chroma_model.chroma_stft_from_native(
            jnp.asarray(out3), tuning, WINDOW
        )
    )[:, :n_frames]
    # same 23 MACs per output in a different Neumaier chunk grouping
    np.testing.assert_allclose(got, want, atol=3e-6, rtol=3e-6)
    assert np.isfinite(
        np.asarray(
            chroma_model.chroma_stft_from_native(
                jnp.asarray(out3), tuning, WINDOW
            )
        )
    ).all()  # pad-frame garbage must not produce NaN/inf columns


def test_chroma_features_native_flag_cpu_noop(monkeypatch, spec_pair):
    """On CPU the native gate must stay closed (golden parity path)."""
    monkeypatch.setenv("BLISS_CT_NATIVE", "1")
    from bliss_tpu.ops.spectral import _use_pallas_ct

    assert jax.default_backend() == "cpu"
    assert not _use_pallas_ct(WINDOW)
