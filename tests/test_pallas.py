"""Pallas fused framing+DFT kernel: interpreter-mode validation.

The kernel is experimental on real hardware (see ops/pallas_dft.py
STATUS); the interpreter run checks the shifted-matmul framing math.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from bliss_tpu.ops.pallas_dft import pallas_frame_dft_mags, supported
from bliss_tpu.ops.windows import hann_periodic


@pytest.mark.parametrize("window,hop", [(512, 128), (512, 256)])
def test_interpret_matches_rfft(window, hop):
    assert supported(window, hop)
    rng = np.random.default_rng(0)
    sig = (rng.normal(size=150000) * 0.1).astype(np.float32)
    n_frames = 300
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(
            pallas_frame_dft_mags(jnp.asarray(sig), window, hop, n_frames)
        )
    frames = np.stack(
        [sig[i * hop : i * hop + window] for i in range(n_frames)]
    ) * np.asarray(hann_periodic(window))
    ref = np.abs(np.fft.rfft(frames, axis=-1))
    np.testing.assert_allclose(out, ref, atol=5e-6)


def test_supported_predicate():
    assert supported(512, 128)
    assert supported(512, 256)
    assert not supported(8192, 2205)
