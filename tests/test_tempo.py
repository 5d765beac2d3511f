"""Tempo descriptor tests (src/temporal.rs:87-163).

Note: the reference unit tests feed `chunks_exact(256)`, while the
production path feeds `windows(512).step_by(256)` (src/song/mod.rs:433-443).
The descriptors differ only in the trailing hop and the silence-gate window,
so the chunked expectations hold at the reference's own tolerance.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from bliss_tpu.models.tempo import tempo_feature


def _tempo(samples):
    sig = jnp.asarray(np.asarray(samples, np.float32))
    return float(tempo_feature(sig, sig.shape[0]))


def test_tempo_real(decoded_s16_mono):
    # golden e2e value (src/song/mod.rs:556): windows-path semantics
    assert abs(_tempo(decoded_s16_mono) - 0.3846389) < 1e-5


def test_tempo_artificial():
    # one beat per second = 60 BPM → -0.4168 normalized
    one = np.concatenate([np.zeros(22000, np.float32), np.ones(100, np.float32)])
    sig = np.tile(one, 100)
    assert abs(_tempo(sig) - (-0.416853)) < 0.01


def test_tempo_boundaries():
    # silence → no beats → -1
    assert _tempo(np.zeros(8192, np.float32)) == -1.0
    # high-BPM click track → ~192 BPM → ~0.86
    one = np.concatenate([np.zeros(6989, np.float32), np.ones(20, np.float32)])
    sig = np.tile(one, 500)
    assert abs(_tempo(sig) - 0.86) < 0.01


def test_unroll_invariant_check_mode(monkeypatch):
    """BLISS_CHECKS=1 poisons the beat phase with NaN if the unrolled
    `while beat + bp < 0` bound is ever violated; a normal signal must
    stay finite (the invariant holds)."""
    monkeypatch.setenv("BLISS_CHECKS", "1")
    rng = np.random.default_rng(0)
    t = 1 << 15
    click = np.zeros(t, np.float32)
    click[:: 11025] = 1.0  # 120 BPM click track
    sig = click + 0.01 * rng.normal(size=t).astype(np.float32)
    out = np.asarray(tempo_feature(jnp.asarray(sig), t))
    assert np.isfinite(out)
