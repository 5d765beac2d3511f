"""Pallas fused framing+DFT kernel: interpreter + hardware validation.

The slab-blocked kernel (ops/pallas_dft.py) is production on TPU; CPU
tests run it in interpreter mode, and BLISS_TEST_TPU=1 additionally
validates + times it on the real chip.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from bliss_tpu.ops.pallas_dft import pallas_frame_dft_mags, supported
from bliss_tpu.ops.windows import hann_periodic


def _ref_mags(sig, window, hop, n_frames):
    frames = np.stack(
        [sig[i * hop : i * hop + window] for i in range(n_frames)]
    ) * np.asarray(hann_periodic(window))
    return np.abs(np.fft.rfft(frames, axis=-1))


@pytest.mark.skipif(
    os.environ.get("BLISS_TEST_TPU") == "1",
    reason="interpret-mode pass is the CPU suite's job; on the axon "
    "backend it jit-compiles the harness through the slow tunnel",
)
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
    np.testing.assert_allclose(
        out, _ref_mags(sig, window, hop, n_frames), atol=5e-6
    )


def test_supported_predicate():
    from bliss_tpu.ops.pallas_dft import supported_ct

    assert supported(512, 128)
    assert supported(512, 256)
    assert not supported(8192, 2205)
    assert supported_ct(8192)
    assert not supported_ct(512)
    assert not supported_ct(8191)


@pytest.mark.skipif(
    os.environ.get("BLISS_TEST_TPU") == "1",
    reason="interpret-mode pass is the CPU suite's job",
)
def test_ct_interpret_matches_rfft():
    from bliss_tpu.ops.pallas_dft import pallas_stft_mags_ct

    rng = np.random.default_rng(3)
    w, f = 8192, 37  # f deliberately not a multiple of the frame block
    frames = (rng.normal(size=(f, w)) * 0.1).astype(np.float32)
    got = np.asarray(
        pallas_stft_mags_ct(jnp.asarray(frames), n_frames=f, interpret=True)
    )
    want = np.abs(
        np.fft.rfft(frames * np.asarray(hann_periodic(w)), axis=-1)
    ).T
    assert got.shape == (w // 2 + 1, f)
    rel = np.abs(got - want).max() / want.max()
    assert rel < 1e-5, rel


@pytest.mark.skipif(
    os.environ.get("BLISS_TEST_TPU") == "1",
    reason="interpret-mode pass is the CPU suite's job",
)
def test_timbral_fused_interpret_matches_unfused():
    """Fused descriptor kernel reductions == the mags-materializing path."""
    from bliss_tpu.ops.pallas_dft import pallas_frame_dft_timbral
    from bliss_tpu.ops.reductions import geometric_mean
    from bliss_tpu.ops.spectral import pvoc_mags_buggy

    window, hop, n_frames = 512, 128, 200
    rng = np.random.default_rng(4)
    sig = (rng.normal(size=hop * (n_frames + 10)) * 0.1).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        raw = np.asarray(
            pallas_frame_dft_timbral(jnp.asarray(sig), window, hop, n_frames)
        )
    frames = np.stack(
        [sig[i * hop : i * hop + window] for i in range(n_frames)]
    )
    mags = np.asarray(pvoc_mags_buggy(jnp.asarray(frames)))
    n_bins = mags.shape[-1]
    np.testing.assert_allclose(raw[:, 0], mags.sum(-1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        raw[:, 1], (mags * np.arange(n_bins)).sum(-1), rtol=1e-4, atol=1e-4
    )
    sq = mags * mags
    cum = np.cumsum(sq, -1)
    below = (cum < 0.95 * cum[:, -1:]).sum(-1)
    np.testing.assert_allclose(raw[:, 2], below, atol=1)
    geo = np.asarray(geometric_mean(jnp.asarray(mags), axis=-1))
    np.testing.assert_allclose(
        np.exp2(raw[:, 3] / n_bins), geo, rtol=1e-3, atol=1e-7
    )
    np.testing.assert_allclose(raw[:, 4], cum[:, -1], rtol=1e-4, atol=1e-6)


@pytest.mark.skipif(
    os.environ.get("BLISS_TEST_TPU") == "1",
    reason="interpret-mode pass is the CPU suite's job",
)
def test_tuning_fused_interpret_matches_unfused():
    """Fused tuning estimator (paired 16-bit bisect + key-space
    threshold histogram) == the unfused estimate_tuning, bit-exact."""
    from bliss_tpu.models.chroma import (
        _estimate_tuning_fused,
        estimate_tuning,
    )

    bins, frames = 4097, 173
    fmask = np.ones(frames, bool)
    fmask[-7:] = False
    for seed in range(3):
        rng = np.random.default_rng(seed)
        # sparse sharp peaks over a noise floor: realistic pip density
        spec = (rng.random((bins, frames)) ** 8).astype(np.float32)
        spec[rng.integers(0, bins, 400), rng.integers(0, frames, 400)] += (
            rng.random(400).astype(np.float32) * 20.0
        )
        got = _estimate_tuning_fused(
            jnp.asarray(spec), jnp.asarray(fmask), 8192, interpret=True
        )
        want = estimate_tuning(jnp.asarray(spec), jnp.asarray(fmask), 8192)
        assert float(got) == float(want), (seed, float(got), float(want))
    # degenerate: silence -> no peaks -> 0.0
    z = np.zeros((bins, frames), np.float32)
    got = _estimate_tuning_fused(
        jnp.asarray(z), jnp.asarray(fmask), 8192, interpret=True
    )
    assert float(got) == 0.0


@pytest.mark.skipif(
    os.environ.get("BLISS_TEST_TPU") == "1",
    reason="interpret-mode pass is the CPU suite's job",
)
def test_specflux_fused_interpret_matches_unfused():
    from bliss_tpu.models.tempo import onset_function
    from bliss_tpu.ops.pallas_dft import pallas_frame_dft_specflux
    from bliss_tpu.ops.spectral import pvoc_mags

    window, hop, n_frames = 512, 256, 300
    rng = np.random.default_rng(5)
    sig = (rng.normal(size=hop * (n_frames + 5)) * 0.1).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            pallas_frame_dft_specflux(jnp.asarray(sig), window, hop, n_frames)
        )
    frames = np.stack(
        [sig[i * hop : i * hop + window] for i in range(n_frames)]
    )
    mags = pvoc_mags(jnp.asarray(frames))
    want = np.asarray(onset_function(mags))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(
    os.environ.get("BLISS_TEST_TPU") != "1",
    reason="hardware kernel test needs BLISS_TEST_TPU=1 (real TPU)",
)
@pytest.mark.parametrize("window,hop", [(512, 128), (512, 256)])
def test_hardware_matches_rfft(window, hop):
    import jax

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(1)
    sig = (rng.normal(size=1 << 19) * 0.1).astype(np.float32)
    n_frames = (sig.shape[0] - window) // hop + 1
    out = np.asarray(
        pallas_frame_dft_mags(jnp.asarray(sig), window, hop, n_frames)
    )
    ref = _ref_mags(sig, window, hop, n_frames)
    rel = np.abs(out - ref).max() / ref.max()
    assert rel < 1e-5, rel


@pytest.mark.skipif(
    os.environ.get("BLISS_TEST_TPU") == "1",
    reason="interpret-mode pass is the CPU suite's job",
)
def test_radix_select_interpret_matches_sort():
    """Byte-radix masked quantile == numpy sort-path Midpoint quantile,
    exactly (incl. negatives, duplicates, empty mask)."""
    import jax.numpy as jnp

    from bliss_tpu.ops.pallas_select import masked_quantile_midpoint_radix

    rng = np.random.default_rng(8)
    densities = [0.9, 0.5, 0.1, 0.5, 1.0, 0.0]
    for trial, density in enumerate(densities):
        r, c = int(rng.integers(3, 40)), int(rng.integers(3, 300))
        v = (rng.normal(0, 1, (r, c)) * 10.0 ** float(
            rng.integers(-3, 3)
        )).astype(np.float32)
        if trial == 3:
            v = np.round(v)  # force duplicates
        m = rng.random((r, c)) < density
        got = float(
            masked_quantile_midpoint_radix(
                jnp.asarray(v), jnp.asarray(m), 0.5, interpret=True
            )
        )
        sel = np.sort(v[m])
        if sel.size == 0:
            assert np.isinf(got)
            continue
        pos = (sel.size - 1) * 0.5
        want = 0.5 * (sel[int(np.floor(pos))] + sel[int(np.ceil(pos))])
        assert got == want, (trial, got, want)


@pytest.mark.skipif(
    os.environ.get("BLISS_TEST_TPU") != "1",
    reason="hardware kernel test needs BLISS_TEST_TPU=1 (real TPU)",
)
def test_hardware_radix_select_matches_bisect():
    import jax
    import jax.numpy as jnp

    from bliss_tpu.ops.pallas_select import masked_quantile_midpoint_radix
    from bliss_tpu.ops.reductions import _kth_smallest_bisect_unrolled_pair

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(9)
    v = (rng.normal(0, 1, (1430, 3329)) ** 3).astype(np.float32)
    m = rng.random((1430, 3329)) < 0.07
    got = float(
        masked_quantile_midpoint_radix(jnp.asarray(v), jnp.asarray(m), 0.5)
    )
    n = int(m.sum())
    k1, k2 = (n - 1) // 2, n // 2
    vlo, vhi = _kth_smallest_bisect_unrolled_pair(
        jnp.asarray(v), jnp.asarray(m), k1, k2
    )
    want = 0.5 * (float(vlo) + float(vhi))
    assert got == want, (got, want)


@pytest.mark.skipif(
    os.environ.get("BLISS_TEST_TPU") != "1",
    reason="hardware kernel test needs BLISS_TEST_TPU=1 (real TPU)",
)
@pytest.mark.parametrize(
    "b16x3,bound",
    [
        (False, 1e-6),  # 6-pass HIGHEST dots
        (True, 1e-5),  # 3-pass bf16x3 (measured ~1.5e-6, PERF r4)
    ],
)
def test_hardware_ct_matches_xla_ct(b16x3, bound):
    """CT-8192 Pallas kernel vs the XLA CT matmul path, on chip."""
    import jax

    from bliss_tpu.ops.dft import _rdft_mags_ct
    from bliss_tpu.ops.pallas_dft import pallas_stft_mags_ct

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(6)
    w, f = 8192, 100
    frames = jnp.asarray(
        (rng.normal(size=(f, w)) * 0.1).astype(np.float32)
    )
    got = np.asarray(pallas_stft_mags_ct(frames, n_frames=f, b16x3=b16x3))
    want = np.asarray(
        _rdft_mags_ct(frames * hann_periodic(w), 4097)
    ).T
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < bound, rel


@pytest.mark.skipif(
    os.environ.get("BLISS_TEST_TPU") != "1",
    reason="hardware kernel test needs BLISS_TEST_TPU=1 (real TPU)",
)
def test_hardware_ct_fused_framing_bit_identical():
    """In-kernel framing CT == XLA framing + frame-consuming CT kernel,
    bit for bit, on chip — including the ragged tail and short signals."""
    import jax

    from bliss_tpu.ops.pallas_dft import (
        pallas_stft_mags_ct,
        pallas_stft_mags_ct_fused,
    )
    from bliss_tpu.ops.windows import (
        frame_signal_reflect,
        n_frames_stft,
        reflect_pad_signal,
    )

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(11)
    w, hop = 8192, 2205
    for t in (22050 * 30, 22050 * 30 + 1234, 9000):
        sig = jnp.asarray((rng.normal(size=t) * 0.1).astype(np.float32))
        nf = int(n_frames_stft(t, hop))
        frames = frame_signal_reflect(sig, t, w, hop, nf)
        ref = np.asarray(pallas_stft_mags_ct(frames, nf))
        padded = reflect_pad_signal(sig, t, w)
        got = np.asarray(pallas_stft_mags_ct_fused(padded, w, hop, nf))
        np.testing.assert_array_equal(got, ref)


@pytest.mark.skipif(
    os.environ.get("BLISS_TEST_TPU") != "1",
    reason="hardware kernel test needs BLISS_TEST_TPU=1 (real TPU)",
)
def test_hardware_fused_descriptor_paths_match():
    """Fused timbral/specflux kernels vs the mags-materializing paths,
    feature-level, on chip."""
    import os as _os

    import jax

    from bliss_tpu.models import tempo as TP
    from bliss_tpu.models import timbral as TB

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(7)
    n = 22050 * 10
    sig = jnp.asarray((rng.normal(size=n) * 0.1).astype(np.float32))
    ln = jnp.int32(n)

    assert TB._use_fused_descriptors() and TP._use_fused_specflux()
    tb_f = np.asarray(jax.jit(TB.spectral_features)(sig, ln))
    tp_f = np.asarray(jax.jit(TP.tempo_feature)(sig, ln))
    _os.environ["BLISS_TIMBRAL_FUSED"] = "0"
    _os.environ["BLISS_TEMPO_FUSED"] = "0"
    try:
        tb_u = np.asarray(jax.jit(lambda s, l: TB.spectral_features(s, l))(sig, ln))
        tp_u = np.asarray(jax.jit(lambda s, l: TP.tempo_feature(s, l))(sig, ln))
    finally:
        _os.environ.pop("BLISS_TIMBRAL_FUSED")
        _os.environ.pop("BLISS_TEMPO_FUSED")
    # the fused kernel's FFT-structured spectrum vs the unfused
    # matmul-DFT legitimately differ at the f32-rounding-noise level
    # (~1e-5 feature scale, deliberate — the flatness contract needs the
    # reference's f32-FFT noise class; see _make_timbral_fft_kernel)
    np.testing.assert_allclose(tb_f, tb_u, atol=5e-5)
    np.testing.assert_allclose(tp_f, tp_u, atol=5e-6)


@pytest.mark.skipif(
    os.environ.get("BLISS_TEST_TPU") != "1",
    reason="hardware kernel test needs BLISS_TEST_TPU=1 (real TPU)",
)
def test_hardware_tuning_fused_matches_radix():
    """Fused tuning estimator == the unfused radix path, bit-exact,
    through chroma_features on chip (both paths are TPU-only)."""
    import os as _os

    import jax

    from bliss_tpu.models.chroma import chroma_features

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(21)
    n = 22050 * 10
    sig = jnp.asarray((rng.normal(size=n) * 0.1).astype(np.float32))
    ln = jnp.int32(n)
    got = np.asarray(jax.jit(chroma_features)(sig, ln))
    _os.environ["BLISS_TUNING_FUSED"] = "0"
    try:
        want = np.asarray(
            jax.jit(lambda s, l: chroma_features(s, l))(sig, ln)
        )
    finally:
        _os.environ.pop("BLISS_TUNING_FUSED")
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(
    os.environ.get("BLISS_TEST_TPU") != "1",
    reason="hardware kernel test needs BLISS_TEST_TPU=1 (real TPU)",
)
def test_hardware_histogram_kernel_exact():
    """Pallas VMEM histogram == exact per-bin counts (incl. sentinel and
    out-of-range values), on chip."""
    from bliss_tpu.ops.pallas_hist import histogram_int_plane

    rng = np.random.default_rng(12)
    for shape in [(1430, 3360), (7, 100), (1, 3360), (2049, 257)]:
        idx = rng.integers(-2, 105, size=shape).astype(np.int32)
        got = np.asarray(histogram_int_plane(jnp.asarray(idx), 100))
        want = np.array([(idx == b).sum() for b in range(100)], np.int32)
        np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(
    os.environ.get("BLISS_TEST_TPU") != "1",
    reason="hardware kernel test needs BLISS_TEST_TPU=1 (real TPU)",
)
def test_hardware_dft_autocorr_matches_toeplitz():
    """Wiener–Khinchin matmul autocorr vs the exact Toeplitz path."""
    import jax

    from bliss_tpu.models.tempo import _autocorr, _autocorr_batch_dft

    rng = np.random.default_rng(13)
    df = jnp.asarray((rng.normal(size=(37, 512)) ** 2).astype(np.float32))
    ref = np.asarray(jax.vmap(_autocorr)(df))
    got = np.asarray(_autocorr_batch_dft(df))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 5e-5, rel


def test_silence_flags_blocked_parity():
    from bliss_tpu.models.tempo import (
        HOP_SIZE,
        WINDOW_SIZE,
        silence_flags,
        silence_flags_blocked,
    )
    from bliss_tpu.ops.windows import frame_signal, n_frames_strided

    rng = np.random.default_rng(2)
    sig = np.zeros(40960, np.float32)
    sig[:20000] = rng.normal(size=20000) * 1e-4  # quiet but not silent mix
    sig[25000:30000] = rng.normal(size=5000).astype(np.float32)
    h_max = int(n_frames_strided(sig.shape[0], WINDOW_SIZE, HOP_SIZE))
    sigj = jnp.asarray(sig)
    a = np.asarray(
        silence_flags(frame_signal(sigj, WINDOW_SIZE, HOP_SIZE, 0, h_max))
    )
    b = np.asarray(silence_flags_blocked(sigj, h_max))
    np.testing.assert_array_equal(a, b)
