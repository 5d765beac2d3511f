"""Sequence-parallel chroma: sharded vs single-device parity on the
8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bliss_tpu.models.chroma import chroma_features
from bliss_tpu.parallel import make_mesh
from bliss_tpu.parallel.longsong import sharded_chroma_features


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh(8, axis="time")


def _single(signal, length):
    return np.asarray(
        chroma_features(jnp.asarray(signal), length, 2, jnp.float32)
    )


def test_sharded_matches_single_synthetic(mesh):
    rng = np.random.default_rng(0)
    t = 8 * 32768  # 262144, ~12 s
    sig = (rng.normal(size=t) * 0.1).astype(np.float32)
    # a musical-ish component so features are non-degenerate
    sig += 0.3 * np.sin(
        2 * np.pi * 440.0 * np.arange(t) / 22050.0
    ).astype(np.float32)
    out = sharded_chroma_features(mesh, sig, t)
    ref = _single(sig, t)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_sharded_masked_length(mesh):
    rng = np.random.default_rng(1)
    t = 8 * 32768
    length = t - 50000
    sig = np.zeros(t, np.float32)
    sig[:length] = (rng.normal(size=length) * 0.1).astype(np.float32)
    out = sharded_chroma_features(mesh, sig, length)
    ref = _single(sig, length)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_sharded_real_song(mesh, decoded_s16_mono):
    t = 8 * 32768
    sig = np.zeros(t, np.float32)
    n = decoded_s16_mono.shape[0]
    sig[:n] = decoded_s16_mono
    out = sharded_chroma_features(mesh, sig, n)
    ref = _single(sig, n)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_sharded_non_divisible_length(mesh):
    """T not a mesh multiple: the pad+mask path must match exactly."""
    rng = np.random.default_rng(3)
    t = 8 * 32768 + 12345  # ragged
    sig = (rng.normal(size=t) * 0.1).astype(np.float32)
    sig += 0.2 * np.sin(
        2 * np.pi * 523.25 * np.arange(t) / 22050.0
    ).astype(np.float32)
    out = sharded_chroma_features(mesh, sig, t)
    ref = _single(sig, t)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_sharded_short_signal(mesh):
    """A signal shorter than mesh*min-shard still works (pad-to-viable)."""
    rng = np.random.default_rng(4)
    t = 30011  # < 8 * (8192+2205)
    sig = (rng.normal(size=t) * 0.1).astype(np.float32)
    out = sharded_chroma_features(mesh, sig, t)
    ref = _single(sig, t)
    np.testing.assert_allclose(out, ref, atol=2e-5)


# ---------------------------------------------------------------------------
# round 5: full-pipeline sequence parallelism + production routing
# ---------------------------------------------------------------------------

from bliss_tpu.models.analyzer import analyze_samples
from bliss_tpu.parallel.longsong import sharded_analyze_samples


def _single_full(signal, length, version=2):
    import functools

    fn = jax.jit(functools.partial(analyze_samples, version=version))
    return np.asarray(fn(jnp.asarray(signal), length))


def _musical(t, seed):
    rng = np.random.default_rng(seed)
    sig = (rng.normal(size=t) * 0.08).astype(np.float32)
    n = np.arange(t, dtype=np.float32)
    sig += 0.3 * np.sin(2 * np.pi * 220.0 * n / 22050.0).astype(np.float32)
    # beats so the tempo path has real structure
    env = (0.4 + 0.6 * (np.sin(2 * np.pi * 2.0 * n / 22050.0) > 0)).astype(
        np.float32
    )
    return sig * env


def test_sharded_full_pipeline(mesh):
    """All 23 features sharded == single device (45 s exercises frame
    ownership across every shard boundary — the equal-frames split this
    replaced drifted 3e-4 here)."""
    t = 45 * 22050
    sig = _musical(t, 10)
    out = sharded_analyze_samples(mesh, sig, t)
    ref = _single_full(sig, t)
    assert out.shape == (23,)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_sharded_full_pipeline_ragged(mesh):
    """Masked length + version 1 vectors."""
    t = 20 * 22050 + 7777
    length = t - 31234
    sig = np.zeros(t, np.float32)
    sig[:length] = _musical(length, 11)
    out = sharded_analyze_samples(mesh, sig, length, version=1)
    ref = _single_full(sig, length, version=1)
    assert out.shape == (20,)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_chroma_45s_regression(mesh):
    """The 45 s chroma case that overran the halo under the old
    equal-frames-per-shard split (measured 2.95e-4) now matches."""
    t = 45 * 22050
    sig = _musical(t, 12)
    out = sharded_chroma_features(mesh, sig, t)
    ref = _single(sig, t)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def _write_wav(path, sig):
    import wave

    s16 = np.clip(sig * 32767, -32768, 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(22050)
        w.writeframes(s16.tobytes())


def test_long_song_routed_through_driver(mesh, tmp_path, monkeypatch):
    """analyze_paths_batched routes songs above the length bound through
    the time-sharded analyzer (io/batch.py place()) and the result
    matches the bucketed path."""
    from bliss_tpu.io.batch import analyze_paths_batched
    from bliss_tpu.io.decoder import FFmpegDecoder
    from bliss_tpu.song import Song

    t = 70 * 22050
    wav = tmp_path / "long.wav"
    _write_wav(wav, _musical(t, 13))

    monkeypatch.setenv("BLISS_LONGSONG_SAMPLES", str(30 * 22050))
    routed = dict(analyze_paths_batched(FFmpegDecoder, [wav]))[wav]
    assert isinstance(routed, Song), routed

    monkeypatch.setenv("BLISS_LONGSONG_SAMPLES", str(10**9))
    bucketed = dict(analyze_paths_batched(FFmpegDecoder, [wav]))[wav]

    np.testing.assert_allclose(
        np.asarray(routed.analysis.as_arr1()),
        np.asarray(bucketed.analysis.as_arr1()),
        atol=2e-5,
    )


def test_long_song_through_library(mesh, tmp_path, monkeypatch):
    """Library.update_library ingests a routed long song end-to-end
    (the production entry point, bliss-rs src/library.rs:895-909).
    A 60-min WAV runs the same code path; BLISS_SLOW=1 runs it full
    scale (recorded once in PERF.md)."""
    import os
    import wave

    from bliss_tpu.io.decoder import FFmpegDecoder
    from bliss_tpu.library import BaseConfig, Library

    minutes = 60 if os.environ.get("BLISS_SLOW") == "1" else 2
    t = minutes * 60 * 22050
    music_dir = tmp_path / "music"
    music_dir.mkdir()
    wav = music_dir / "epic.wav"
    _write_wav(wav, _musical(t, 14))
    monkeypatch.setenv("BLISS_LONGSONG_SAMPLES", str(60 * 22050))

    config = BaseConfig(
        config_path=tmp_path / "config.json",
        database_path=tmp_path / "songs.db",
    )
    lib = Library(config, FFmpegDecoder)
    lib.update_library([wav], delete_everything_else=False)
    songs = lib.songs_from_library()
    assert len(songs) == 1
    feats = np.asarray(songs[0].bliss_song.analysis.as_arr1())
    with wave.open(str(wav)) as w:
        pcm = np.frombuffer(w.readframes(t), np.int16)
    ref = _single_full(pcm.astype(np.float32) / 32768.0, t)
    np.testing.assert_allclose(feats, ref, atol=2e-5)
