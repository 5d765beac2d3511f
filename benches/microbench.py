#!/usr/bin/env python
"""Stage microbenchmarks, mirroring the reference's criterion groups
(bliss-rs benches/: utils, descriptors, chroma, decoder, analysis_pipeline).

Usage: python benches/microbench.py [--backend cpu|device] [--repeat N]
Times are warm medians; compile time is excluded.
"""

import argparse
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

DATA = pathlib.Path(__file__).resolve().parents[1] / "tests" / "data"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--backend", default="device")
    parser.add_argument("--repeat", type=int, default=5)
    args = parser.parse_args()

    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from bliss_tpu.io.decoder import FFmpegDecoder
    from bliss_tpu.models import chroma, loudness, tempo, timbral
    from bliss_tpu.models.analyzer import build_analyzer
    from bliss_tpu.ops import convolve, geometric_mean, reflect_pad, stft

    song = FFmpegDecoder.decode(DATA / "s16_mono_22_5kHz.flac")
    sig = jnp.asarray(song.sample_array)
    n = int(sig.shape[0])

    def bench(name, fn, *fargs):
        jitted = jax.jit(fn)
        _ = np.asarray(jax.tree.leaves(jitted(*fargs))[0])  # compile
        times = []
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            _ = np.asarray(jax.tree.leaves(jitted(*fargs))[0])
            times.append(time.perf_counter() - t0)
        print(f"{name:32s} {statistics.median(times)*1e3:10.2f} ms")

    print(f"backend: {jax.default_backend()}, song: {n} samples")
    print("--- utils")
    bench("stft 2048/512", lambda s: jnp.sum(stft(s, 2048, 512)), sig)
    conv_in = jnp.arange(0.0, 1000.0, 0.5)
    bench("convolve 2000x100", convolve, conv_in, jnp.ones(100))
    bench("geometric_mean 256", geometric_mean, jnp.abs(sig[:256]))
    bench("reflect_pad", lambda s: jnp.sum(reflect_pad(s, 4096)), sig)
    print("--- descriptors")
    bench("timbral (centroid/rolloff/flat)", timbral.spectral_features, sig, n)
    bench("zcr", timbral.zcr_feature, sig, n)
    bench("loudness", loudness.loudness_features, sig, n)
    bench("tempo (full)", tempo.tempo_feature, sig, n)
    bench("chroma (full)", lambda s, m: chroma.chroma_features(s, m, 2), sig, n)
    print("--- chroma stages")
    from bliss_tpu.ops import n_frames_stft

    f = int(n_frames_stft(n, 2205))
    spec = jax.jit(lambda s: stft(s, 8192, 2205, dtype=jnp.float32))(sig)
    mask = jnp.ones((f,), bool)
    bench("chroma: stft 8192/2205", lambda s: jnp.sum(stft(s, 8192, 2205)), sig)
    bench(
        "chroma: estimate_tuning",
        lambda sp, m: chroma.estimate_tuning(sp, m, 8192),
        spec,
        mask,
    )
    bench(
        "chroma: chroma_stft",
        lambda sp: chroma.chroma_stft_from_spectrum(sp, jnp.float32(-0.05), 8192),
        spec,
    )
    ch = jax.jit(
        lambda sp: chroma.chroma_stft_from_spectrum(sp, jnp.float32(-0.05), 8192)
    )(spec)
    bench("chroma: interval features", chroma.chroma_interval_features, ch, mask)
    print("--- decode")
    t0 = time.perf_counter()
    for _ in range(args.repeat):
        FFmpegDecoder.decode(DATA / "s16_mono_22_5kHz.flac")
    print(f"{'decode flac (host)':32s} {(time.perf_counter()-t0)/args.repeat*1e3:10.2f} ms")
    print("--- pipeline")
    analyzer = build_analyzer(2)
    _ = analyzer(song.sample_array)
    times = []
    for _ in range(args.repeat):
        t0 = time.perf_counter()
        _ = analyzer(song.sample_array)
        times.append(time.perf_counter() - t0)
    print(f"{'full analysis (1 song)':32s} {statistics.median(times)*1e3:10.2f} ms")


if __name__ == "__main__":
    main()
