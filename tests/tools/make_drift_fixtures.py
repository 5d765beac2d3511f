#!/usr/bin/env python
"""Generate the round-5 drift-contract fixture set (tests/data/drift/).

The accuracy contract (tests/test_tpu_drift.py) originally enforced
1e-4 on ~20 real-content fixtures; the reference's own envelope spans a
per-codec tolerance matrix incl. resampled lossy sources
(bliss-rs src/song/decoder/symphonia.rs:701-750). This script widens the
real-content corpus to >=35 fixtures:

- three deterministic music-like broadband sources ("band", "perc",
  "vox") at 44.1 kHz stereo (one at 48 kHz), i.e. everything goes
  through the production resample to 22050 mono;
- MP3 / AAC-LC / Vorbis at 2-3 bitrates each (32k..192k);
- a quiet (-42 dBFS) and a hard-clipped FLAC recording;
- a >=20-minute medley (Vorbis) for the long-song production path.

Deterministic (seeded numpy) so the files are reproducible; encoding
uses bliss_tpu/io/native/bliss_encode (libavcodec). Run from repo root:
    python tests/tools/make_drift_fixtures.py
"""

import pathlib
import subprocess
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[2]
OUT = REPO / "tests" / "data" / "drift"
ENC = REPO / "bliss_tpu" / "io" / "native" / "bliss_encode"

SR = 44100


def _env(n, attack, decay, sr=SR):
    """Attack/exp-decay amplitude envelope of n samples."""
    t = np.arange(n) / sr
    a = np.minimum(t / max(attack, 1e-4), 1.0)
    return a * np.exp(-t / decay)


def _note(freq, dur, sr=SR, nharm=12, bright=1.0):
    """Harmonic tone with 1/k**bright rolloff and slight detune."""
    n = int(dur * sr)
    t = np.arange(n) / sr
    out = np.zeros(n)
    for k in range(1, nharm + 1):
        if k * freq > sr / 2 - 1000:
            break
        out += np.sin(2 * np.pi * k * freq * (1 + 0.0003 * (k - 1)) * t) / (
            k**bright
        )
    return out


def _pink(rng, n):
    """Pink-ish noise: cumulative-sum-filtered white noise mix."""
    w = rng.standard_normal(n + 1024)
    b = np.cumsum(w) * 0.02
    b -= np.linspace(b[0], b[-1], len(b))
    return (0.5 * w[1024:] * 0.15 + b[1024:] * 0.5)[:n]


def make_band(dur=28.0, seed=11):
    """Chord progression + bass + melody + drum bursts + noise bed."""
    rng = np.random.default_rng(seed)
    n = int(dur * SR)
    sig = np.zeros(n)
    # i-VI-III-VII in A minor, 2 s per chord
    roots = [220.0, 174.61, 130.81, 196.0]
    triads = [(1, 6 / 5, 3 / 2), (1, 5 / 4, 3 / 2), (1, 5 / 4, 3 / 2), (1, 5 / 4, 3 / 2)]
    beat = 2.0
    pos = 0
    ci = 0
    while pos < n:
        root = roots[ci % 4]
        ln = min(int(beat * SR), n - pos)
        env = _env(ln, 0.02, 1.4)
        for ratio in triads[ci % 4]:
            sig[pos : pos + ln] += 0.10 * env * _note(root * ratio, ln / SR)[:ln]
        # bass an octave down, square-ish (odd harmonics)
        bass = sum(
            np.sin(2 * np.pi * k * root / 2 * np.arange(ln) / SR) / k
            for k in (1, 3, 5)
        )
        sig[pos : pos + ln] += 0.12 * _env(ln, 0.005, 0.9) * bass
        pos += ln
        ci += 1
    # melody: pentatonic walk, eighth notes with vibrato
    scale = [440.0, 523.25, 587.33, 659.25, 783.99]
    pos = 0
    while pos < n:
        f = scale[int(rng.integers(len(scale)))]
        ln = min(int(0.25 * SR), n - pos)
        t = np.arange(ln) / SR
        vib = f * (1 + 0.004 * np.sin(2 * np.pi * 5.5 * t))
        sig[pos : pos + ln] += (
            0.09 * _env(ln, 0.01, 0.3) * np.sin(2 * np.pi * np.cumsum(vib) / SR)
        )
        pos += ln
    # hat-like noise bursts on 16ths + snare on offbeats
    step = int(0.125 * SR)
    for i, pos in enumerate(range(0, n - step, step)):
        burst = rng.standard_normal(600) * _env(600, 0.0005, 0.01)
        sig[pos : pos + 600] += 0.05 * burst
        if i % 4 == 2:
            sn = rng.standard_normal(3000) * _env(3000, 0.001, 0.05)
            sig[pos : pos + 3000] += 0.12 * sn
    sig += 0.01 * _pink(rng, n)
    return sig


def make_perc(dur=24.0, seed=22):
    """Drum machine: swept kick, noise snare, hats, room noise."""
    rng = np.random.default_rng(seed)
    n = int(dur * SR)
    sig = 0.008 * _pink(rng, n)
    step = int(0.5 * SR)
    for i, pos in enumerate(range(0, n - step, step)):
        # kick: 90->45 Hz sweep
        ln = int(0.25 * SR)
        t = np.arange(ln) / SR
        f = 90 * np.exp(-t * 8) + 45
        sig[pos : pos + ln] += 0.5 * _env(ln, 0.001, 0.12) * np.sin(
            2 * np.pi * np.cumsum(f) / SR
        )
        if i % 2 == 1:  # snare on the off-beat
            ln2 = int(0.15 * SR)
            body = np.sin(2 * np.pi * 180 * np.arange(ln2) / SR)
            nz = rng.standard_normal(ln2)
            sig[pos : pos + ln2] += 0.3 * _env(ln2, 0.001, 0.04) * (
                0.5 * body + 0.8 * nz
            )
        for sub in range(4):  # hats
            p2 = pos + sub * step // 4
            hat = rng.standard_normal(900) - np.concatenate(
                [[0], rng.standard_normal(899)]
            )
            sig[p2 : p2 + 900] += 0.07 * _env(900, 0.0003, 0.015) * hat[:900]
    return sig


def make_vox(dur=26.0, seed=33):
    """Formant-ish vowel glides over a drone + breath noise."""
    rng = np.random.default_rng(seed)
    n = int(dur * SR)
    t = np.arange(n) / SR
    f0 = 130.0 * (1 + 0.02 * np.sin(2 * np.pi * 0.23 * t)) * (
        1 + 0.005 * np.sin(2 * np.pi * 5.0 * t)
    )
    phase = 2 * np.pi * np.cumsum(f0) / SR
    # vowel formants (a->i->u glide, 6 s cycle)
    vowels = np.array([[800, 1200, 2500], [280, 2250, 2900], [310, 870, 2250]])
    cyc = (t / 6.0) % 3.0
    idx = cyc.astype(int)
    frac = cyc - idx
    F = (1 - frac[:, None]) * vowels[idx] + frac[:, None] * vowels[
        (idx + 1) % 3
    ]
    sig = np.zeros(n)
    for k in range(1, 24):
        fk = k * f0
        amp = np.zeros(n)
        for j in range(3):
            amp += np.exp(-0.5 * ((fk - F[:, j]) / 120.0) ** 2) / (j + 1)
        sig += amp * np.sin(k * phase) / np.sqrt(k)
    sig *= 0.12
    sig += 0.02 * rng.standard_normal(n) * (0.5 + 0.5 * np.sin(2 * np.pi * 0.4 * t))
    # low drone
    sig += 0.06 * np.sin(2 * np.pi * 65.4 * t)
    return sig


def stereo(x, width=0.12, seed=0):
    """Mid/side stereo: decorrelated side channel from delayed signal."""
    side = np.concatenate([np.zeros(441), x[:-441]]) * width
    left = np.clip(x + side, -1, 1)
    right = np.clip(x - side, -1, 1)
    return np.stack([left, right], axis=1)


def encode(x2, path, rate, codec=None, bitrate=None):
    raw = pathlib.Path("/tmp/fixture.f32le")
    x2.astype(np.float32).ravel().tofile(raw)
    cmd = [str(ENC), str(raw), str(path), str(rate), "2"]
    if codec:
        cmd.append(codec)
        if bitrate:
            cmd.append(str(bitrate))
    subprocess.run(cmd, check=True)
    print(f"  {path.name}: {path.stat().st_size/1024:.0f} KiB")


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    if not ENC.exists():
        subprocess.run(
            ["make", "-C", str(ENC.parent), "encoder"], check=True
        )

    band = make_band()
    perc = make_perc()
    vox = make_vox()

    print("lossy 44.1 kHz (resampled to 22050 by the production decode):")
    jobs = [
        (band, "band_mp3_64k.mp3", "libmp3lame", 64000),
        (band, "band_mp3_192k.mp3", "libmp3lame", 192000),
        (band, "band_vorbis_96k.ogg", "libvorbis", 96000),
        (band, "band_aac_128k.m4a", "aac", 128000),
        (perc, "perc_mp3_128k.mp3", "libmp3lame", 128000),
        (perc, "perc_vorbis_64k.ogg", "libvorbis", 64000),
        (perc, "perc_aac_192k.m4a", "aac", 192000),
        (vox, "vox_mp3_32k.mp3", "libmp3lame", 32000),
        (vox, "vox_mp3_96k.mp3", "libmp3lame", 96000),
        (vox, "vox_vorbis_160k.ogg", "libvorbis", 160000),
        (vox, "vox_aac_64k.m4a", "aac", 64000),
    ]
    for src, name, codec, br in jobs:
        encode(stereo(src), OUT / name, SR, codec, br)

    # 48 kHz source (second resample ratio through swresample)
    print("48 kHz source:")
    perc48 = make_perc(dur=20.0, seed=44)
    encode(stereo(perc48), OUT / "perc48_mp3_128k.mp3", 48000, "libmp3lame", 128000)

    print("quiet / clipped FLAC:")
    quiet = stereo(band * (10 ** (-42 / 20) / max(1e-9, np.abs(band).max())))
    encode(quiet, OUT / "band_quiet_-42dB.flac", SR)
    clipped = stereo(np.clip(band * 4.0, -0.999, 0.999), width=0.05)
    encode(clipped, OUT / "band_clipped.flac", SR)

    print(">=20-minute medley (long-song production path):")
    rng = np.random.default_rng(55)
    pieces = []
    total = 0
    target = int(21 * 60 * SR)
    srcs = [band, perc, vox]
    i = 0
    while total < target:
        x = srcs[i % 3] * (0.7 + 0.3 * rng.random())
        fade = min(int(0.5 * SR), len(x) // 4)
        x = x.copy()
        x[:fade] *= np.linspace(0, 1, fade)
        x[-fade:] *= np.linspace(1, 0, fade)
        pieces.append(x)
        total += len(x)
        i += 1
    medley = np.concatenate(pieces)[:target]
    encode(stereo(medley), OUT / "medley_21min_vorbis_96k.ogg", SR, "libvorbis", 96000)

    print("done:", len(list(OUT.iterdir())), "files in", OUT)


if __name__ == "__main__":
    sys.exit(main())
