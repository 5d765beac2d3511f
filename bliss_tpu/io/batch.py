"""Batched analysis driver — the TPU throughput path.

The reference's batch story is a thread pool running independent
single-song analyses (bliss-rs src/song/decoder.rs:278-332). On TPU the
equivalent shape is: host threads decode (ctypes releases the GIL), each
song is *uploaded to the device the moment it is decoded*, songs are
grouped into length buckets, and each bucket runs the fused analyzer
over a fixed batch dimension — one device program per (bucket, B)
instead of one per song.

Transfer engineering (the tunnel link is the bottleneck, ~10-70 MB/s):

  * per-song uploads — no padded batch-slot bytes ever cross the wire,
    and the upload of song k+1 overlaps decode of k+2 and compute of k;
  * certified quantized wire ("auto", the TPU default): each song is
    certified at decode time — samples all on the s16 grid → "i16b"
    (int16 mantissas + one int8 exponent per 2048-sample block,
    2.004 B/sample; reconstruction x = q·2^(e-15) is exact in f32 and
    the round-trip is *bit-exact* for that source class); anything a
    resampler or float/lossy codec touched → "i24b" (+ a low mantissa
    byte, 3.008 B/sample, rounding ≤ blockpeak·2^-23, below the f32
    DFT noise floor). This holds the BASELINE ≤1e-4 feature contract
    at the default configuration (tests/test_tpu_drift.py enforces it
    on hardware) instead of trading accuracy for ~33% less wire. CPU
    backend keeps exact f32 (golden parity); BLISS_UPLOAD overrides;
  * deep pipelining: several device batches stay in flight; only the
    [B, 23] feature blocks are ever fetched back.
"""

from __future__ import annotations

import functools
import os
import pathlib
from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np

from ..errors import AnalysisError, BlissError, DecodingError
from ..models.analyzer import MIN_SAMPLES, bucket_length
from ..song import AnalysisOptions, Song

#: Batch size per device program. Fixed per bucket so each (bucket, B)
#: pair compiles once. Wider batches amortize per-dispatch latency but
#: add nothing once uploads are per-song; B=8 measured best on mixed
#: workloads. Above ~12 min of audio drop to B=2 to bound the framing
#: working set.
DEFAULT_BATCH = 8
LONG_SONG = 1 << 24

def _longsong_threshold() -> int:
    """Songs above this many samples are routed through the time-sharded
    full-pipeline analyzer (parallel/longsong.py) when more than one
    device is visible: one giant single-device bucket past ~20 min
    stresses VMEM in the select kernels (round-3 advisor note) and
    leaves every other chip idle. Single-device setups keep the bucket
    path (exercised on hardware by the 21-min drift-corpus medley).
    `BLISS_LONGSONG_SAMPLES` overrides (tests use a small bound)."""
    return int(
        os.environ.get("BLISS_LONGSONG_SAMPLES", str(20 * 60 * 22050))
    )

#: Device batches left in flight while new work streams in. Each holds
#: only its [B, 23] output plus the input handles, so the cost is HBM
#: for the inputs; 3 keeps the device busy across fetch round-trips.
IN_FLIGHT_BATCHES = 3

#: Block size for the block-floating-point wire format. Every bucket
#: length is a multiple of 2048 (bucket_length: pow2/8 × {5,6,7} with a
#: 16384 floor), so the exponent array tiles exactly.
WIRE_BLOCK = 2048

#: Long songs are shipped in chunks of this many samples (2 MB of int16)
#: because the tunnel is FIFO: one monolithic 13 MB put would head-block
#: every other transfer AND the execute dispatches waiting on already-
#: resident inputs. Chunks let short songs' batches slot in between.
WIRE_CHUNK = 1 << 20


def _upload_kind() -> str:
    """Wire policy: exact f32 on CPU (golden parity), `auto` on TPU.

    `auto` certifies each song at decode time: `i16b` (2.004 B/sample)
    only when every sample sits exactly on the s16 grid — the case where
    the block-floating-point round-trip is bit-exact — and `i24b`
    (3.008 B/sample) otherwise. i16b's mantissa floor can shift
    spectral flatness on quiet lossy/resampled sources by up to ~1.5e-2
    (PERF.md §26), 150x over the BASELINE ≤1e-4 contract; i24b holds
    the contract at +50% wire. `BLISS_UPLOAD` overrides per-run.
    """
    kind = os.environ.get("BLISS_UPLOAD")
    if kind in ("f32", "i16b", "i20b", "i24b", "auto"):
        return kind
    import jax

    return "f32" if jax.default_backend() == "cpu" else "auto"


#: s16-grid certification scans in slices so off-grid content (every
#: lossy/resampled source) exits after ~64k samples, not a full pass.
_CERT_SLICE = 1 << 16


def _is_s16_exact(samples: np.ndarray) -> bool:
    """True iff every sample lies exactly on the s16 grid (x = k/2^15,
    k in [-32768, 32767]) — the source class whose i16b wire round-trip
    is bit-exact (straight-s16 decode with no resampling). Stronger than
    asking the decoder for its source format: it also certifies s16
    content that arrived through any decoder, and automatically rejects
    anything a resampler or float codec touched."""
    for lo in range(0, samples.shape[0], _CERT_SLICE):
        x = samples[lo : lo + _CERT_SLICE]
        q = x * np.float32(32768.0)  # *2^15 is exact in f32
        if not (
            (q == np.rint(q)).all()
            and (q >= -32768.0).all()
            and (q <= 32767.0).all()
        ):
            return False
    return True


def _certify_kind(policy: str, samples: np.ndarray) -> str:
    """Resolve the per-song wire format under `policy`."""
    if policy != "auto":
        return policy
    return "i16b" if _is_s16_exact(samples) else "i24b"


def _quantize_i16b(
    samples: np.ndarray, padded_len: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Block-floating-point: int16 mantissas + int8 exponent per block.

    Per 2048-sample block with peak p: e = ceil(log2(p)) (+1 when the
    positive extreme would round to the unrepresentable +32768), scale
    2^e, and q = round(x·2^(15-e)). Reconstruction q·2^(e-15) is exact
    in f32, so the only error is the rounding, ≤ blockpeak·2^-15
    (·2^-14 on bumped blocks) — and straight-s16 content (x = k/2^15)
    round-trips bit-exactly, including power-of-two peaks.
    """
    n = samples.shape[0]
    i16 = np.zeros(padded_len, np.int16)
    e8 = np.zeros(padded_len // WIRE_BLOCK, np.int8)
    nb = (n + WIRE_BLOCK - 1) // WIRE_BLOCK
    xb = np.zeros((nb, WIRE_BLOCK), np.float32)
    xb.reshape(-1)[:n] = samples
    peak = np.abs(xb).max(axis=1)
    # e ∈ [-100, 100] keeps both 2^(15-e) and 2^(e-15) normal in f32
    # (zero/denormal blocks quantize to all-zero mantissas either way)
    e = np.ceil(np.log2(np.maximum(peak, 2.0**-100))).astype(np.int32)
    np.clip(e, -100, 100, out=e)
    # a POSITIVE sample in (32767.5, 32768]·2^(e-15) would round to
    # +32768 (unrepresentable; -32768 is fine) — e.g. a straight-s16
    # block whose peak is exactly +2^j. Bump e for those blocks instead
    # of clipping, which would silently break the bit-exact s16 claim.
    qpeak = np.round(xb.max(axis=1) * np.exp2(15.0 - e).astype(np.float32))
    e = np.where(qpeak > 32767.0, e + 1, e)
    np.clip(e, -100, 100, out=e)
    q = np.round(xb * np.exp2(15.0 - e).astype(np.float32)[:, None])
    np.clip(q, -32768, 32767, out=q)
    i16[: nb * WIRE_BLOCK] = q.astype(np.int16).reshape(-1)
    e8[:nb] = e.astype(np.int8)
    return i16, e8


def _quantize_i20b(
    samples: np.ndarray, padded_len: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """20-bit block-floating-point: int16 high mantissa + packed low
    NIBBLE (two samples per byte) + int8 exponent per block =
    2.504 B/sample, 17% fewer bytes than i24b. Same scheme with
    2^19-scaled mantissas — rounding error ≤ blockpeak·2^-19, 16x finer
    than i16b's breach class (PERF.md §26) but 16x coarser than i24b's
    below-the-DFT-noise-floor guarantee; whether that clears the 1e-4
    corpus contract is an on-chip measurement (VERDICT r4 next-step 5),
    recorded in PERF.md before this can back any `auto` slot."""
    n = samples.shape[0]
    hi = np.zeros(padded_len, np.int16)
    nib = np.zeros(padded_len // 2, np.uint8)
    e8 = np.zeros(padded_len // WIRE_BLOCK, np.int8)
    nb = (n + WIRE_BLOCK - 1) // WIRE_BLOCK
    xb = np.zeros((nb, WIRE_BLOCK), np.float32)
    xb.reshape(-1)[:n] = samples
    peak = np.abs(xb).max(axis=1)
    e = np.ceil(np.log2(np.maximum(peak, 2.0**-100))).astype(np.int32)
    np.clip(e, -100, 100, out=e)
    qpeak = np.round(
        xb.max(axis=1).astype(np.float64) * np.exp2(19.0 - e)
    )
    e = np.where(qpeak > float(2**19 - 1), e + 1, e)
    np.clip(e, -100, 100, out=e)
    q = np.round(xb.astype(np.float64) * np.exp2(19.0 - e)[:, None])
    np.clip(q, -(2**19), 2**19 - 1, out=q)
    qi = q.astype(np.int32).reshape(-1)[: nb * WIRE_BLOCK]
    hi[: nb * WIRE_BLOCK] = (qi >> 4).astype(np.int16)
    lo4 = (qi & 0xF).astype(np.uint8)
    full = np.zeros(padded_len, np.uint8)
    full[: nb * WIRE_BLOCK] = lo4
    # sample 2i rides the LOW nibble of byte i, sample 2i+1 the high
    nib[:] = full[0::2] | (full[1::2] << 4)
    e8[:nb] = e.astype(np.int8)
    return hi, nib, e8


def _quantize_i24b(
    samples: np.ndarray, padded_len: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """24-bit block-floating-point: int16 high mantissa + uint8 low byte
    + int8 exponent per block. Same scheme as `_quantize_i16b` with
    2^23-scaled mantissas — rounding error ≤ blockpeak·2^-23, below the
    f32 DFT's own noise floor, so features match the exact-f32 wire."""
    n = samples.shape[0]
    hi = np.zeros(padded_len, np.int16)
    lo = np.zeros(padded_len, np.uint8)
    e8 = np.zeros(padded_len // WIRE_BLOCK, np.int8)
    nb = (n + WIRE_BLOCK - 1) // WIRE_BLOCK
    xb = np.zeros((nb, WIRE_BLOCK), np.float32)
    xb.reshape(-1)[:n] = samples
    peak = np.abs(xb).max(axis=1)
    e = np.ceil(np.log2(np.maximum(peak, 2.0**-100))).astype(np.int32)
    np.clip(e, -100, 100, out=e)
    qpeak = np.round(
        xb.max(axis=1).astype(np.float64) * np.exp2(23.0 - e)
    )
    e = np.where(qpeak > float(2**23 - 1), e + 1, e)
    np.clip(e, -100, 100, out=e)
    # f64 staging: 2^23-scale products overflow f32's 24-bit mantissa
    q = np.round(xb.astype(np.float64) * np.exp2(23.0 - e)[:, None])
    np.clip(q, -(2**23), 2**23 - 1, out=q)
    qi = q.astype(np.int32).reshape(-1)[: nb * WIRE_BLOCK]
    hi[: nb * WIRE_BLOCK] = (qi >> 8).astype(np.int16)
    lo[: nb * WIRE_BLOCK] = (qi & 0xFF).astype(np.uint8)
    e8[:nb] = e.astype(np.int8)
    return hi, lo, e8


def _chunk_bounds(padded_len: int) -> List[Tuple[int, int]]:
    return [
        (lo, min(lo + WIRE_CHUNK, padded_len))
        for lo in range(0, padded_len, WIRE_CHUNK)
    ]


def _upload_song(samples: np.ndarray, padded_len: int, kind: str, device=None):
    """Start the async host→device transfer of one song (chunked);
    returns a flat tuple of device handles, committed to `device` when the
    batch is sharded over a mesh (the song's row shard lives there)."""
    import jax

    if kind == "f32":
        buf = np.zeros(padded_len, np.float32)
        buf[: samples.shape[0]] = samples
        return tuple(
            jax.device_put(buf[lo:hi], device)
            for lo, hi in _chunk_bounds(padded_len)
        )
    if kind == "i24b":
        hi16, lo8, e8 = _quantize_i24b(samples, padded_len)
        handles = [
            jax.device_put(hi16[lo:hi], device)
            for lo, hi in _chunk_bounds(padded_len)
        ]
        handles += [
            jax.device_put(lo8[lo:hi], device)
            for lo, hi in _chunk_bounds(padded_len)
        ]
        handles.append(jax.device_put(e8, device))
        return tuple(handles)
    if kind == "i20b":
        hi16, nib8, e8 = _quantize_i20b(samples, padded_len)
        handles = [
            jax.device_put(hi16[lo:hi], device)
            for lo, hi in _chunk_bounds(padded_len)
        ]
        handles += [
            jax.device_put(nib8[lo:hi], device)
            for lo, hi in _chunk_bounds(padded_len // 2)
        ]
        handles.append(jax.device_put(e8, device))
        return tuple(handles)
    i16, e8 = _quantize_i16b(samples, padded_len)
    handles = [
        jax.device_put(i16[lo:hi], device)
        for lo, hi in _chunk_bounds(padded_len)
    ]
    handles.append(jax.device_put(e8, device))
    return tuple(handles)


def _analysis_devices() -> tuple:
    """Devices the batched analyzer spreads bucket batches over.

    All *addressable* devices by default (the production multi-chip
    path the reference reaches with its per-core thread fan-out,
    src/song/decoder.rs:278-332) — local_devices, not devices: in a
    `jax.distributed` cluster this process can only build batches on
    its own chips (the cross-host path is
    parallel/distributed.analyze_paths_distributed);
    `BLISS_ANALYZE_DEVICES=n` caps it (n=1 reproduces the single-chip
    driver exactly — used by the 8-vs-1-device identity test).
    """
    import jax

    devs = tuple(jax.local_devices())
    cap = os.environ.get("BLISS_ANALYZE_DEVICES")
    if cap:
        devs = devs[: max(1, int(cap))]
    return devs


def _device_count() -> int:
    return len(_analysis_devices())


def _longsong_mesh():
    from jax.sharding import Mesh

    # not cached: the device set follows BLISS_ANALYZE_DEVICES; equal
    # Mesh objects hash equal, so the jitted analyzer cache still hits
    return Mesh(np.array(_analysis_devices()), ("time",))


def _dispatch_longsong(d: "_Decoded", version: int) -> np.ndarray:
    """Analyze one very long song time-sharded over all devices
    (parallel/longsong.sharded_analyze_samples). Returns `[1, F]` so
    the drain loop treats it like a 1-song bucket. The signal ships as
    f32 (4 B/sample, one sharded put) — the block-float wire doesn't
    apply because each shard reconstructs locally; a per-shard wire is
    possible future work if long songs ever dominate ingest."""
    from ..parallel.longsong import sharded_analyze_samples
    from ..utils.retry import retry_transient

    samples = d.raw.sample_array
    d.raw.sample_array = None
    feats = retry_transient(
        lambda: sharded_analyze_samples(
            _longsong_mesh(), samples, d.n, version
        )
    )
    return np.asarray(feats)[None]


def _usable_ndev(b: int, avail: int) -> int:
    """Largest device count ≤ `avail` dividing batch `b` evenly."""
    d = max(1, min(b, avail))
    while b % d:
        d -= 1
    return d


def _slot_device(b: int, slot: int):
    """Mesh device owning row `slot` of a `[b, T]` batch sharded P('songs')."""
    devs = _analysis_devices()
    n_dev = _usable_ndev(b, len(devs))
    return devs[slot * n_dev // b]


def _handles_per_song(padded_len: int, kind: str) -> int:
    n_chunks = len(_chunk_bounds(padded_len))
    if kind == "f32":
        return n_chunks
    if kind == "i24b":
        return 2 * n_chunks + 1
    if kind == "i20b":
        return n_chunks + len(_chunk_bounds(padded_len // 2)) + 1
    return n_chunks + 1


def _dequantize_song(h: tuple, padded_len: int, kind: str):
    """Rebuild one song's f32 samples from its wire chunk handles
    (traced; shared by the stacked and per-device-shard programs)."""
    import jax.numpy as jnp

    if kind == "f32":
        return jnp.concatenate(h)
    if kind == "i24b":
        n_chunks = len(_chunk_bounds(padded_len))
        hi = jnp.concatenate(h[:n_chunks]).astype(jnp.int32)
        lo = jnp.concatenate(h[n_chunks : 2 * n_chunks]).astype(jnp.int32)
        q = (hi * 256 + lo).astype(jnp.float32)
        scale = jnp.exp2(h[-1].astype(jnp.float32) - 23.0)
        return (q.reshape(-1, WIRE_BLOCK) * scale[:, None]).reshape(-1)
    if kind == "i20b":
        n_chunks = len(_chunk_bounds(padded_len))
        hi = jnp.concatenate(h[:n_chunks]).astype(jnp.int32)
        b = jnp.concatenate(h[n_chunks:-1]).astype(jnp.int32)
        # byte i: low nibble = sample 2i, high nibble = sample 2i+1
        nib = jnp.stack([b & 0xF, b >> 4], axis=-1).reshape(-1)
        q = (hi * 16 + nib).astype(jnp.float32)
        scale = jnp.exp2(h[-1].astype(jnp.float32) - 19.0)
        return (q.reshape(-1, WIRE_BLOCK) * scale[:, None]).reshape(-1)
    i16 = jnp.concatenate(h[:-1])
    scale = jnp.exp2(h[-1].astype(jnp.float32) - 15.0)
    return (
        i16.astype(jnp.float32).reshape(-1, WIRE_BLOCK) * scale[:, None]
    ).reshape(-1)


@functools.lru_cache(maxsize=128)
def _compiled_stacked(padded_len: int, b: int, version: int, kind: str):
    """One jitted program per (bucket, B, version, wire-kind): reassemble
    each song from its wire chunks, dequantize, stack, and run the fused
    analyzer. Args: (lengths, *song0_handles, *song1_handles, ...)."""
    import jax
    import jax.numpy as jnp

    from ..models.analyzer import analyze_samples

    vmapped = jax.vmap(functools.partial(analyze_samples, version=version))
    per_song = _handles_per_song(padded_len, kind)

    def fn(lengths, *parts):
        songs = [
            _dequantize_song(
                parts[i * per_song : (i + 1) * per_song], padded_len, kind
            )
            for i in range(b)
        ]
        return vmapped(jnp.stack(songs), lengths)

    return jax.jit(fn)


#: Upload threads. The tunnel doesn't multiplex (parallel puts measured
#: the same aggregate bandwidth), but dedicated threads keep quantize +
#: transfer off the decode workers so decode/wire/compute fully overlap.
UPLOAD_THREADS = 2

#: Backpressure: max bytes decoded-but-not-yet-uploaded before the
#: consumer blocks. Bounds host RAM when decode outruns the wire.
MAX_PENDING_UPLOAD_BYTES = 512 << 20


def _upload_committed(fut) -> bool:
    """True once an upload future's bytes have actually left host RAM
    (every device handle reports is_ready), not merely been issued.
    Errors count as committed — they surface at dispatch."""
    if not fut.done():
        return False
    try:
        handles = fut.result()
    except Exception:
        return True
    return all(getattr(h, "is_ready", lambda: True)() for h in handles)


def _block_on_upload(fut) -> None:
    """Wait until one upload's transfers are committed to the device."""
    import jax

    try:
        handles = fut.result()
    except Exception:
        return
    jax.block_until_ready(handles)


@dataclass
class _Decoded:
    order: int
    path: pathlib.Path
    raw: object = None  # PreAnalyzedSong (sample_array dropped post-upload)
    error: Optional[BlissError] = None
    n: int = 0
    kind: str = "f32"  # certified per-song wire format (_certify_kind)
    upload: object = None  # Future resolving to the device handles

    def handles_ready(self) -> tuple:
        return self.upload.result()


@functools.lru_cache(maxsize=256)
def _compiled_assemble(padded_len: int, spd: int, n_present: int, kind: str):
    """Per-device shard assembly: `spd` songs' wire chunks → one
    `[spd, padded_len]` f32 row block, built ON the device that owns the
    chunks (jit follows the committed inputs; no cross-device traffic).
    Missing tail slots (partial buckets) become zero rows, masked out by
    their MIN_SAMPLES lengths downstream."""
    import jax
    import jax.numpy as jnp

    per_song = _handles_per_song(padded_len, kind)

    def fn(*parts):
        rows = [
            _dequantize_song(
                parts[i * per_song : (i + 1) * per_song], padded_len, kind
            )
            for i in range(n_present)
        ]
        for _ in range(spd - n_present):
            rows.append(jnp.zeros(padded_len, jnp.float32))
        return jnp.stack(rows)

    return jax.jit(fn)


@functools.lru_cache(maxsize=32)
def _zero_shard(padded_len: int, spd: int, device):
    """An all-zero `[spd, padded_len]` row block materialized on `device`
    (a device-empty tail shard of a partial bucket)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import SingleDeviceSharding

    fn = jax.jit(
        lambda: jnp.zeros((spd, padded_len), jnp.float32),
        out_shardings=SingleDeviceSharding(device),
    )
    return fn()


@functools.lru_cache(maxsize=64)
def _compiled_sharded(padded_len: int, b: int, version: int, devs: tuple):
    """The batch analyzer jitted over a 1-D `Mesh(('songs',))`: rows
    (songs) sharded over the devices, lengths sharded alongside, features
    sharded back. Songs are independent, so the program is collective-free
    (SURVEY §2.3 row 1)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ..models.analyzer import analyze_samples

    mesh = Mesh(np.array(devs), ("songs",))
    vmapped = jax.vmap(functools.partial(analyze_samples, version=version))
    return jax.jit(
        vmapped,
        in_shardings=(
            NamedSharding(mesh, P("songs", None)),
            NamedSharding(mesh, P("songs")),
        ),
        out_shardings=NamedSharding(mesh, P("songs", None)),
    ), mesh


def _dispatch_sharded(
    entries, lengths, padded_len, batch, version, kind, devs
):
    """Launch one bucket over a multi-device mesh: assemble each device's
    row shard from its songs' committed chunks, stitch the shards into one
    global sharded `[B, T]` array, run the sharded analyzer."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = len(devs)
    spd = batch // n_dev
    handles = [e.handles_ready() for e in entries]
    shards = []
    for dix, dev in enumerate(devs):
        group = handles[dix * spd : (dix + 1) * spd]
        if not group:
            shards.append(_zero_shard(padded_len, spd, dev))
            continue
        asm = _compiled_assemble(padded_len, spd, len(group), kind)
        shards.append(asm(*[h for song in group for h in song]))
    fn, mesh = _compiled_sharded(padded_len, batch, version, devs)
    global_batch = jax.make_array_from_single_device_arrays(
        (batch, padded_len), NamedSharding(mesh, P("songs", None)), shards
    )
    # explicit put: under a jax.distributed cluster, jit refuses raw
    # numpy args with non-replicated shardings even on an all-local mesh
    lengths = jax.device_put(lengths, NamedSharding(mesh, P("songs")))
    return fn(global_batch, lengths)


def _dispatch_bucket(
    entries: List[_Decoded], padded_len: int, batch: int, version: int, kind: str
):
    """Launch one bucket program over per-song device handles; empty
    slots reuse the first song's handles (masked out via length)."""
    from ..utils.retry import retry_transient

    lengths = np.full((batch,), MIN_SAMPLES, np.int32)
    for i, e in enumerate(entries):
        lengths[i] = e.n
    devs = _analysis_devices()
    n_dev = _usable_ndev(batch, len(devs))
    if n_dev > 1:
        return retry_transient(
            lambda: _dispatch_sharded(
                entries, lengths, padded_len, batch, version, kind,
                devs[:n_dev],
            )
        )
    fn = _compiled_stacked(padded_len, batch, version, kind)
    handles = [e.handles_ready() for e in entries]
    handles += [handles[0]] * (batch - len(entries))
    args = [h for song in handles for h in song]
    # the tunneled remote-compile/execute path occasionally drops a
    # connection mid-flight; one song batch must not kill a 10k-song run
    return retry_transient(lambda: fn(lengths, *args))


def analyze_paths_batched(
    decoder_cls,
    paths,
    analysis_options: Optional[AnalysisOptions] = None,
    batch_size: int = DEFAULT_BATCH,
    decode_workers: Optional[int] = None,
    in_flight_batches: int = IN_FLIGHT_BATCHES,
) -> Iterator[Tuple[pathlib.Path, object]]:
    """Decode on host threads + analyze in device batches.

    Yields `(path, Song | BlissError)`; order follows decode/batch
    completion, not input order. CUE sheets fan out into one entry per
    track. Host RAM and HBM stay bounded: decode runs behind a bounded
    submission window, sample arrays are dropped once their device
    transfer is issued, and at most `in_flight_batches` device programs
    plus the partially-filled buckets hold live input handles.
    """
    options = analysis_options or AnalysisOptions()
    version = int(options.features_version)
    paths = [pathlib.Path(p) for p in paths]
    if not paths:
        return
    workers = decode_workers or min(
        int(options.number_cores), max(len(paths), 1)
    )
    policy = _upload_kind()

    def decode_one(item):
        order, path = item
        out = []
        try:
            if path.suffix.lower() == ".cue":
                # decode the big file(s) once; tracks become separate
                # pre-analyzed entries sharing the decode
                out.extend(_decode_cue(decoder_cls, path, order))
            else:
                raw = decoder_cls.decode(path)
                out.append(_Decoded(order, path, raw=raw))
        except BlissError as e:
            out.append(_Decoded(order, path, error=e))
        except Exception as e:  # pragma: no cover
            out.append(_Decoded(order, path, error=DecodingError(str(e))))
        for d in out:
            if d.error is None:
                d.n = int(d.raw.sample_array.shape[0])
                # certify on the decode workers (parallel, and the
                # samples are hot in cache right after the decode)
                d.kind = _certify_kind(policy, d.raw.sample_array)
        return out

    def upload_one(d: _Decoded, device=None):
        samples = d.raw.sample_array
        d.raw.sample_array = None  # device owns it after the put below
        return _upload_song(samples, bucket_length(d.n), d.kind, device)

    buckets: dict = {}
    in_flight: list = []  # [(entries, Future[device_features])]
    pending_uploads: list = []  # [(future, nbytes)] oldest-first

    def dispatch(bucket_key, entries):
        # a dispatch can block waiting for its inputs' wire transfers;
        # run it off-thread so routing/decode/upload keep flowing
        padded_len, b, kind = bucket_key
        fut = dispatcher.submit(
            _dispatch_bucket, entries, padded_len, b, version, kind
        )
        in_flight.append((entries, fut))

    def drain(keep: int = 0):
        while len(in_flight) > keep:
            entries, fut = in_flight.pop(0)
            host = np.asarray(fut.result())[: len(entries)]
            for e, f in zip(entries, host):
                yield e.path, _make_song(e.raw, f, options)

    def place(d: _Decoded):
        """Place one decoded song into its bucket; returns
        (errors, bucket_key) — key None for error/too-short entries.
        The caller submits the upload (now that the slot, and with it the
        mesh device, is known) and dispatches full buckets."""
        if d.error is not None:
            return [(d.path, d.error)], None
        if d.n < MIN_SAMPLES:
            return [(d.path, AnalysisError("empty or too short song."))], None
        if d.n > _longsong_threshold() and _device_count() > 1:
            # full-pipeline sequence parallelism: the song's time axis
            # shards over every visible device (parallel/longsong.py);
            # rides the same in-flight/drain machinery as a 1-song bucket
            fut = dispatcher.submit(_dispatch_longsong, d, version)
            in_flight.append(([d], fut))
            return [], "long"
        padded = bucket_length(d.n)
        b = batch_size if padded <= LONG_SONG else max(1, batch_size // 4)
        # the wire kind is part of the bucket key: under the `auto`
        # policy a mixed library splits into at most 2x the buckets
        # (i16b + i24b), keeping the compiled-program count bounded
        # instead of exploding over per-slot kind combinations
        key = (padded, b, d.kind)
        buckets.setdefault(key, []).append(d)
        return [], key

    window = max(workers * 2, batch_size)
    with ThreadPoolExecutor(max_workers=workers) as pool, ThreadPoolExecutor(
        max_workers=UPLOAD_THREADS
    ) as uploader, ThreadPoolExecutor(max_workers=1) as dispatcher:
        inputs = iter(enumerate(paths))
        futures = set()

        def top_up():
            while len(futures) < window:
                try:
                    item = next(inputs)
                except StopIteration:
                    return
                futures.add(pool.submit(decode_one, item))

        def submit_upload(d: _Decoded, device):
            # bound decoded-but-unsent bytes: block on the oldest transfer.
            # "done" must mean the bytes actually LEFT host RAM —
            # device_put is async and the future resolves the moment the
            # transfer is *issued*, while the staged wire bytes live in
            # the PJRT client until the (slow, ~MB/s tunnel) send
            # completes. Track is_ready(), not future resolution: with
            # fast decode (WAV) the old accounting let an entire
            # library's wire bytes pile up in RSS (13.6 GB on the 1k
            # soak); commitment-tracking holds the cap for real.
            pending_uploads[:] = [
                (f, nb)
                for f, nb in pending_uploads
                if not _upload_committed(f)
            ]
            while (
                sum(nb for _, nb in pending_uploads)
                > MAX_PENDING_UPLOAD_BYTES
            ):
                f, _ = pending_uploads.pop(0)
                _block_on_upload(f)
            d.upload = uploader.submit(upload_one, d, device)
            pending_uploads.append((d.upload, 4 * d.n))

        top_up()
        while futures:
            done, futures = wait(futures, return_when=FIRST_COMPLETED)
            for fut in done:
                for d in fut.result():
                    errs, key = place(d)
                    yield from errs
                    if key is None:
                        continue
                    if key == "long":
                        yield from drain(keep=in_flight_batches)
                        continue
                    slot = len(buckets[key]) - 1
                    submit_upload(d, _slot_device(key[1], slot))
                    if len(buckets[key]) == key[1]:
                        dispatch(key, buckets.pop(key))
                        yield from drain(keep=in_flight_batches)
            top_up()
        for key, entries in list(buckets.items()):
            dispatch(key, entries)
        yield from drain()


def _decode_cue(decoder_cls, path, order) -> List[_Decoded]:
    """Decode a CUE's audio files once and emit per-track entries."""
    from ..cue import parse_cue
    from ..features import SAMPLE_RATE
    from .decoder import PreAnalyzedSong

    sheet = parse_cue(path)
    genre = next((v for c, v in sheet.comments if c.upper() == "GENRE"), None)
    disc_raw = next(
        (v for c, v in sheet.comments if c.upper() in ("DISCNUMBER", "DISC")),
        None,
    )
    try:
        disc_number = int(disc_raw) if disc_raw is not None else None
    except ValueError:
        disc_number = None

    out = []
    for entry in sheet.files:
        audio_path = path.parent / entry.file
        try:
            raw = decoder_cls.decode(audio_path)
        except BlissError as e:
            out.append(_Decoded(order, path, error=e))
            continue
        samples = raw.sample_array
        if samples.size == 0:
            out.append(
                _Decoded(
                    order,
                    path,
                    error=DecodingError(
                        "empty audio file associated to CUE sheet"
                    ),
                )
            )
            continue
        tracks = entry.tracks
        bounds = []
        for cur, nxt in zip(tracks, tracks[1:]):
            if cur.indices and nxt.indices:
                bounds.append(
                    (
                        cur,
                        int(np.float32(cur.indices[0][1]) * np.float32(SAMPLE_RATE)),
                        int(np.float32(nxt.indices[0][1]) * np.float32(SAMPLE_RATE)),
                    )
                )
        if tracks and tracks[-1].indices:
            bounds.append(
                (
                    tracks[-1],
                    int(
                        np.float32(tracks[-1].indices[0][1])
                        * np.float32(SAMPLE_RATE)
                    ),
                    len(samples),
                )
            )
        for index, (track, start, end) in enumerate(bounds):
            try:
                track_number = int(track.number)
            except ValueError:
                track_number = None
            pre = PreAnalyzedSong(
                path=pathlib.Path(f"{path}/CUE_TRACK{index + 1:03d}"),
                album=sheet.title,
                artist=track.performer,
                album_artist=sheet.performer,
                title=track.title,
                genre=genre,
                track_number=track_number,
                disc_number=disc_number,
                duration=(end - start) / SAMPLE_RATE,
                sample_array=np.ascontiguousarray(samples[start:end]),
            )
            pre._cue_paths = (path, audio_path)  # type: ignore[attr-defined]
            out.append(_Decoded(order, pre.path, raw=pre))
    return out


def _make_song(raw, features, options) -> Song:
    from ..song import Analysis, CueInfo

    cue_info = None
    if hasattr(raw, "_cue_paths"):
        cue_path, audio_path = raw._cue_paths
        cue_info = CueInfo(cue_path, audio_path)
    return Song(
        path=raw.path,
        artist=raw.artist,
        album_artist=raw.album_artist,
        title=raw.title,
        album=raw.album,
        track_number=raw.track_number,
        disc_number=raw.disc_number,
        genre=raw.genre,
        duration=raw.duration,
        analysis=Analysis(features, options.features_version),
        features_version=options.features_version,
        cue_info=cue_info,
    )
