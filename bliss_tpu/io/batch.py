"""Batched analysis driver — the TPU throughput path.

The reference's batch story is a thread pool running independent
single-song analyses (bliss-rs src/song/decoder.rs:278-332). On TPU the
equivalent shape is: host threads decode (ctypes releases the GIL), songs
are grouped into *length buckets*, and each bucket runs the fused
analyzer vmapped over a fixed batch dimension — one device program per
(bucket, B) instead of one per song. Decode of batch k+1 overlaps the
device analysis of batch k.
"""

from __future__ import annotations

import pathlib
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np

from ..errors import AnalysisError, BlissError, DecodingError
from ..models.analyzer import MIN_SAMPLES, bucket_length
from ..song import AnalysisOptions, Song

#: Batch size per device program. Fixed per bucket so each (bucket, B)
#: pair compiles once. Wider batches amortize the ~0.3 s per-dispatch
#: latency but waste padded slots on partially-filled buckets (a 13-song
#: bucket padded to 16 wastes 19% of the heaviest compute); B=8 measured
#: best on mixed workloads. Above ~12 min of audio drop to B=2 to bound
#: the framing working set.
DEFAULT_BATCH = 8
MID_SONG = 1 << 20
LONG_SONG = 1 << 24


@dataclass
class _Decoded:
    order: int
    path: pathlib.Path
    raw: object = None  # PreAnalyzedSong
    error: Optional[BlissError] = None
    cue_sibling: bool = False


def _analyze_bucket_async(
    entries: List[_Decoded], padded_len: int, batch: int, version: int
):
    """Dispatch one padded [B, T] batch; return the un-fetched device array
    so the next batch's decode/dispatch overlaps this one's compute."""
    import jax.numpy as jnp

    from ..models.analyzer import _compiled_batch

    buf = np.zeros((batch, padded_len), np.float32)
    lengths = np.full((batch,), MIN_SAMPLES, np.int32)
    for i, e in enumerate(entries):
        n = e.raw.sample_array.shape[0]
        buf[i, :n] = e.raw.sample_array
        lengths[i] = n
    fn = _compiled_batch(padded_len, version)
    return fn(jnp.asarray(buf), jnp.asarray(lengths))


def analyze_paths_batched(
    decoder_cls,
    paths,
    analysis_options: Optional[AnalysisOptions] = None,
    batch_size: int = DEFAULT_BATCH,
    decode_workers: Optional[int] = None,
) -> Iterator[Tuple[pathlib.Path, object]]:
    """Decode on host threads + analyze in device batches.

    Yields `(path, Song | BlissError)`; order follows batch completion,
    not input order. CUE sheets fan out into one entry per track.
    """
    from concurrent.futures import ThreadPoolExecutor

    options = analysis_options or AnalysisOptions()
    version = int(options.features_version)
    paths = [pathlib.Path(p) for p in paths]
    if not paths:
        return
    workers = decode_workers or min(
        int(options.number_cores), max(len(paths), 1)
    )

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
        return out

    buckets: dict = {}
    in_flight: list = []  # [(entries, device_features)]

    def dispatch(bucket_key, entries):
        padded_len, b = bucket_key
        feats = _analyze_bucket_async(entries, padded_len, b, version)
        in_flight.append((entries, feats))

    def drain(keep: int = 0):
        while len(in_flight) > keep:
            entries, feats = in_flight.pop(0)
            host = np.asarray(feats)[: len(entries)]
            for e, f in zip(entries, host):
                yield e.path, _make_song(e.raw, f, options)

    with ThreadPoolExecutor(max_workers=workers) as pool:
        for decoded_list in pool.map(decode_one, enumerate(paths)):
            for d in decoded_list:
                if d.error is not None:
                    yield d.path, d.error
                    continue
                n = d.raw.sample_array.shape[0]
                if n < MIN_SAMPLES:
                    yield d.path, AnalysisError("empty or too short song.")
                    continue
                padded = bucket_length(n)
                b = batch_size if padded <= LONG_SONG else max(1, batch_size // 4)
                key = (padded, b)
                buckets.setdefault(key, []).append(d)
                if len(buckets[key]) == b:
                    dispatch(key, buckets.pop(key))
                    # keep two batches in flight: host buffer building +
                    # upload of the next batch overlaps device compute
                    yield from drain(keep=2)
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
            out.append(_Decoded(order, pre.path, raw=pre, cue_sibling=True))
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
