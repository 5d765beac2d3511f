"""Audio decoding to the canonical bliss PCM format (f32/mono/22050 Hz).

The decode stack is a native C++ library over libavformat/libavcodec/
libswresample (`native/bliss_decode.cpp`), bit-identical to
`ffmpeg -ar 22050 -ac 1 -c:a pcm_f32le` and verified against the
reference's adler32 golden hashes (bliss-rs src/song/decoder/ffmpeg.rs:379-527).

The batch driver replaces the reference's thread-per-chunk + mpsc design
(src/song/decoder.rs:278-332) with a decode thread pool feeding bucketed
device batches: decoding happens on host CPU threads (the ctypes call
releases the GIL) while the TPU analyzes the previous batch.
"""

from __future__ import annotations

import ctypes
import logging
import os
import pathlib
import subprocess
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Iterable, Iterator, Optional, Tuple

import numpy as np

from ..errors import BlissError, DecodingError
from ..features import SAMPLE_RATE

logger = logging.getLogger("bliss_tpu")

_NATIVE_DIR = pathlib.Path(__file__).parent / "native"
_LIB_PATH = _NATIVE_DIR / "libbliss_decode.so"
_lib_lock = threading.Lock()
_lib = None


class _DecodeResult(ctypes.Structure):
    _fields_ = [
        ("samples", ctypes.POINTER(ctypes.c_float)),
        ("n_samples", ctypes.c_int64),
        ("title", ctypes.c_char_p),
        ("artist", ctypes.c_char_p),
        ("album", ctypes.c_char_p),
        ("album_artist", ctypes.c_char_p),
        ("genre", ctypes.c_char_p),
        ("track", ctypes.c_char_p),
        ("disc", ctypes.c_char_p),
        ("error", ctypes.c_char_p),
    ]


def _build_native() -> None:
    subprocess.run(
        ["make", "-C", str(_NATIVE_DIR)],
        check=True,
        capture_output=True,
    )


def _load_lib():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not _LIB_PATH.exists():
            _build_native()
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.bliss_decode.restype = ctypes.POINTER(_DecodeResult)
        lib.bliss_decode.argtypes = [ctypes.c_char_p]
        lib.bliss_decode_free.argtypes = [ctypes.POINTER(_DecodeResult)]
        _lib = lib
        return lib


def _opt_str(b: Optional[bytes]) -> Optional[str]:
    if not b:
        return None
    return b.decode("utf-8", errors="replace")


def _parse_track_number(raw: Optional[str]) -> Optional[int]:
    """Parse "N" or "N/M" track/disc tags (ffmpeg.rs:224-241)."""
    if raw is None:
        return None
    try:
        return int(raw)
    except ValueError:
        pass
    if "/" in raw:
        head = raw.split("/", 1)[0]
        try:
            return int(head)
        except ValueError:
            return None
    return None


@dataclass
class PreAnalyzedSong:
    """A decoded-but-not-yet-analyzed song (src/song/decoder.rs:34-65)."""

    path: pathlib.Path = field(default_factory=lambda: pathlib.Path(""))
    artist: Optional[str] = None
    album_artist: Optional[str] = None
    title: Optional[str] = None
    album: Optional[str] = None
    track_number: Optional[int] = None
    disc_number: Optional[int] = None
    genre: Optional[str] = None
    duration: float = 0.0  # seconds
    sample_array: np.ndarray = field(
        default_factory=lambda: np.zeros(0, dtype=np.float32)
    )

    def to_song(self, analysis_options=None):
        from ..song import AnalysisOptions, Song

        options = analysis_options or AnalysisOptions()
        analysis = Song.analyze_with_options(self.sample_array, options)
        return Song(
            path=self.path,
            artist=self.artist,
            album_artist=self.album_artist,
            title=self.title,
            album=self.album,
            track_number=self.track_number,
            disc_number=self.disc_number,
            genre=self.genre,
            duration=self.duration,
            analysis=analysis,
            features_version=options.features_version,
            cue_info=None,
        )


class Decoder:
    """Decoder protocol: implement `decode`, inherit the batch drivers.

    Mirrors the reference `Decoder` trait (src/song/decoder.rs:115-333).
    """

    @classmethod
    def decode(cls, path) -> PreAnalyzedSong:
        raise NotImplementedError

    @classmethod
    def song_from_path(cls, path, analysis_options=None):
        return cls.decode(pathlib.Path(path)).to_song(analysis_options)

    # alias matching the reference name
    @classmethod
    def song_from_path_with_options(cls, path, analysis_options):
        return cls.song_from_path(path, analysis_options)

    @classmethod
    def analyze_paths(cls, paths, analysis_options=None):
        from ..song import AnalysisOptions

        return cls.analyze_paths_with_options(
            paths, analysis_options or AnalysisOptions()
        )

    @classmethod
    def analyze_paths_with_options(
        cls, paths: Iterable, analysis_options
    ) -> Iterator[Tuple[pathlib.Path, "object"]]:
        """Decode on a host thread pool, analyze on device, stream results.

        Yields `(path, Song | BlissError)` tuples in input order. CUE
        sheets fan out into one result per track (src/song/decoder.rs:310-323).
        """
        from ..cue import BlissCue

        paths = [pathlib.Path(p) for p in paths]
        if not paths:
            return iter(())

        cores = os.cpu_count() or 1
        workers = min(cores, int(analysis_options.number_cores))

        def work(path):
            logger.info("Analyzing file '%s'", path)
            results = []
            try:
                if path.suffix.lower() == ".cue":
                    for song_or_err in BlissCue.songs_from_path(
                        cls, path, analysis_options
                    ):
                        results.append((path, song_or_err))
                else:
                    results.append(
                        (path, cls.song_from_path(path, analysis_options))
                    )
            except BlissError as e:
                results.append((path, e))
            except Exception as e:  # pragma: no cover - defensive
                results.append((path, DecodingError(str(e))))
            return results

        def generate():
            with ThreadPoolExecutor(max_workers=workers) as pool:
                for results in pool.map(work, paths):
                    yield from results

        return generate()


class FFmpegDecoder(Decoder):
    """Native libav*-backed decoder (the default decoder)."""

    @classmethod
    def decode(cls, path) -> PreAnalyzedSong:
        path = pathlib.Path(path)
        lib = _load_lib()
        res = lib.bliss_decode(str(path).encode())
        try:
            c = res.contents
            if c.error:
                raise DecodingError(c.error.decode("utf-8", errors="replace"))
            n = int(c.n_samples)
            if n > 0:
                samples = np.ctypeslib.as_array(c.samples, shape=(n,)).copy()
            else:
                samples = np.zeros(0, dtype=np.float32)
            return PreAnalyzedSong(
                path=path,
                title=_opt_str(c.title),
                artist=_opt_str(c.artist),
                album=_opt_str(c.album),
                album_artist=_opt_str(c.album_artist),
                genre=_opt_str(c.genre),
                track_number=_parse_track_number(_opt_str(c.track)),
                disc_number=_parse_track_number(_opt_str(c.disc)),
                duration=round(n / SAMPLE_RATE, 9),
                sample_array=samples,
            )
        finally:
            lib.bliss_decode_free(res)


def _default_decoder():
    """The default decoder (reference src/song/decoder.rs:67-74: FFmpeg
    when the feature is on, Symphonia otherwise). BLISS_DECODER=fallback
    selects the FFI-free pure-Python stack the same way the reference's
    feature flags select Symphonia."""
    if os.environ.get("BLISS_DECODER") == "fallback":
        from .fallback import FallbackDecoder

        return FallbackDecoder
    return FFmpegDecoder


DefaultDecoder = _default_decoder()
