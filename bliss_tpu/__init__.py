"""bliss_tpu — a TPU-native music-analysis and playlist framework.

A ground-up JAX/XLA rebuild of the capabilities of
[bliss-rs](https://github.com/Polochon-street/bliss-rs): decode songs to a
canonical PCM format, analyze them into a compact feature vector on TPU,
compare them with pluggable distance metrics, build playlists, and persist
everything in a SQLite-backed library.

Architecture (TPU-first, not a port):
  * `ops/`      — batched, masked DSP primitives (STFT, framing, reductions)
  * `models/`   — descriptor blocks fused into one compiled analysis program
  * `parallel/` — device-mesh sharding for batch analysis and playlist math
  * `io/`       — native (C++/libav) decode stack + batching drivers
  * `playlist`  — device-batched distance metrics and playlist builders
  * `library`   — SQLite persistence, config, incremental updates
"""

from .errors import AnalysisError, BlissError, DecodingError, ProviderError
from .features import (
    CHANNELS,
    NUMBER_FEATURES,
    SAMPLE_RATE,
    AnalysisIndex,
    AnalysisIndexV1,
    FeaturesVersion,
    VERSION2_WEIGHTS,
)
from .song import Analysis, AnalysisOptions, CueInfo, Song

__version__ = "0.1.0"


def __getattr__(name):
    # lazy heavyweight imports (keep `import bliss_tpu` light)
    if name == "Library":
        from .library import Library

        return Library
    if name == "BaseConfig":
        from .library import BaseConfig

        return BaseConfig
    if name == "LibrarySong":
        from .library import LibrarySong

        return LibrarySong
    raise AttributeError(name)

__all__ = [
    "AnalysisError",
    "BlissError",
    "DecodingError",
    "ProviderError",
    "Analysis",
    "AnalysisIndex",
    "AnalysisIndexV1",
    "AnalysisOptions",
    "FeaturesVersion",
    "Song",
    "CHANNELS",
    "NUMBER_FEATURES",
    "SAMPLE_RATE",
    "VERSION2_WEIGHTS",
]
