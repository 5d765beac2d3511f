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

import os as _os


def _enable_persistent_compile_cache() -> None:
    """Point jax at a persistent compilation cache (unless the user
    already configured one). Remote/TPU compiles are expensive (tens of
    seconds to minutes through a tunnel); every analyzer program is
    shape-bucketed precisely so repeat runs hit this cache."""
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            # per-user default path: a world-shared /tmp dir would be
            # owned by whoever ran first and unwritable for everyone else.
            # The fake-multi-device CPU mesh compiles with different
            # target flags than the plain backend — give it its own dir
            # so AOT entries don't cross-contaminate (noisy loader errors).
            suffix = (
                "_cpumesh"
                if "--xla_force_host_platform_device_count"
                in _os.environ.get("XLA_FLAGS", "")
                else ""
            )
            default = f"/tmp/bliss_jax_cache_{_os.getuid()}{suffix}"
            jax.config.update(
                "jax_compilation_cache_dir",
                _os.environ.get("BLISS_JAX_CACHE_DIR", default),
            )
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
    except Exception:  # pragma: no cover - jax misconfiguration
        pass


_enable_persistent_compile_cache()

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

__version__ = "0.13.0"  # tracks the bliss-rs feature level rebuilt here


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
