"""Descriptor blocks — the compute model families of the framework.

Each module turns a `[T]` sample buffer (+ valid length) into its slice of
the bliss feature vector, as pure statically-shaped JAX functions that fuse
into a single compiled analysis program (replacing the reference's
5-thread fan-out, bliss-rs src/song/mod.rs:432-491).
"""

from .analyzer import analyze_samples, build_analyzer

__all__ = ["analyze_samples", "build_analyzer"]
