"""TPU-native DSP primitives (JAX/XLA).

These are the batched, masked, statically-shaped equivalents of the
reference's streaming DSP layer (bliss-rs src/utils.rs + src/aubio.rs).
Everything here is jit-able and vmap-able over a leading batch dimension.
"""

from .windows import (
    hann_periodic,
    frame_signal,
    frame_signal_reflect,
    reflect_pad,
    n_frames_strided,
    n_frames_stft,
)
from .spectral import (
    stft,
    pvoc_mags_buggy,
    pvoc_mags,
    framed_pvoc_mags,
    convolve,
)
from .reductions import (
    masked_mean,
    masked_std,
    masked_quantile_midpoint,
    masked_quantile_midpoint_all,
    geometric_mean,
    zero_crossing_count,
    normalize_range,
)

__all__ = [
    "hann_periodic",
    "frame_signal",
    "frame_signal_reflect",
    "reflect_pad",
    "n_frames_strided",
    "n_frames_stft",
    "stft",
    "pvoc_mags_buggy",
    "pvoc_mags",
    "framed_pvoc_mags",
    "convolve",
    "masked_mean",
    "masked_std",
    "masked_quantile_midpoint",
    "masked_quantile_midpoint_all",
    "geometric_mean",
    "zero_crossing_count",
    "normalize_range",
]
