"""Test configuration.

Tests run on the CPU backend with 8 virtual devices (the "fake cluster"
for mesh/sharding tests) and with x64 enabled so the f64 chroma math can
be checked against the reference golden fixtures at tight tolerances.
"""

import os

# The sandbox exports JAX_PLATFORMS=axon (real TPU); tests run on the CPU
# backend unless explicitly opted in with BLISS_TEST_TPU=1.
if os.environ.get("BLISS_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_ENABLE_X64"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# jax may already be imported (sitecustomize), in which case the env vars
# above were read too late — set the config explicitly as well.
import jax

if os.environ.get("BLISS_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

DATA = pathlib.Path(__file__).parent / "data"


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    return DATA


@pytest.fixture(scope="session")
def decoded_s16_mono():
    """Decoded canonical PCM of the main golden fixture."""
    from bliss_tpu.io.decoder import FFmpegDecoder

    return np.asarray(
        FFmpegDecoder.decode(DATA / "s16_mono_22_5kHz.flac").sample_array
    )
