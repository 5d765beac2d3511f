"""Mesh-sharding tests on the 8-device CPU fake cluster
(conftest sets --xla_force_host_platform_device_count=8)."""

import numpy as np
import pytest

import jax

from bliss_tpu.models.analyzer import analyze_batch
from bliss_tpu.parallel import (
    make_mesh,
    sharded_analyze_batch,
    sharded_closest_distances,
    sharded_top_k,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh(8)


def test_sharded_analyze_matches_single_device(mesh):
    rng = np.random.default_rng(0)
    t = 1 << 14
    batch = (rng.normal(size=(8, t)) * 0.1).astype(np.float32)
    lengths = np.array([t, t - 100, t - 2048, t, t, t - 1, t, t - 5000], np.int32)
    sharded = sharded_analyze_batch(mesh, batch, lengths)
    local = analyze_batch(batch, lengths)
    np.testing.assert_allclose(sharded, local, atol=1e-6)


def test_sharded_distances(mesh):
    rng = np.random.default_rng(1)
    library = rng.normal(size=(64, 23)).astype(np.float32)
    seeds = rng.normal(size=(2, 23)).astype(np.float32)
    out = sharded_closest_distances(mesh, library, seeds)
    expected = sum(
        np.linalg.norm(library - s, axis=1) for s in seeds
    )
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_sharded_top_k(mesh):
    rng = np.random.default_rng(2)
    library = rng.normal(size=(128, 23)).astype(np.float32)
    seeds = library[:1] + 0.001
    idx, dist = sharded_top_k(mesh, library, seeds, k=5)
    expected_d = np.linalg.norm(library - seeds[0], axis=1)
    expected_idx = np.argsort(expected_d)[:5]
    np.testing.assert_array_equal(np.sort(idx), np.sort(expected_idx))
    assert (dist[:-1] <= dist[1:]).all()
