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


def _host_top_k(library, seeds, k):
    """Single-device ground truth: summed euclidean + stable argsort."""
    d = np.zeros(library.shape[0], np.float64)
    for s in seeds:
        d += np.linalg.norm(
            library.astype(np.float64) - s.astype(np.float64), axis=1
        )
    order = np.argsort(d, kind="stable")[: min(k, library.shape[0])]
    return order, d[order]


@pytest.mark.parametrize(
    "n,k",
    [
        (128, 20),  # k > n // n_dev (16): spans shard boundaries
        (100, 7),  # n not divisible by the mesh (padding path)
        (61, 61),  # k == n, non-divisible
        (40, 64),  # k > n: clamped
        (8, 3),  # one row per shard
        (5, 5),  # fewer rows than devices
    ],
)
def test_sharded_top_k_matches_host(mesh, n, k):
    rng = np.random.default_rng(n * 1000 + k)
    library = rng.normal(size=(n, 23)).astype(np.float32)
    seeds = rng.normal(size=(2, 23)).astype(np.float32)
    idx, dist = sharded_top_k(mesh, library, seeds, k=k)
    exp_idx, exp_d = _host_top_k(library, seeds, k)
    assert idx.shape[0] == min(k, n)
    np.testing.assert_array_equal(np.sort(idx), np.sort(exp_idx))
    np.testing.assert_allclose(dist, exp_d, rtol=2e-5)


def test_sharded_top_k_clustered_on_one_shard(mesh):
    """A nearest-cluster larger than n//n_dev sitting on one shard must be
    returned in full (the round-2 under-return edge)."""
    rng = np.random.default_rng(7)
    n, n_dev = 128, 8
    shard_n = n // n_dev
    library = rng.normal(size=(n, 23)).astype(np.float32) + 50.0
    seed = rng.normal(size=(1, 23)).astype(np.float32)
    # the 2nd shard (rows 16..31) holds the 16 closest rows; ask for 24
    library[shard_n : 2 * shard_n] = seed[0] + 0.01 * rng.normal(
        size=(shard_n, 23)
    ).astype(np.float32)
    idx, dist = sharded_top_k(mesh, library, seed, k=24)
    exp_idx, _ = _host_top_k(library, [seed[0]], 24)
    np.testing.assert_array_equal(np.sort(idx), np.sort(exp_idx))
    # every row of the clustered shard made it out
    assert set(range(shard_n, 2 * shard_n)) <= set(idx.tolist())


def test_sharded_top_k_randomized_parity(mesh):
    rng = np.random.default_rng(123)
    for _ in range(10):
        n = int(rng.integers(3, 200))
        k = int(rng.integers(1, n + 4))
        library = rng.normal(size=(n, 23)).astype(np.float32)
        n_seeds = int(rng.integers(1, 4))
        seeds = rng.normal(size=(n_seeds, 23)).astype(np.float32)
        idx, dist = sharded_top_k(mesh, library, seeds, k=k)
        exp_idx, exp_d = _host_top_k(library, seeds, k)
        np.testing.assert_array_equal(np.sort(idx), np.sort(exp_idx))
        np.testing.assert_allclose(dist, exp_d, rtol=2e-5, atol=1e-5)
