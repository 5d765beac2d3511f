"""Playlist engine: distance metrics and playlist builders.

Reference: bliss-rs src/playlist.rs. TPU-first redesign: metrics operate on
the whole `[N, F]` library matrix in one batched device call instead of
N scalar closure evaluations —

  * euclidean / cosine / Mahalanobis distances are one fused
    norms-plus-GEMM program (`(a-b)ᵀ M (a-b)` expanded on the MXU)
  * `closest_to_songs` is a single distance kernel + argsort
  * `song_to_song` is an O(N²)-work but device-resident masked-argmin
    iteration (one [N, N] distance matrix, then a host-side greedy chain)
  * the extended isolation forest is built on host (tiny) and scored as a
    vectorized device/NumPy program

Scalar convenience wrappers with reference semantics are kept for API
parity; a set-metric is a *builder* (trained on seed vectors) producing a
callable, mirroring the DistanceMetricBuilder/DistanceMetric trait pair
(src/playlist.rs:24-59).
"""

from __future__ import annotations

import os
from functools import lru_cache as _lru_cache
from typing import Callable, List, Optional, Sequence

import numpy as np

from .errors import ProviderError
Vector = np.ndarray


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------


def euclidean_distance(a: Vector, b: Vector) -> float:
    """Euclidean distance (src/playlist.rs:65-71)."""
    d = np.asarray(a, np.float32) - np.asarray(b, np.float32)
    return float(np.sqrt(np.dot(d, d)))


def cosine_distance(a: Vector, b: Vector) -> float:
    """Cosine distance (src/playlist.rs:76-79)."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    sim = float(np.dot(a, b)) / float(
        np.sqrt(np.dot(a, a)) * np.sqrt(np.dot(b, b))
    )
    return 1.0 - sim


def mahalanobis_distance(a: Vector, b: Vector, m: np.ndarray) -> float:
    """Weighted distance `sqrt((a-b)ᵀ M (a-b))` (src/playlist.rs:140-142)."""
    d = np.asarray(a, np.float32) - np.asarray(b, np.float32)
    return float(np.sqrt(d @ np.asarray(m, np.float32) @ d))


def mahalanobis_distance_builder(m: np.ndarray):
    """Return a two-vector metric closing over `m`
    (src/playlist.rs:129-131)."""
    m = np.asarray(m, np.float32)

    def metric(a: Vector, b: Vector) -> float:
        return mahalanobis_distance(a, b, m)

    metric.weight_matrix = m  # used by the batched fast path
    return metric


def variance_based_weight_matrix(seeds: Sequence[Vector]) -> np.ndarray:
    """Inverse-variance diagonal weights from seed vectors
    (src/playlist.rs:173-221)."""
    if len(seeds) < 2:
        raise ProviderError("seeds must contain more than one element")
    n = len(np.asarray(seeds[0]).ravel())
    if n == 0:
        raise ProviderError("seed feature vectors must not be empty")
    arr = []
    for s in seeds:
        v = np.asarray(s, np.float32).ravel()
        if v.shape[0] != n:
            raise ProviderError(
                "all seed feature vectors must have the same length"
            )
        arr.append(v)
    mat = np.stack(arr)
    variance = mat.var(axis=0)  # population variance
    weights = 1.0 / (variance + 1e-6)
    weights *= n / weights.sum()
    return np.diag(weights).astype(np.float32)


# ---------------------------------------------------------------------------
# Metric builder protocol
# ---------------------------------------------------------------------------


class DistanceMetricBuilder:
    """Builds a trained metric measuring distance *to a set of vectors*."""

    def build(self, vectors: Sequence[Vector]) -> "DistanceMetric":
        raise NotImplementedError


class DistanceMetric:
    def distance(self, vector: Vector) -> float:
        raise NotImplementedError

    def distances(self, matrix: np.ndarray) -> np.ndarray:
        """Batched distances for an `[N, F]` matrix (device fast path);
        default falls back to the scalar method."""
        return np.array([self.distance(v) for v in matrix], np.float32)


class FunctionDistanceMetric(DistanceMetric):
    """Sum of a plain two-vector metric over the seed set
    (src/playlist.rs:36-59)."""

    def __init__(self, func: Callable, vectors: Sequence[Vector]):
        self.func = func
        self.vectors = [np.asarray(v, np.float32) for v in vectors]

    def distance(self, vector: Vector) -> float:
        return float(sum(self.func(v, vector) for v in self.vectors))

    def distances(self, matrix: np.ndarray) -> np.ndarray:
        matrix = np.asarray(matrix, np.float32)
        m = getattr(self.func, "weight_matrix", None)
        if m is not None:
            return _batched_mahalanobis(matrix, self.vectors, m)
        if self.func is euclidean_distance:
            return _batched_mahalanobis(
                matrix, self.vectors, np.eye(matrix.shape[-1], dtype=np.float32)
            )
        if self.func is cosine_distance:
            return _batched_cosine(matrix, self.vectors)
        return super().distances(matrix)


def _as_builder(metric) -> DistanceMetricBuilder:
    """Plain callables auto-implement the builder (src/playlist.rs:41-51)."""
    if isinstance(metric, DistanceMetricBuilder):
        return metric

    class _FnBuilder(DistanceMetricBuilder):
        def build(self, vectors):
            return FunctionDistanceMetric(metric, vectors)

    return _FnBuilder()


def _batched_mahalanobis(
    matrix: np.ndarray, seeds: List[np.ndarray], m: np.ndarray
) -> np.ndarray:
    """Σ_seeds sqrt((x-s)ᵀM(x-s)) for all rows at once.

    One `[N,F] @ [F,F]` GEMM + row reductions; runs through jnp so large
    libraries hit the device.
    """
    import jax.numpy as jnp

    x = jnp.asarray(matrix, jnp.float32)  # [N, F]
    s = jnp.asarray(np.stack(seeds), jnp.float32)  # [K, F]
    mm = jnp.asarray(m, jnp.float32)
    d = x[:, None, :] - s[None, :, :]  # [N, K, F]
    q = jnp.einsum("nkf,fg,nkg->nk", d, mm, d, precision="highest")
    out = jnp.sum(jnp.sqrt(jnp.maximum(q, 0.0)), axis=1)
    return np.asarray(out)


def _batched_cosine(matrix: np.ndarray, seeds: List[np.ndarray]) -> np.ndarray:
    import jax.numpy as jnp

    x = jnp.asarray(matrix, jnp.float32)
    s = jnp.asarray(np.stack(seeds), jnp.float32)
    xn = jnp.sqrt(jnp.sum(x * x, axis=1))
    sn = jnp.sqrt(jnp.sum(s * s, axis=1))
    sim = jnp.matmul(x, s.T, precision="highest") / (xn[:, None] * sn[None, :])
    return np.asarray(jnp.sum(1.0 - sim, axis=1))


@_lru_cache(maxsize=None)
def _order_dedup_jit(kind: str):
    """One fused device program behind `Library.playlist_from`'s dedup
    fast path: seed distances -> masked stable argsort -> gather ->
    consecutive-pair distances -> dedup verdicts. Moving the sort, the
    `[N, F]` row gather and the pairwise pass onto the device leaves the
    host with only the (rare) post-drop scalar rechecks and ONE final
    list materialization — at 1M songs those three stages were ~1.5 s of
    the 2.04 s warm p50 (PERF.md §43). Readback is `order` (int32) plus
    one bool lane per pair, the same order of bytes the unfused path
    already fetched for its distances.

    `kind` is "mahalanobis" (euclidean rides it with an identity weight,
    matching `_batched_mahalanobis`) or "cosine". Verdict semantics per
    src/playlist.rs:367-402: pair distance < threshold OR equal
    non-null (title, artist), the latter precomputed as integer ids
    (equal ids == equal pairs; -1 == any None)."""
    import jax
    import jax.numpy as jnp

    def fn(mat, seeds, m, mask, meta_ids, threshold):
        d = mat[:, None, :] - seeds[None, :, :]  # [N, K, F]
        if kind == "cosine":
            xn = jnp.sqrt(jnp.sum(mat * mat, axis=1))
            sn = jnp.sqrt(jnp.sum(seeds * seeds, axis=1))
            sim = jnp.matmul(mat, seeds.T, precision="highest") / (
                xn[:, None] * sn[None, :]
            )
            dists = jnp.sum(1.0 - sim, axis=1)
        else:
            q = jnp.einsum("nkf,fg,nkg->nk", d, m, d, precision="highest")
            dists = jnp.sum(jnp.sqrt(jnp.maximum(q, 0.0)), axis=1)
        masked = jnp.where(mask, dists, jnp.float32(jnp.inf))
        order = jnp.argsort(masked, stable=True)
        g = jnp.take(mat, order, axis=0)
        a, b = g[:-1], g[1:]
        if kind == "cosine":
            na = jnp.sqrt(jnp.sum(a * a, axis=1))
            nb = jnp.sqrt(jnp.sum(b * b, axis=1))
            pair = 1.0 - jnp.sum(a * b, axis=1) / (na * nb)
        else:
            dd = a - b
            w = jnp.einsum("nf,fg->ng", dd, m, precision="highest")
            pair = jnp.sqrt(jnp.maximum(jnp.sum(w * dd, axis=1), 0.0))
        mid = jnp.take(meta_ids, order)
        same = (pair < threshold) | (
            (mid[:-1] == mid[1:]) & (mid[:-1] >= 0)
        )
        return order.astype(jnp.int32), same

    return jax.jit(fn)


def _dedup_walk_runs(n: int, base_same: np.ndarray, scalar_same) -> np.ndarray:
    """The dedup walk of `dedup_playlist_custom_distance`, on INDICES:
    returns the kept positions in [0, n) given precomputed consecutive
    verdicts `base_same` ([n-1] bool) and a `scalar_same(i, j)` resolver
    for the non-consecutive rechecks that follow a drop (where `current`
    stays put). Identical float/verdict ordering to the list walk — only
    the materialization is deferred to the caller."""
    if n <= 0:
        return np.arange(0)
    flagged = np.flatnonzero(base_same)
    if not len(flagged):
        return np.arange(n)
    runs = []
    cur = 0
    fi = 0
    while cur < n - 1:
        while fi < len(flagged) and flagged[fi] < cur:
            fi += 1
        stop = int(flagged[fi]) if fi < len(flagged) else n - 1
        if stop > cur:
            runs.append(np.arange(cur, stop))
        cur = stop
        if cur >= n - 1:
            break
        nxt = cur + 2
        while nxt < n and scalar_same(cur, nxt):
            nxt += 1
        if nxt >= n:
            break
        runs.append(np.arange(cur, cur + 1))
        cur = nxt
    runs.append(np.arange(cur, cur + 1))
    return np.concatenate(runs)


# ---------------------------------------------------------------------------
# Extended isolation forest (set metric)
# ---------------------------------------------------------------------------


class ForestOptions(DistanceMetricBuilder):
    """Extended-isolation-forest metric builder.

    Mirrors the reference's use of the `extended-isolation-forest` crate
    (src/playlist.rs:230-251): `n_trees` hyperplane-split trees over a
    bootstrap-free subsample; the *distance* is the anomaly score
    `2^(-avg_path/c(n))` — smaller means "more like the seed set".
    """

    def __init__(
        self,
        n_trees: int = 1000,
        sample_size: int = 200,
        max_tree_depth: Optional[int] = None,
        extension_level: int = 10,
        seed: int = 0,
    ):
        self.n_trees = n_trees
        self.sample_size = sample_size
        self.max_tree_depth = max_tree_depth
        self.extension_level = extension_level
        self.seed = seed

    def build(self, vectors: Sequence[Vector]) -> "IsolationForest":
        sample_size = min(self.sample_size, len(vectors))
        return IsolationForest(
            np.stack([np.asarray(v, np.float64) for v in vectors]),
            n_trees=self.n_trees,
            sample_size=sample_size,
            max_tree_depth=self.max_tree_depth,
            extension_level=self.extension_level,
            seed=self.seed,
        )


def _harmonic(n: float) -> float:
    return np.log(n) + np.euler_gamma


def _c_factor(n: int) -> float:
    """Average unsuccessful BST search path length."""
    if n <= 1:
        return 0.0
    return 2.0 * _harmonic(n - 1.0) - (2.0 * (n - 1.0) / n)


class IsolationForest(DistanceMetric):
    """Vectorized extended isolation forest scorer.

    Trees are built on host (cheap: sample_size ≤ 200); scoring evaluates
    all trees for a whole `[N, F]` matrix with array ops.
    """

    def __init__(
        self,
        data: np.ndarray,
        n_trees: int,
        sample_size: int,
        max_tree_depth: Optional[int],
        extension_level: int,
        seed: int,
    ):
        n, dim = data.shape
        if extension_level >= dim:
            extension_level = dim - 1
        self.dim = dim
        depth_limit = max_tree_depth or int(np.ceil(np.log2(max(sample_size, 2))))
        rng = np.random.default_rng(seed)
        self.c_n = _c_factor(sample_size)
        self.trees = []
        for _ in range(n_trees):
            idx = rng.choice(n, size=min(sample_size, n), replace=False)
            self.trees.append(
                self._build_tree(data[idx], rng, 0, depth_limit, extension_level)
            )

    def _build_tree(self, x, rng, depth, limit, ext):
        n = x.shape[0]
        if depth >= limit or n <= 1:
            size = 0.0 if n <= 1 else _c_factor(n)
            return ("leaf", depth + size)
        normal = rng.normal(size=self.dim)
        zero_idx = rng.choice(self.dim, size=self.dim - ext - 1, replace=False)
        normal[zero_idx] = 0.0
        mins, maxs = x.min(axis=0), x.max(axis=0)
        point = rng.uniform(mins, maxs)
        side = (x - point) @ normal
        left, right = x[side < 0], x[side >= 0]
        if len(left) == 0 or len(right) == 0:
            return ("leaf", depth + _c_factor(n))
        return (
            "node",
            normal,
            point,
            self._build_tree(left, rng, depth + 1, limit, ext),
            self._build_tree(right, rng, depth + 1, limit, ext),
        )

    def _path_lengths(self, tree, x: np.ndarray, out: np.ndarray, mask):
        if tree[0] == "leaf":
            out[mask] += tree[1]
            return
        _, normal, point, left, right = tree
        side = (x[mask] - point) @ normal
        idx = np.flatnonzero(mask)
        lmask = np.zeros_like(mask)
        rmask = np.zeros_like(mask)
        lmask[idx[side < 0]] = True
        rmask[idx[side >= 0]] = True
        if lmask.any():
            self._path_lengths(left, x, out, lmask)
        if rmask.any():
            self._path_lengths(right, x, out, rmask)

    def distances(self, matrix: np.ndarray) -> np.ndarray:
        x = np.asarray(matrix, np.float64)
        total = np.zeros(x.shape[0])
        full = np.ones(x.shape[0], bool)
        for tree in self.trees:
            self._path_lengths(tree, x, total, full)
        avg = total / len(self.trees)
        if self.c_n <= 0:
            return np.full(x.shape[0], 0.5, np.float32)
        return (2.0 ** (-avg / self.c_n)).astype(np.float32)

    def distance(self, vector: Vector) -> float:
        return float(self.distances(np.asarray(vector)[None, :])[0])


# ---------------------------------------------------------------------------
# Playlist builders
# ---------------------------------------------------------------------------


def _song_matrix(songs) -> np.ndarray:
    return np.stack(
        [np.asarray(s.analysis.as_arr1(), np.float32) for s in songs]
    )


def closest_to_songs(initial_songs, candidate_songs, metric_builder):
    """Sort `candidate_songs` by distance to `initial_songs`
    (src/playlist.rs:256-270). Returns a new sorted list."""
    candidates = list(candidate_songs)
    if not candidates:
        return []
    builder = _as_builder(metric_builder)
    metric = builder.build([s.analysis.as_arr1() for s in initial_songs])
    dists = metric.distances(_song_matrix(candidates))
    order = np.argsort(dists, kind="stable")
    return [candidates[i] for i in order]


def song_to_song(initial_songs, candidate_songs, metric_builder):
    """Greedy nearest-neighbor chain (src/playlist.rs:272-326).

    The reference rebuilds the metric and scans O(N) per step; with
    function metrics the chain after the first step is a pure
    nearest-neighbor walk, so the `[N, N]` distance matrix is computed
    once on device and the walk is a cheap host loop.
    """
    pool = list(candidate_songs)
    if not pool:
        return []
    builder = _as_builder(metric_builder)
    out = []
    mat = _song_matrix(pool)
    alive = np.ones(len(pool), bool)

    # first pick: distance to all the initial songs
    metric = builder.build([s.analysis.as_arr1() for s in initial_songs])
    d = metric.distances(mat)
    idx = int(np.argmin(d))
    alive[idx] = False
    out.append(pool[idx])

    is_pure_fn = not isinstance(metric_builder, DistanceMetricBuilder)
    if is_pure_fn and len(pool) > 1:
        order = _device_greedy_chain(mat, idx, metric_builder, alive)
        if order is not None:
            out.extend(pool[i] for i in order)
            return out
        # host fallback for exotic function metrics
        pair = _pairwise_matrix(mat, metric_builder)
        cur = idx
        for _ in range(len(pool) - 1):
            row = np.where(alive, pair[cur], np.inf)
            cur = int(np.argmin(row))
            alive[cur] = False
            out.append(pool[cur])
    else:
        while alive.any():
            metric = builder.build([out[-1].analysis.as_arr1()])
            d = np.where(alive, metric.distances(mat), np.inf)
            nxt = int(np.argmin(d))
            alive[nxt] = False
            out.append(pool[nxt])
    return out


def _device_greedy_chain(mat, start_idx, metric, alive0):
    """The greedy nearest-neighbor walk as a device `lax.scan`.

    Per step: one `[N, F]` distance evaluation against the current song +
    masked argmin — O(N) memory instead of the O(N^2) pairwise matrix,
    and only the index sequence leaves the device. Returns None for
    metrics without a device formulation.
    """
    import jax
    import jax.numpy as jnp

    m = getattr(metric, "weight_matrix", None)
    if metric is euclidean_distance:
        m = np.eye(mat.shape[-1], dtype=np.float32)
    cosine = metric is cosine_distance
    if m is None and not cosine:
        return None

    x = jnp.asarray(mat)
    alive = jnp.asarray(alive0)
    steps = int(alive0.sum())

    if cosine:
        norms = jnp.sqrt(jnp.sum(x * x, axis=1))

        def dist_row(cur):
            v = x[cur]
            sim = jnp.matmul(x, v, precision="highest") / (
                norms * jnp.sqrt(jnp.dot(v, v))
            )
            return 1.0 - sim

    else:
        mm = jnp.asarray(m)
        xm = jnp.matmul(x, mm, precision="highest")
        q = jnp.sum(xm * x, axis=1)  # x_i^T M x_i, precomputed

        def dist_row(cur):
            v = x[cur]
            quad = q + jnp.dot(
                jnp.matmul(v, mm, precision="highest"), v
            ) - 2.0 * jnp.matmul(xm, v, precision="highest")
            return jnp.sqrt(jnp.maximum(quad, 0.0))

    def step(carry, _):
        alive, cur = carry
        d = jnp.where(alive, dist_row(cur), jnp.inf)
        nxt = jnp.argmin(d).astype(cur.dtype)
        return (alive.at[nxt].set(False), nxt), nxt

    # Unrolling amortizes the scan's per-step launch overhead; measured
    # on the chip at N=100k (tmp/probe_chain_unroll.py): unroll 1/8/16/
    # 32/64 -> 11.98/8.93/8.27/7.59/8.32 s, identical orders. CPU keeps
    # unroll=1 (launch overhead is not the bottleneck there).
    default_unroll = "32" if jax.default_backend() == "tpu" else "1"

    @jax.jit
    def walk(alive, start):
        (_, _), order = jax.lax.scan(
            step, (alive, start), None, length=steps,
            unroll=int(os.environ.get("BLISS_CHAIN_UNROLL", default_unroll)),
        )
        return order

    return np.asarray(walk(alive, jnp.int32(start_idx))).tolist()


def _pairwise_matrix(mat: np.ndarray, metric) -> np.ndarray:
    """[N, N] pairwise distances in one device program when possible."""
    import jax.numpy as jnp

    m = getattr(metric, "weight_matrix", None)
    if metric is euclidean_distance:
        m = np.eye(mat.shape[-1], dtype=np.float32)
    if m is not None:
        x = jnp.asarray(mat)
        mm = jnp.asarray(m)
        # (a-b)ᵀM(a-b) = aᵀMa + bᵀMb - 2aᵀMb  — norms + one GEMM
        xm = jnp.matmul(x, mm, precision="highest")
        q = jnp.sum(xm * x, axis=1)
        cross = jnp.matmul(xm, x.T, precision="highest")
        sq = jnp.maximum(q[:, None] + q[None, :] - 2.0 * cross, 0.0)
        return np.asarray(jnp.sqrt(sq))
    if metric is cosine_distance:
        x = jnp.asarray(mat)
        n = jnp.sqrt(jnp.sum(x * x, axis=1))
        return np.asarray(
            1.0
            - jnp.matmul(x, x.T, precision="highest")
            / (n[:, None] * n[None, :])
        )
    n = mat.shape[0]
    out = np.zeros((n, n), np.float32)
    for i in range(n):
        for j in range(n):
            out[i, j] = metric(mat[i], mat[j])
    return out


def dedup_playlist(playlist, distance_threshold: Optional[float] = None):
    """Drop consecutive near-duplicates using euclidean distance
    (src/playlist.rs:343-348)."""
    return dedup_playlist_custom_distance(
        playlist, distance_threshold, euclidean_distance
    )


def _rowwise_distances(a: np.ndarray, b: np.ndarray, metric):
    """dist(a[i], b[i]) for the GEMM-able function metrics, or None."""
    m = getattr(metric, "weight_matrix", None)
    if metric is euclidean_distance:
        d = a - b
        return np.sqrt(np.sum(d * d, axis=1))
    if m is not None:
        d = a - b
        return np.sqrt(np.maximum(np.sum((d @ m) * d, axis=1), 0.0))
    if metric is cosine_distance:
        na = np.sqrt(np.sum(a * a, axis=1))
        nb = np.sqrt(np.sum(b * b, axis=1))
        return 1.0 - np.sum(a * b, axis=1) / (na * nb)
    return None


def dedup_playlist_custom_distance(
    playlist, distance_threshold: Optional[float], metric_builder,
    matrix: Optional[np.ndarray] = None, metadata=None,
):
    """Drop consecutive songs closer than `distance_threshold` (default
    0.05) or sharing a non-empty title+artist (src/playlist.rs:367-402).
    Returns a list.

    For the GEMM-able function metrics the walk precomputes all
    consecutive-pair distances in one vectorized pass; scalar re-checks
    happen only after a drop (where `current` stays put and the
    precomputed pair no longer applies) — exact reference semantics at
    batch speed on 100k-song playlists (the scalar==vectorized identity
    is property-tested in tests/test_playlist.py).

    `matrix` / `metadata` are the public fast-path inputs for callers
    that already hold a columnar view of the playlist (`Library` passes
    its cached feature matrix): `matrix` is the playlist's `[N, F]`
    vectors with row i = playlist[i], and `metadata` its
    `(titles, artists)` pair of length-N object arrays. Both are
    optional and only consulted on the vectorized path; when omitted
    they are derived from the songs. Shapes are validated against the
    playlist length.
    """
    threshold = 0.05 if distance_threshold is None else distance_threshold
    builder = _as_builder(metric_builder)
    playlist = list(playlist)
    if not playlist:
        return []
    if matrix is not None and len(matrix) != len(playlist):
        raise ProviderError(
            f"dedup matrix has {len(matrix)} rows for a "
            f"{len(playlist)}-song playlist"
        )
    if metadata is not None and (
        len(metadata) != 2
        or len(metadata[0]) != len(playlist)
        or len(metadata[1]) != len(playlist)
    ):
        raise ProviderError(
            "dedup metadata must be (titles, artists) arrays matching "
            "the playlist length"
        )

    consecutive = None
    if (
        not isinstance(metric_builder, DistanceMetricBuilder)
        and len(playlist) > 64
    ):
        mat = matrix if matrix is not None else _song_matrix(playlist)
        consecutive = _rowwise_distances(mat[:-1], mat[1:], metric_builder)

    def pair_distance(i_cur, i_nxt):
        if consecutive is not None and i_nxt == i_cur + 1:
            return float(consecutive[i_cur])
        metric = builder.build([playlist[i_cur].analysis.as_arr1()])
        return metric.distance(playlist[i_nxt].analysis.as_arr1())

    def same_meta(a, b):
        return (
            a.title is not None
            and b.title is not None
            and a.artist is not None
            and b.artist is not None
            and a.title == b.title
            and a.artist == b.artist
        )

    def scalar_same(i_cur, i_nxt):
        return pair_distance(i_cur, i_nxt) < threshold or same_meta(
            playlist[i_cur], playlist[i_nxt]
        )

    n = len(playlist)
    if consecutive is not None:
        # vectorized walk: consecutive comparisons are precomputed; the
        # scalar path only resolves the (rare) runs following a drop,
        # where `current` stays put and the pair is no longer consecutive
        if metadata is not None:
            titles_a, artists_a = metadata
            titles_a = np.asarray(titles_a, object)
            artists_a = np.asarray(artists_a, object)
        else:
            titles_a = np.empty(n, object)
            artists_a = np.empty(n, object)
            for i, s in enumerate(playlist):
                titles_a[i] = s.title
                artists_a[i] = s.artist
        not_none = (
            (titles_a[:-1] != None)  # noqa: E711 — elementwise on object
            & (titles_a[1:] != None)  # noqa: E711
            & (artists_a[:-1] != None)  # noqa: E711
            & (artists_a[1:] != None)  # noqa: E711
        )
        meta = (
            not_none
            & (titles_a[:-1] == titles_a[1:])
            & (artists_a[:-1] == artists_a[1:])
        )
        base_same = (np.asarray(consecutive) < threshold) | meta
        if not base_same.any():
            return playlist
        flagged = np.flatnonzero(base_same)
        out = []
        cur = 0
        fi = 0
        while cur < n - 1:
            while fi < len(flagged) and flagged[fi] < cur:
                fi += 1
            stop = int(flagged[fi]) if fi < len(flagged) else n - 1
            # clean run: every comparison in [cur, stop) advances
            out.extend(playlist[cur:stop])
            cur = stop
            if cur >= n - 1:
                break
            # base_same[cur] holds: drop cur+1, then resolve scalar-wise
            nxt = cur + 2
            while nxt < n and scalar_same(cur, nxt):
                nxt += 1
            if nxt >= n:
                break  # everything to the end duplicated `cur`
            out.append(playlist[cur])
            cur = nxt
        out.append(playlist[cur])
        return out

    out = []
    cur = 0
    for nxt in range(1, n):
        if not scalar_same(cur, nxt):
            out.append(playlist[cur])
            cur = nxt
    out.append(playlist[cur])
    return out


def closest_album_to_group(group, pool):
    """Album-level playlist: rank albums by distance of their mean vector
    to the group's mean vector (src/playlist.rs:424-485)."""
    group = list(group)
    pool = [s for s in pool if all(s != g for g in group)]
    if not group:
        raise ProviderError("Mean of empty slice")

    albums = {}
    for song in pool:
        if song.album is not None:
            albums.setdefault(song.album, []).append(song)

    group_mean = _song_matrix(group).mean(axis=0)
    ranked = sorted(
        albums.items(),
        key=lambda kv: euclidean_distance(
            group_mean, _song_matrix(kv[1]).mean(axis=0)
        ),
    )
    playlist = list(group)

    def opt_key(v):
        # Rust Option ordering: None < Some(x) (src/playlist.rs:475-481)
        return (0, 0) if v is None else (1, v)

    for album, songs in ranked:
        songs = sorted(
            songs,
            key=lambda s: (opt_key(s.disc_number), opt_key(s.track_number)),
        )
        playlist.extend(songs)
    return playlist
