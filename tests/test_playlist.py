"""Playlist engine tests, mirroring src/playlist.rs:487-1661."""

import pathlib

import numpy as np
import pytest

from bliss_tpu import Analysis, FeaturesVersion, Song
from bliss_tpu.errors import ProviderError
from bliss_tpu.playlist import (
    ForestOptions,
    closest_album_to_group,
    closest_to_songs,
    cosine_distance,
    dedup_playlist,
    dedup_playlist_custom_distance,
    euclidean_distance,
    mahalanobis_distance,
    mahalanobis_distance_builder,
    song_to_song,
    variance_based_weight_matrix,
)


def _song(path, vec, title=None, artist=None, album=None, track=None, disc=None):
    v = np.zeros(23, np.float32)
    v[: len(vec)] = vec
    return Song(
        path=pathlib.Path(path),
        title=title,
        artist=artist,
        album=album,
        track_number=track,
        disc_number=disc,
        analysis=Analysis(v, FeaturesVersion.VERSION2),
    )


def test_euclidean_distance():
    a = np.array([1.0, 1.0])
    b = np.array([0.0, 0.0])
    assert abs(euclidean_distance(a, b) - np.sqrt(2.0)) < 1e-6
    assert euclidean_distance(a, a) == 0.0


def test_cosine_distance():
    a = np.array([1.0, 0.0])
    b = np.array([0.0, 1.0])
    assert abs(cosine_distance(a, b) - 1.0) < 1e-6
    assert abs(cosine_distance(a, a)) < 1e-6


def test_mahalanobis():
    m = np.diag([2.0, 0.5])
    a = np.array([1.0, 1.0], np.float32)
    b = np.array([0.0, 0.0], np.float32)
    assert abs(mahalanobis_distance(a, b, m) - np.sqrt(2.5)) < 1e-6
    builder = mahalanobis_distance_builder(m)
    assert abs(builder(a, b) - np.sqrt(2.5)) < 1e-6


def test_variance_based_weight_matrix():
    s1 = np.array([0.3, 0.8, 0.5], np.float32)
    s2 = np.array([0.3, 0.2, 0.5], np.float32)
    m = variance_based_weight_matrix([s1, s2])
    assert m[0, 0] > m[1, 1]
    assert abs(np.trace(m) - 3.0) < 1e-4
    with pytest.raises(ProviderError):
        variance_based_weight_matrix([s1])


def test_closest_to_songs():
    first = _song("a", [0.0])
    pool = [_song(f"p{i}", [float(i)]) for i in [3, 1, 2, 5, 4]]
    out = closest_to_songs([first], pool, euclidean_distance)
    assert [str(s.path) for s in out] == ["p1", "p2", "p3", "p4", "p5"]


def test_song_to_song():
    first = _song("a", [0.0])
    pool = [_song(f"p{i}", [float(i)]) for i in [3, 1, 2, 5, 4]]
    out = song_to_song([first], pool, euclidean_distance)
    assert [str(s.path) for s in out] == ["p1", "p2", "p3", "p4", "p5"]


def test_song_to_song_with_builder():
    # set-metric path: isolation forest via the builder protocol
    rng = np.random.default_rng(0)
    cluster_a = [
        _song(f"a{i}", rng.normal(0.0, 0.01, 23)) for i in range(30)
    ]
    outlier = _song("outlier", np.full(23, 5.0))
    forest = ForestOptions(n_trees=100, sample_size=20, seed=1)
    out = closest_to_songs(cluster_a[:5], cluster_a[5:] + [outlier], forest)
    # the outlier must rank last
    assert str(out[-1].path) == "outlier"


def test_dedup_playlist():
    s1 = _song("1", [0.0])
    s2 = _song("2", [0.001])  # dup of s1
    s3 = _song("3", [1.0])
    out = dedup_playlist([s1, s2, s3], None)
    assert [str(s.path) for s in out] == ["1", "3"]
    # larger threshold drops everything close
    out = dedup_playlist([s1, s2, s3], 20.0)
    assert [str(s.path) for s in out] == ["1"]
    # zero threshold keeps everything distinct
    out = dedup_playlist([s1, s2, s3], 0.0)
    assert [str(s.path) for s in out] == ["1", "2", "3"]


def test_dedup_title_artist():
    s1 = _song("1", [0.0], title="T", artist="A")
    s2 = _song("2", [9.0], title="T", artist="A")  # same tags, far analysis
    s3 = _song("3", [1.0], title="U", artist="A")
    out = dedup_playlist_custom_distance([s1, s2, s3], None, euclidean_distance)
    assert [str(s.path) for s in out] == ["1", "3"]


def test_closest_album_to_group():
    group = [_song("g1", [0.0], album="Seed", track=1)]
    pool = [
        _song("y2", [0.1], album="Y", track=2, disc=1),
        _song("y1", [0.1], album="Y", track=1, disc=1),
        _song("z1", [5.0], album="Z", track=1),
        _song("no-album", [0.0]),
    ]
    out = closest_album_to_group(group, pool)
    assert [str(s.path) for s in out] == ["g1", "y1", "y2", "z1"]


def test_forest_distance_scalar_matches_batch():
    rng = np.random.default_rng(2)
    seeds = [rng.normal(size=23) for _ in range(25)]
    forest = ForestOptions(n_trees=50, sample_size=20, seed=3).build(seeds)
    x = rng.normal(size=(4, 23))
    batch = forest.distances(x)
    for i in range(4):
        assert abs(forest.distance(x[i]) - batch[i]) < 1e-6


def test_batched_matches_scalar_metrics():
    rng = np.random.default_rng(4)
    seeds = [_song(f"s{i}", rng.normal(size=23)) for i in range(3)]
    pool = [_song(f"p{i}", rng.normal(size=23)) for i in range(10)]
    ordered = closest_to_songs(seeds, pool, euclidean_distance)
    # brute-force reference ordering
    seed_vecs = [s.analysis.as_arr1() for s in seeds]
    def dist(song):
        return sum(
            euclidean_distance(v, song.analysis.as_arr1()) for v in seed_vecs
        )
    expected = sorted(pool, key=dist)
    assert [str(s.path) for s in ordered] == [str(s.path) for s in expected]


# --- ports of the reference's remaining playlist test corpus ---------------


def test_variance_based_weight_matrix_stable_vs_variable():
    """src/playlist.rs test_variance_based_weight_matrix_stable_vs_variable:
    zero-variance dims get the biggest weights; the matrix is diagonal."""
    m = variance_based_weight_matrix(
        [
            np.array([1.0, 0.0, 1.0], np.float32),
            np.array([1.0, 100.0, 1.0], np.float32),
            np.array([1.0, 200.0, 1.0], np.float32),
        ]
    )
    assert m.shape == (3, 3)
    assert m[0, 0] > m[1, 1] and m[2, 2] > m[1, 1]
    off = m[~np.eye(3, dtype=bool)]
    np.testing.assert_array_equal(off, 0.0)


def test_variance_based_weight_matrix_weights_sum():
    """src/playlist.rs ..._weights_sum: diagonal sums to n."""
    m = variance_based_weight_matrix(
        [
            np.array([1.0, 0.0, 1.0], np.float32),
            np.array([1.0, 100.0, 1.0], np.float32),
            np.array([1.0, 200.0, 1.0], np.float32),
        ]
    )
    assert abs(np.trace(m) - 3.0) < 1e-4


def test_variance_based_weight_matrix_identical_seeds():
    """src/playlist.rs ..._identical_seeds: all weights normalize to 1."""
    s = np.array([1.0, 2.0, 3.0], np.float32)
    m = variance_based_weight_matrix([s, s.copy(), s.copy()])
    np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-4)


def test_variance_based_weight_matrix_two_seeds_minimum():
    """src/playlist.rs ..._two_seeds_minimum."""
    m = variance_based_weight_matrix(
        [np.array([0.0, 50.0], np.float32), np.array([0.0, 150.0], np.float32)]
    )
    assert m.shape == (2, 2)
    assert m[0, 0] > m[1, 1]


def test_variance_based_weight_matrix_mismatched_dimensions():
    """src/playlist.rs ..._mismatched_dimensions: exact error message."""
    with pytest.raises(
        ProviderError, match="all seed feature vectors must have the same"
    ):
        variance_based_weight_matrix(
            [
                np.array([1.0, 2.0, 3.0], np.float32),
                np.array([1.0, 2.0], np.float32),
            ]
        )


def test_variance_based_weight_matrix_empty_feature_vectors():
    """src/playlist.rs ..._empty_feature_vectors: exact error message."""
    with pytest.raises(
        ProviderError, match="seed feature vectors must not be empty"
    ):
        variance_based_weight_matrix(
            [np.array([], np.float32), np.array([], np.float32)]
        )


def test_mahalanobis_distance_with_songs():
    """src/playlist.rs test_mahalanobis_distance_with_songs: a weight
    matrix keeping only feature 0 reorders the playlist accordingly."""
    first = _song("path-to-first", [1.0] * 23)
    second = _song(
        "path-to-second", [1.5, 5.0, 6.0, 5.0, 6.0, 6.0] + [1.0] * 17
    )
    third = _song("path-to-third", [5.0] + [1.0] * 22)
    m = np.zeros((23, 23), np.float32)
    m[0, 0] = 1.0
    distance = mahalanobis_distance_builder(m)
    playlist = closest_to_songs([first], [third, second], distance)
    assert [str(s.path) for s in playlist] == [
        "path-to-second",
        "path-to-third",
    ]


def test_forest_options_musical_ground_truth(data_dir):
    """src/playlist.rs test_forest_options: a forest trained on Mozart's
    piano concerto no. 19 ranks all five Kind Of Blue tracks last among
    the 11 real-music analyses (vectors extracted verbatim from the
    reference test, src/playlist.rs:1266-1661)."""
    data = np.load(data_dir / "forest_options_songs.npz")
    mozart19 = [
        _song(f"mozart19-{i}", v) for i, v in enumerate(data["mozart_piano_19"])
    ]
    kob = [_song(f"kob-{i}", v) for i, v in enumerate(data["kind_of_blue"])]
    mozart23 = [
        _song(f"mozart23-{i}", v) for i, v in enumerate(data["mozart_piano_23"])
    ]
    songs = mozart19 + kob + mozart23
    opts = ForestOptions(
        n_trees=1000, sample_size=200, max_tree_depth=None, extension_level=10
    )
    playlist = closest_to_songs(mozart19, songs, opts)
    tail = {str(s.path) for s in playlist[-5:]}
    assert tail == {f"kob-{i}" for i in range(5)}


def _naive_dedup(playlist, threshold, metric):
    """Straight transcription of src/playlist.rs:367-402 as ground truth."""
    from bliss_tpu.playlist import _as_builder

    builder = _as_builder(metric)
    out = []
    it = iter(playlist)
    try:
        current = next(it)
    except StopIteration:
        return out
    for nxt in it:
        m = builder.build([current.analysis.as_arr1()])
        same = m.distance(nxt.analysis.as_arr1()) < threshold or (
            current.title is not None
            and nxt.title is not None
            and current.artist is not None
            and nxt.artist is not None
            and current.title == nxt.title
            and current.artist == nxt.artist
        )
        if not same:
            out.append(current)
            current = nxt
    out.append(current)
    return out


@pytest.mark.parametrize("metric_name", ["euclidean", "cosine"])
def test_dedup_vectorized_matches_naive(metric_name):
    from bliss_tpu.playlist import (
        cosine_distance,
        dedup_playlist_custom_distance,
        euclidean_distance,
    )

    metric = (
        euclidean_distance if metric_name == "euclidean" else cosine_distance
    )
    rng = np.random.default_rng(17)
    for trial in range(8):
        n = int(rng.integers(65, 400))  # >64: the vectorized path
        vecs = rng.uniform(-1, 1, size=(n, 23)).astype(np.float32)
        # inject duplicate runs: copies of a previous vector (chains too)
        for _ in range(int(rng.integers(1, 20))):
            i = int(rng.integers(1, n))
            run = int(rng.integers(1, 4))
            for j in range(i, min(n, i + run)):
                vecs[j] = vecs[i - 1] + rng.normal(0, 1e-4, 23).astype(
                    np.float32
                )
        songs = []
        for i in range(n):
            meta_dup = rng.random() < 0.05
            songs.append(
                Song(
                    path=pathlib.Path(f"/pl/{trial}/{i}.flac"),
                    title="t0" if meta_dup else f"t{i}",
                    artist="a0" if meta_dup else f"a{i}",
                    analysis=Analysis(vecs[i], FeaturesVersion.VERSION2),
                )
            )
        got = dedup_playlist_custom_distance(songs, None, metric)
        want = _naive_dedup(songs, 0.05, metric)
        assert [str(s.path) for s in got] == [str(s.path) for s in want]


def test_dedup_matrix_metadata_seam_matches_derived():
    """The public `matrix`/`metadata` fast-path inputs (the seam Library
    uses with its cached columnar view) must be exactly equivalent to
    deriving both from the playlist, and to the scalar production path
    (forced via a DistanceMetricBuilder wrapper) — VERDICT r3 weak #6."""
    from bliss_tpu.playlist import (
        DistanceMetricBuilder,
        FunctionDistanceMetric,
        dedup_playlist_custom_distance,
        euclidean_distance,
    )

    class _ScalarEuclid(DistanceMetricBuilder):
        # isinstance(…, DistanceMetricBuilder) disables the vectorized
        # walk, so this drives the scalar production path with the same
        # numerics as the plain-callable builder
        def build(self, vectors):
            return FunctionDistanceMetric(euclidean_distance, vectors)

    rng = np.random.default_rng(23)
    for trial in range(6):
        n = int(rng.integers(66, 300))
        vecs = rng.uniform(-1, 1, size=(n, 23)).astype(np.float32)
        titles = np.empty(n, object)
        artists = np.empty(n, object)
        for i in range(n):
            titles[i] = f"t{i}"
            artists[i] = f"a{i}"
        # exact duplicate runs (distance exactly 0 on every path),
        # including one at the start and one covering the tail
        vecs[1] = vecs[0]
        for j in range(n - 3, n):
            vecs[j] = vecs[n - 4]
        for _ in range(int(rng.integers(2, 12))):
            i = int(rng.integers(1, n))
            vecs[i] = vecs[i - 1]
        # metadata-only duplicates (far vectors, same title+artist)
        for _ in range(4):
            i = int(rng.integers(1, n))
            titles[i] = titles[i - 1]
            artists[i] = artists[i - 1]
        songs = [
            Song(
                path=pathlib.Path(f"/seam/{trial}/{i}.flac"),
                title=titles[i],
                artist=artists[i],
                analysis=Analysis(vecs[i], FeaturesVersion.VERSION2),
            )
            for i in range(n)
        ]
        derived = dedup_playlist_custom_distance(
            songs, None, euclidean_distance
        )
        seam = dedup_playlist_custom_distance(
            songs, None, euclidean_distance,
            matrix=vecs, metadata=(titles, artists),
        )
        scalar = dedup_playlist_custom_distance(
            songs, None, _ScalarEuclid()
        )
        paths = [str(s.path) for s in derived]
        assert [str(s.path) for s in seam] == paths
        assert [str(s.path) for s in scalar] == paths


def test_dedup_matrix_metadata_validated():
    from bliss_tpu.playlist import (
        dedup_playlist_custom_distance,
        euclidean_distance,
    )

    songs = [
        Song(
            path=pathlib.Path(f"/v/{i}.flac"),
            title=f"t{i}",
            artist=f"a{i}",
            analysis=Analysis(
                np.full(23, i, np.float32), FeaturesVersion.VERSION2
            ),
        )
        for i in range(3)
    ]
    with pytest.raises(ProviderError):
        dedup_playlist_custom_distance(
            songs, None, euclidean_distance,
            matrix=np.zeros((2, 23), np.float32),
        )
    with pytest.raises(ProviderError):
        dedup_playlist_custom_distance(
            songs, None, euclidean_distance,
            metadata=(np.empty(2, object), np.empty(3, object)),
        )
