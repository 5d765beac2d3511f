"""Library integration tests with a dummy decoder, mirroring the
reference's approach (src/library.rs:1762-1850: DummyDecoder +
setup_test_library without real audio)."""

import json
import pathlib

import numpy as np
import pytest

from bliss_tpu import Analysis, AnalysisOptions, FeaturesVersion, Song
from bliss_tpu.errors import AnalysisError, ProviderError
from bliss_tpu.io.decoder import Decoder, PreAnalyzedSong
from bliss_tpu.library import (
    BaseConfig,
    Library,
    LibrarySong,
    ProcessingError,
    SQLITE_MIGRATIONS,
)
from bliss_tpu.playlist import closest_to_songs, euclidean_distance, song_to_song
from bliss_tpu.song import CueInfo


class DummyDecoder(Decoder):
    """Returns empty samples: analysis fails with 'too short'
    (reference src/library.rs:1792-1799)."""

    @classmethod
    def decode(cls, path):
        return PreAnalyzedSong(path=pathlib.Path(path))


def _song(path, n, album=None, track=None, artist=None, title=None):
    vec = np.full(23, n, dtype=np.float32)
    return Song(
        path=pathlib.Path(path),
        artist=artist,
        title=title,
        album=album,
        track_number=track,
        analysis=Analysis(vec, FeaturesVersion.VERSION2),
        duration=10.0,
    )


@pytest.fixture
def library(tmp_path):
    config = BaseConfig(
        config_path=tmp_path / "config.json",
        database_path=tmp_path / "songs.db",
    )
    return Library(config, DummyDecoder)


def test_schema_created(library):
    tables = {
        r[0]
        for r in library.sqlite_conn.execute(
            "select name from sqlite_master where type='table'"
        )
    }
    assert {"song", "feature", "training_triplet"} <= tables
    version = library.sqlite_conn.execute("pragma user_version").fetchone()[0]
    assert version == len(SQLITE_MIGRATIONS)


def test_config_roundtrip(tmp_path):
    config = BaseConfig(
        config_path=tmp_path / "c.json", database_path=tmp_path / "db.db"
    )
    config.write()
    loaded = BaseConfig.from_path(tmp_path / "c.json")
    assert loaded.config_path == config.config_path
    assert loaded.database_path == config.database_path
    np.testing.assert_array_equal(loaded.m, np.eye(23, dtype=np.float32))


def test_config_path_inference(tmp_path):
    # only config path → db goes next to it (src/library.rs:343-390)
    c = BaseConfig(config_path=tmp_path / "sub" / "c.json")
    assert c.database_path == tmp_path / "sub" / "songs.db"
    c = BaseConfig(database_path=tmp_path / "sub" / "db.db")
    assert c.config_path == tmp_path / "sub" / "config.json"


def test_sample_config_format(data_dir, tmp_path):
    """The reference's sample-config.json (with an app-specific flattened
    field) loads and round-trips."""
    config = BaseConfig.from_path(data_dir / "sample-config.json")
    assert config.analysis_options.features_version == FeaturesVersion.VERSION1
    assert config.analysis_options.number_cores == 8
    assert config.extra["mpd_base_path"] == "/tmp/MPD"
    assert config.m.shape == (20, 20)
    d = config.to_dict()
    assert d["m"]["dim"] == [20, 20]
    assert d["mpd_base_path"] == "/tmp/MPD"


def test_store_and_retrieve_song(library):
    song = _song("/tmp/a.flac", 0.5, album="Al", track=1, artist="A", title="T")
    library.store_song(LibrarySong(song, {"ignore": True}))
    got = library.song_from_path("/tmp/a.flac")
    assert got.bliss_song.title == "T"
    assert got.extra_info == {"ignore": True}
    np.testing.assert_allclose(
        got.bliss_song.analysis.as_arr1(), song.analysis.as_arr1()
    )


def test_store_song_overrides(library):
    library.store_song(LibrarySong(_song("/tmp/a.flac", 0.5), None))
    library.store_song(LibrarySong(_song("/tmp/a.flac", 0.7), None))
    got = library.song_from_path("/tmp/a.flac")
    assert got.bliss_song.analysis[0] == np.float32(0.7)
    count = library.sqlite_conn.execute(
        "select count(*) from song"
    ).fetchone()[0]
    assert count == 1
    fcount = library.sqlite_conn.execute(
        "select count(*) from feature"
    ).fetchone()[0]
    assert fcount == 23


def test_cue_info_roundtrip(library):
    song = _song("/tmp/a.cue/CUE_TRACK001", 0.1)
    song.cue_info = CueInfo(
        cue_path=pathlib.Path("/tmp/a.cue"),
        audio_file_path=pathlib.Path("/tmp/a.flac"),
    )
    library.store_song(LibrarySong(song, None))
    got = library.song_from_path("/tmp/a.cue/CUE_TRACK001")
    assert got.bliss_song.cue_info.cue_path == pathlib.Path("/tmp/a.cue")


def test_failed_songs(library):
    library.store_failed_song(
        "/tmp/bad.flac", AnalysisError("boom"), FeaturesVersion.VERSION2
    )
    failed = library.get_failed_songs()
    assert len(failed) == 1
    assert failed[0].song_path == pathlib.Path("/tmp/bad.flac")
    assert "boom" in failed[0].error
    # a failed song is not analyzed
    with pytest.raises(ProviderError):
        library.song_from_path("/tmp/bad.flac")


def test_songs_from_library(library):
    for i in range(5):
        library.store_song(LibrarySong(_song(f"/tmp/{i}.flac", i / 10), i))
    songs = library.songs_from_library()
    assert len(songs) == 5
    assert [s.extra_info for s in songs] == [0, 1, 2, 3, 4]


def test_songs_from_album(library):
    library.store_song(
        LibrarySong(_song("/tmp/1.flac", 0.1, album="X", track=2), None)
    )
    library.store_song(
        LibrarySong(_song("/tmp/2.flac", 0.2, album="X", track=1), None)
    )
    library.store_song(
        LibrarySong(_song("/tmp/3.flac", 0.3, album="Y", track=1), None)
    )
    songs = library.songs_from_album("X")
    assert [s.bliss_song.track_number for s in songs] == [1, 2]
    with pytest.raises(ProviderError):
        library.songs_from_album("Nonexistent")


def test_delete_paths(library):
    for i in range(3):
        library.store_song(LibrarySong(_song(f"/tmp/{i}.flac", i / 10), None))
    assert library.delete_paths(["/tmp/0.flac", "/tmp/1.flac", "/nope"]) == 2
    assert len(library.songs_from_library()) == 1
    with pytest.raises(ProviderError):
        library.delete_path("/tmp/0.flac")
    library.delete_path("/tmp/2.flac")
    assert library.songs_from_library() == []


def test_playlist_from(library):
    for i in range(10):
        library.store_song(LibrarySong(_song(f"/tmp/{i}.flac", i), None))
    playlist = library.playlist_from(["/tmp/0.flac"])
    paths = [str(s.bliss_song.path) for s in playlist]
    assert paths[0] == "/tmp/0.flac"
    # ordered by distance from song 0 = ascending feature value
    assert paths == [f"/tmp/{i}.flac" for i in range(10)]


def test_playlist_from_custom_song_to_song(library):
    for i in range(5):
        library.store_song(LibrarySong(_song(f"/tmp/{i}.flac", i), None))
    playlist = library.playlist_from_custom(
        ["/tmp/2.flac"], euclidean_distance, song_to_song, False
    )
    paths = [str(s.bliss_song.path) for s in playlist]
    assert paths[0] == "/tmp/2.flac"
    assert set(paths) == {f"/tmp/{i}.flac" for i in range(5)}


def test_playlist_from_not_analyzed(library):
    with pytest.raises(ProviderError, match="has not been analyzed"):
        library.playlist_from(["/tmp/none.flac"])


def test_album_playlist_from(library):
    # albums X (seed), Y (close), Z (far)
    for i, (album, val) in enumerate(
        [("X", 0.0), ("X", 0.01), ("Y", 0.2), ("Y", 0.21), ("Z", 5.0)]
    ):
        library.store_song(
            LibrarySong(
                _song(f"/tmp/{i}.flac", val, album=album, track=i), None
            )
        )
    playlist = library.album_playlist_from("X", 1)
    albums = [s.bliss_song.album for s in playlist]
    assert albums == ["X", "X", "Y", "Y"]


def test_update_library_incremental(library, monkeypatch):
    # store a song pre-analyzed at the current version; update_library
    # should skip it and only try the new one
    library.store_song(LibrarySong(_song("/tmp/old.flac", 0.1), None))
    attempted = []

    class TrackingDecoder(DummyDecoder):
        @classmethod
        def decode(cls, path):
            attempted.append(str(path))
            return super().decode(path)

    library.decoder_cls = TrackingDecoder
    library.update_library(["/tmp/old.flac", "/tmp/new.flac"])
    assert attempted == ["/tmp/new.flac"]
    # the new song failed analysis (dummy decoder yields empty samples)
    failed = library.get_failed_songs()
    assert [str(f.song_path) for f in failed] == ["/tmp/new.flac"]


def test_update_library_delete_everything_else(library):
    library.store_song(LibrarySong(_song("/tmp/a.flac", 0.1), None))
    library.store_song(LibrarySong(_song("/tmp/b.flac", 0.2), None))
    library.update_library(["/tmp/a.flac"], delete_everything_else=True)
    songs = library.songs_from_library()
    assert [str(s.bliss_song.path) for s in songs] == ["/tmp/a.flac"]


def test_version_sanity_check(library):
    assert library.version_sanity_check() == []
    library.store_song(LibrarySong(_song("/tmp/a.flac", 0.1), None))
    assert library.version_sanity_check() == []
    old = _song("/tmp/b.flac", 0.2)
    old.features_version = FeaturesVersion.VERSION1
    old.analysis = Analysis(np.zeros(20, np.float32), FeaturesVersion.VERSION1)
    library.store_song(LibrarySong(old, None))
    errors = library.version_sanity_check()
    assert len(errors) == 2
    kinds = {e.kind for e in errors}
    assert kinds == {"multiple_versions", "old_version"}


def test_old_database_upgrade(tmp_path, data_dir):
    """Replaying the reference's old_database.sql fixture + migrations
    (src/library.rs:3937+)."""
    import sqlite3

    db_path = tmp_path / "old.db"
    conn = sqlite3.connect(db_path)
    conn.executescript((data_dir / "old_database.sql").read_text())
    conn.commit()
    pre_version = conn.execute("pragma user_version").fetchone()[0]
    conn.close()

    config = BaseConfig(
        config_path=tmp_path / "config.json", database_path=db_path
    )
    library = Library(config, DummyDecoder)
    assert (
        library.sqlite_conn.execute("pragma user_version").fetchone()[0]
        == len(SQLITE_MIGRATIONS)
        > pre_version
    )
    # migration 1 converts textual track numbers: "01" → 1, garbage → NULL
    # (reference asserts the same, src/library.rs:3958-3983)
    tn = library.sqlite_conn.execute(
        "select track_number from song where id = 1"
    ).fetchone()[0]
    assert tn == 1
    for song_id in (2, 3, 4):
        row = library.sqlite_conn.execute(
            "select track_number from song where id = ?", (song_id,)
        ).fetchone()
        if row is not None:
            assert row[0] is None
    # idempotent: re-opening runs no migrations and keeps the version
    library2 = Library(config, DummyDecoder)
    assert (
        library2.sqlite_conn.execute("pragma user_version").fetchone()[0]
        == len(SQLITE_MIGRATIONS)
    )


def test_feature_matrix(library):
    for i in range(4):
        library.store_song(LibrarySong(_song(f"/tmp/{i}.flac", i / 10), None))
    paths, mat = library.feature_matrix()
    assert mat.shape == (4, 23)
    assert paths == [f"/tmp/{i}.flac" for i in range(4)]
    np.testing.assert_allclose(mat[2], np.full(23, 0.2, np.float32))


def test_from_config_path(tmp_path):
    config = BaseConfig(
        config_path=tmp_path / "c.json", database_path=tmp_path / "db.db"
    )
    lib = Library(config, DummyDecoder)
    lib.store_song(LibrarySong(_song("/tmp/z.flac", 0.5), None))
    del lib
    lib2 = Library.from_config_path(tmp_path / "c.json", DummyDecoder)
    assert len(lib2.songs_from_library()) == 1


# --- cached feature-matrix query path (round 3) -----------------------------


def _random_song(rng, path, album=None):
    vec = rng.uniform(-1, 1, 23).astype(np.float32)
    return Song(
        path=pathlib.Path(path),
        album=album,
        analysis=Analysis(vec, FeaturesVersion.VERSION2),
        duration=10.0,
    )


@pytest.fixture
def filled_library(library):
    rng = np.random.default_rng(42)
    for i in range(30):
        library.store_song(
            LibrarySong(_random_song(rng, f"/music/{i:03d}.flac"), None)
        )
    return library


def _generic_playlist(lib, seeds, distance, sort_by):
    """The pre-cache reference semantics, straight from the SQL zipper."""
    initial = [lib.song_from_path(p) for p in seeds]
    path_set = set(seeds)
    pool = [
        s
        for s in lib.songs_from_library()
        if str(s.bliss_song.path) not in path_set
    ]
    from bliss_tpu.playlist import dedup_playlist_custom_distance

    playlist = initial + list(sort_by(initial, pool, distance))
    return dedup_playlist_custom_distance(playlist, None, distance)


@pytest.mark.parametrize("sorter", [closest_to_songs, song_to_song])
def test_cached_query_matches_generic(filled_library, sorter):
    seeds = ["/music/003.flac", "/music/011.flac"]
    fast = filled_library.playlist_from_custom(
        seeds, euclidean_distance, sorter, True
    )
    slow = _generic_playlist(
        filled_library, seeds, euclidean_distance, sorter
    )
    assert [str(s.bliss_song.path) for s in fast] == [
        str(s.bliss_song.path) for s in slow
    ]


def test_cached_query_forest_metric(filled_library):
    from bliss_tpu.playlist import ForestOptions

    seeds = [f"/music/{i:03d}.flac" for i in range(6)]
    forest = ForestOptions(n_trees=20, seed=3)
    fast = filled_library.playlist_from_custom(
        seeds, forest, closest_to_songs, False
    )
    slow = _generic_playlist(
        filled_library, seeds, ForestOptions(n_trees=20, seed=3),
        closest_to_songs,
    )
    # forest scoring is deterministic given the seed; orders must agree
    assert [str(s.bliss_song.path) for s in fast][: len(slow)] == [
        str(s.bliss_song.path) for s in slow
    ]


@pytest.fixture
def dupes_library(library):
    """A library dense with dedup triggers: clusters of near-identical
    vectors (within the 0.05 threshold, incl. chains longer than 2 so
    the post-drop scalar rechecks run), shared non-null (title, artist)
    pairs across distant vectors, and None metadata."""
    rng = np.random.default_rng(7)
    n = 0

    def store(vec, title=None, artist=None):
        nonlocal n
        song = Song(
            path=pathlib.Path(f"/music/d{n:03d}.flac"),
            title=title,
            artist=artist,
            analysis=Analysis(
                np.asarray(vec, np.float32), FeaturesVersion.VERSION2
            ),
            duration=10.0,
        )
        library.store_song(LibrarySong(song, None))
        n += 1

    for c in range(6):
        base = rng.uniform(-1, 1, 23)
        # chains of 1-4 near-duplicates around each cluster center
        for j in range(1 + c % 4):
            store(base + rng.uniform(-0.004, 0.004, 23), f"t{c}", f"a{c}")
        # a metadata twin far away in feature space
        store(rng.uniform(-1, 1, 23), f"t{c}", f"a{c}")
        # None-metadata neighbours (must NOT dedup on metadata)
        store(base + rng.uniform(-0.004, 0.004, 23), None, f"a{c}")
        store(rng.uniform(-1, 1, 23))
    return library, n


@pytest.mark.parametrize(
    "distance",
    [
        euclidean_distance,
        pytest.param("cosine", id="cosine"),
        pytest.param("mahal", id="mahal"),
    ],
)
def test_fused_dedup_matches_generic(dupes_library, distance):
    """The fused device order+dedup program behind playlist_from must
    reproduce the generic list-walk dedup exactly — duplicates, chains,
    metadata twins and None metadata included."""
    from bliss_tpu.playlist import (
        cosine_distance,
        mahalanobis_distance_builder,
    )

    lib, n = dupes_library
    if distance == "cosine":
        distance = cosine_distance
    elif distance == "mahal":
        rng = np.random.default_rng(3)
        a = rng.uniform(0.2, 1.0, 23).astype(np.float32)
        distance = mahalanobis_distance_builder(np.diag(a))
    seeds = ["/music/d000.flac", "/music/d005.flac"]
    fast = lib.playlist_from_custom(seeds, distance, closest_to_songs, True)
    slow = _generic_playlist(lib, seeds, distance, closest_to_songs)
    assert len(fast) < n + 2  # the dedup actually dropped songs
    assert [str(s.bliss_song.path) for s in fast] == [
        str(s.bliss_song.path) for s in slow
    ]


def test_fused_dedup_single_seed_cluster(dupes_library):
    """Seeding from inside a duplicate cluster: the seed's own twins are
    the first ordered rows, so the initial->ordered boundary pair and
    the following chain all dedup."""
    lib, _ = dupes_library
    fast = lib.playlist_from(["/music/d001.flac"])
    slow = _generic_playlist(
        lib, ["/music/d001.flac"], euclidean_distance, closest_to_songs
    )
    assert [str(s.bliss_song.path) for s in fast] == [
        str(s.bliss_song.path) for s in slow
    ]


def test_matrix_cache_invalidation(filled_library):
    lib = filled_library
    songs1, mat1, n1 = lib._cached_library()
    assert n1 == 30
    # a second call returns the same cached objects
    songs2, mat2, _ = lib._cached_library()
    assert songs1 is songs2 and mat1 is mat2
    # device form is built lazily and cached
    dev1 = lib._device_matrix()
    assert lib._device_matrix() is dev1
    # store → invalidated
    rng = np.random.default_rng(1)
    lib.store_song(LibrarySong(_random_song(rng, "/music/new.flac"), None))
    songs3, _, n3 = lib._cached_library()
    assert songs3 is not songs1 and n3 == 31
    # delete → invalidated
    lib.delete_path("/music/new.flac")
    _, _, n4 = lib._cached_library()
    assert n4 == 30
    # failed-song store → invalidated (conservative)
    from bliss_tpu.errors import AnalysisError as AErr

    lib.store_failed_song("/music/broken.flac", AErr("x"))
    assert lib._matrix_cache is None


def test_cached_query_after_mutation(filled_library):
    """A playlist after store+delete mutations must reflect the DB."""
    lib = filled_library
    lib.playlist_from(["/music/000.flac"])  # builds the cache
    rng = np.random.default_rng(9)
    clone = _random_song(rng, "/music/clone.flac")
    seed_vec = np.asarray(
        lib.song_from_path("/music/000.flac").bliss_song.analysis.as_arr1()
    ).copy()
    # near the seed but past the 0.05 dedup threshold: ranks first, kept
    seed_vec[0] += 0.06
    clone.analysis = Analysis(seed_vec, FeaturesVersion.VERSION2)
    lib.store_song(LibrarySong(clone, None))
    out = lib.playlist_from(["/music/000.flac"])
    paths = [str(s.bliss_song.path) for s in out]
    assert paths.index("/music/clone.flac") == 1
    lib.delete_path("/music/clone.flac")
    out2 = lib.playlist_from(["/music/000.flac"])
    assert "/music/clone.flac" not in [
        str(s.bliss_song.path) for s in out2
    ]
