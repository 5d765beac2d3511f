"""Library tests over the reference's canonical test fixture — a DB
populated with the exact rows of `setup_test_library`
(/root/reference/src/library.rs:1838-2150): songs 1001..9001 plus two
CUE tracks, a non-analyzed row, old-version rows, and two failed rows.
Each test cites the reference test it ports."""

import json
import pathlib

import numpy as np
import pytest

from bliss_tpu import FeaturesVersion, NUMBER_FEATURES
from bliss_tpu.errors import ProviderError
from bliss_tpu.io.decoder import Decoder, PreAnalyzedSong
from bliss_tpu.library import (
    BaseConfig,
    Library,
    ProcessingError,
    SQLITE_MIGRATIONS,
)
from bliss_tpu.playlist import closest_to_songs, euclidean_distance


class DummyDecoder(Decoder):
    @classmethod
    def decode(cls, path):
        return PreAnalyzedSong(path=pathlib.Path(path))


NEW_V = int(FeaturesVersion.latest())
OLD_V = int(FeaturesVersion.VERSION1)

_SONG_ROWS = [
    # (id, path, artist, title, album, album_artist, track, disc, genre,
    #  duration, analyzed, version, extra_info, cue_path, audio_path, error)
    (1001, "/path/to/song1001", "Artist1001", "Title1001", "An Album1001",
     "An Album Artist1001", 3, 1, "Electronica1001", 310, 1, NEW_V,
     '{"ignore": true, "metadata_bliss_does_not_have": "/path/to/charlie1001"}',
     None, None, None),
    (2001, "/path/to/song2001", "Artist2001", "Title2001", "An Album2001",
     "An Album Artist2001", 2, 1, "Electronica2001", 410, 1, NEW_V,
     '{"ignore": false, "metadata_bliss_does_not_have": "/path/to/charlie2001"}',
     None, None, None),
    (2201, "/path/to/song2201", "Artist2001", "Title2001", "An Album2001",
     "An Album Artist2001", 1, 2, "Electronica2001", 410, 1, NEW_V,
     '{"ignore": false, "metadata_bliss_does_not_have": "/path/to/charlie2201"}',
     None, None, None),
    (3001, "/path/to/song3001", None, None, None, None, None, None, None,
     None, 0, NEW_V, "{}", None, None, None),
    (4001, "/path/to/song4001", "Artist4001", "Title4001", "An Album4001",
     "An Album Artist4001", 1, 1, "Electronica4001", 510, 1, OLD_V,
     '{"ignore": false, "metadata_bliss_does_not_have": "/path/to/charlie4001"}',
     None, None, None),
    (5001, "/path/to/song5001", "Artist5001", "Title5001", "An Album1001",
     "An Album Artist5001", 1, 1, "Electronica5001", 610, 1, NEW_V,
     '{"ignore": false, "metadata_bliss_does_not_have": "/path/to/charlie5001"}',
     None, None, None),
    (6001, "/path/to/song6001", "Artist6001", "Title6001", "An Album2001",
     "An Album Artist6001", 1, 1, "Electronica6001", 710, 1, NEW_V,
     '{"ignore": false, "metadata_bliss_does_not_have": "/path/to/charlie6001"}',
     None, None, None),
    (7001, "/path/to/song7001", "Artist7001", "Title7001", "An Album7001",
     "An Album Artist7001", 1, 1, "Electronica7001", 810, 1, NEW_V,
     '{"ignore": false, "metadata_bliss_does_not_have": "/path/to/charlie7001"}',
     None, None, None),
    (7002, "/path/to/cuetrack.cue/CUE_TRACK001", "CUE Artist", "CUE Title 01",
     "CUE Album", "CUE Album Artist", 1, 1, None, 810, 1, NEW_V,
     '{"ignore": false, "metadata_bliss_does_not_have": "/path/to/charlie7001"}',
     "/path/to/cuetrack.cue", "/path/to/cuetrack.flac", None),
    (7003, "/path/to/cuetrack.cue/CUE_TRACK002", "CUE Artist", "CUE Title 02",
     "CUE Album", "CUE Album Artist", 2, 1, None, 910, 1, NEW_V,
     '{"ignore": false, "metadata_bliss_does_not_have": "/path/to/charlie7001"}',
     "/path/to/cuetrack.cue", "/path/to/cuetrack.flac", None),
    (8001, "/path/to/song8001", "Artist8001", "Title8001", "An Album1001",
     "An Album Artist8001", 3, 1, "Electronica8001", 910, 1, OLD_V,
     '{"ignore": false, "metadata_bliss_does_not_have": "/path/to/charlie8001"}',
     None, None, None),
    (9001, "./data/s16_stereo_22_5kHz.flac", "Artist9001", "Title9001",
     "An Album9001", "An Album Artist8001", 3, 1, "Electronica8001", 1010, 1,
     OLD_V,
     '{"ignore": false, "metadata_bliss_does_not_have": "/path/to/charlie7001"}',
     None, None, None),
    (404, "./data/not-existing.m4a", None, None, None, None, None, None,
     None, None, 0, OLD_V, None, None, None, "error finding the file"),
    (502, "./data/invalid-file.m4a", None, None, None, None, None, None,
     None, None, 0, OLD_V, None, None, None, "error decoding the file"),
]

#: song_id -> per-index feature value (the reference's analysis vectors)
_FEATURES = {
    1001: lambda i: i / 10.0,
    2001: lambda i: i + 10.0,
    2201: lambda i: i + 10.0,
    3001: lambda i: i / 10.0 + 1.0,
    5001: lambda i: i / 2.0,
    6001: lambda i: i * 0.9,
    7001: lambda i: i * 50.0,
    7002: lambda i: i * 100.0,
    7003: lambda i: i * 101.0,
}


@pytest.fixture
def ref_library(tmp_path):
    config = BaseConfig(
        config_path=tmp_path / "config.json",
        database_path=tmp_path / "bliss.db",
    )
    library = Library(config, DummyDecoder)
    conn = library.sqlite_conn
    conn.executemany(
        "insert into song (id, path, artist, title, album, album_artist,"
        " track_number, disc_number, genre, duration, analyzed, version,"
        " extra_info, cue_path, audio_file_path, error)"
        " values (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?)",
        _SONG_ROWS,
    )
    for song_id, f in _FEATURES.items():
        conn.executemany(
            "insert into feature (song_id, feature, feature_index)"
            " values (?, ?, ?)",
            [(song_id, np.float32(f(i)).item(), i)
             for i in range(NUMBER_FEATURES)],
        )
    # "Imaginary version 0 of bliss with less features" — 18 features at
    # shifted indices for the two old-version rows
    for song_id in (8001, 9001):
        conn.executemany(
            "insert into feature (song_id, feature, feature_index)"
            " values (?, ?, ?)",
            [(song_id, np.float32(i / 20.0).item(), i + 1)
             for i in range(NUMBER_FEATURES - 5)],
        )
    conn.commit()
    return library


def _paths(songs):
    return [str(s.bliss_song.path) for s in songs]


def test_library_simple_playlist(ref_library):
    """src/library.rs test_library_simple_playlist: euclidean playlist
    from song2001; the identical-vector song2201 is deduplicated."""
    assert _paths(ref_library.playlist_from(["/path/to/song2001"])) == [
        "/path/to/song2001",
        "/path/to/song6001",
        "/path/to/song5001",
        "/path/to/song1001",
        "/path/to/song7001",
        "/path/to/cuetrack.cue/CUE_TRACK001",
        "/path/to/cuetrack.cue/CUE_TRACK002",
    ]


def test_library_playlist_take(ref_library):
    """src/library.rs test_library_playlist_take: .take(4)."""
    playlist = ref_library.playlist_from(["/path/to/song2001"])
    assert _paths(playlist[:4]) == [
        "/path/to/song2001",
        "/path/to/song6001",
        "/path/to/song5001",
        "/path/to/song1001",
    ]


def test_library_playlist_dupe_order_preserved(ref_library):
    """src/library.rs test_library_playlist_dupe_order_preserved: no
    dedup — the dupe follows its twin immediately."""
    playlist = ref_library.playlist_from_custom(
        ["/path/to/song2201"], euclidean_distance, closest_to_songs, False
    )
    assert _paths(playlist) == [
        "/path/to/song2201",
        "/path/to/song2001",
        "/path/to/song6001",
        "/path/to/song5001",
        "/path/to/song1001",
        "/path/to/song7001",
        "/path/to/cuetrack.cue/CUE_TRACK001",
        "/path/to/cuetrack.cue/CUE_TRACK002",
    ]


def test_library_playlist_song_not_existing(ref_library):
    """src/library.rs test_library_playlist_song_not_existing."""
    with pytest.raises(ProviderError):
        ref_library.playlist_from(["not-existing"])


def test_library_album_playlist_crop(ref_library):
    """src/library.rs test_library_album_playlist_crop: seed album plus
    exactly one more album, that album in (disc, track) order."""
    album = ref_library.album_playlist_from("An Album1001", 1)
    assert _paths(album) == [
        "/path/to/song5001",
        "/path/to/song1001",
        "/path/to/song6001",
        "/path/to/song2001",
        "/path/to/song2201",
    ]


def test_songs_from_library_ref_fixture(ref_library):
    """src/library.rs test_songs_from_library: the 8 analyzed
    latest-version songs (not 3001/4001/8001/9001/404/502)."""
    songs = ref_library.songs_from_library()
    assert _paths(songs) == [
        "/path/to/song1001",
        "/path/to/song2001",
        "/path/to/song2201",
        "/path/to/song5001",
        "/path/to/song6001",
        "/path/to/song7001",
        "/path/to/cuetrack.cue/CUE_TRACK001",
        "/path/to/cuetrack.cue/CUE_TRACK002",
    ]

    # extra_info round-trips as structured JSON
    first = songs[0]
    assert first.extra_info == {
        "ignore": True,
        "metadata_bliss_does_not_have": "/path/to/charlie1001",
    }
    np.testing.assert_allclose(
        first.bliss_song.analysis.as_arr1(),
        np.arange(NUMBER_FEATURES, dtype=np.float32) / 10.0,
    )


def test_songs_from_library_screwed_db(ref_library):
    """src/library.rs test_songs_from_library_screwed_db: an extra
    feature row yields the exact feature-count error message."""
    ref_library.sqlite_conn.execute(
        "insert into feature (song_id, feature, feature_index)"
        " values (2001, 1.5, 29)"
    )
    ref_library.sqlite_conn.commit()
    with pytest.raises(
        ProviderError,
        match=r"Song with ID 2001 and path /path/to/song2001 has a "
        r"different feature number than expected. Please rescan or "
        r"update the song library.",
    ):
        ref_library.songs_from_library()


def test_song_from_path_ref_fixture(ref_library):
    """src/library.rs test_song_from_path: full metadata equality."""
    song = ref_library.song_from_path("/path/to/song1001")
    s = song.bliss_song
    assert (s.artist, s.title, s.album, s.album_artist) == (
        "Artist1001", "Title1001", "An Album1001", "An Album Artist1001"
    )
    assert (s.track_number, s.disc_number, s.genre) == (
        3, 1, "Electronica1001"
    )
    assert s.duration == 310
    assert s.features_version == FeaturesVersion.latest()


def test_song_from_path_not_analyzed(ref_library):
    """src/library.rs test_song_from_path_not_analyzed: row exists with
    analyzed = false."""
    with pytest.raises(ProviderError):
        ref_library.song_from_path("/path/to/song3001")


def test_song_from_path_not_found(ref_library):
    """src/library.rs test_song_from_path_not_found."""
    with pytest.raises(ProviderError):
        ref_library.song_from_path("/path/to/randomsong")


def test_songs_from_album_proper_features_version(ref_library):
    """src/library.rs test_library_songs_from_album_proper_features_version:
    the old-version song8001 (same album) is excluded."""
    album = ref_library.songs_from_album("An Album1001")
    assert _paths(album) == ["/path/to/song5001", "/path/to/song1001"]


def test_songs_from_album_not_existing(ref_library):
    """src/library.rs test_library_songs_from_album_not_existing."""
    with pytest.raises(ProviderError):
        ref_library.songs_from_album("not-existing")


def test_library_get_failed_songs_ref_fixture(ref_library):
    """src/library.rs test_library_get_failed_songs: exact rows, in id
    order, carrying the stored version."""
    assert ref_library.get_failed_songs() == [
        ProcessingError(
            pathlib.Path("./data/not-existing.m4a"),
            "error finding the file",
            FeaturesVersion.VERSION1,
        ),
        ProcessingError(
            pathlib.Path("./data/invalid-file.m4a"),
            "error decoding the file",
            FeaturesVersion.VERSION1,
        ),
    ]


def test_library_delete_path_removes_features(ref_library):
    """src/library.rs test_library_delete_path: the song row AND its
    feature rows disappear."""
    n_feat = ref_library.sqlite_conn.execute(
        "select count(*) from feature join song on song.id = feature.song_id"
        " where song.path = '/path/to/song1001'"
    ).fetchone()[0]
    assert n_feat == NUMBER_FEATURES
    ref_library.delete_path("/path/to/song1001")
    n_feat = ref_library.sqlite_conn.execute(
        "select count(*) from feature join song on song.id = feature.song_id"
        " where song.path = '/path/to/song1001'"
    ).fetchone()[0]
    assert n_feat == 0
    with pytest.raises(ProviderError):
        ref_library.song_from_path("/path/to/song1001")


def test_library_delete_path_non_existing(ref_library):
    """src/library.rs test_library_delete_path_non_existing."""
    with pytest.raises(ProviderError):
        ref_library.delete_path("not-existing")


def test_library_delete_paths_empty_and_non_existing(ref_library):
    """src/library.rs test_library_delete_paths_empty/_non_existing:
    both report zero deletions and leave the library untouched."""
    before = len(ref_library.songs_from_library())
    assert ref_library.delete_paths([]) == 0
    assert ref_library.delete_paths(["/nope", "/also/nope"]) == 0
    assert len(ref_library.songs_from_library()) == before


def test_library_new_database_already_last_version(tmp_path):
    """src/library.rs test_library_new_database_already_last_version:
    re-opening an up-to-date DB leaves user_version at the latest."""
    config_file = tmp_path / "config.txt"
    db_file = tmp_path / "test.db"
    Library.new_from_base(config_file, db_file, None, DummyDecoder)
    library = Library.new_from_base(config_file, db_file, None, DummyDecoder)
    version = library.sqlite_conn.execute("pragma user_version").fetchone()[0]
    assert version == len(SQLITE_MIGRATIONS)


def test_library_create_all_dirs(tmp_path):
    """src/library.rs test_library_create_all_dirs: nested non-existent
    config/db directories are created."""
    config_dir = tmp_path / "path" / "to"
    assert not config_dir.is_dir()
    Library.new_from_base(
        config_dir / "config.json", config_dir / "bliss.db", None,
        DummyDecoder,
    )
    assert config_dir.is_dir()


def test_library_new_default_write(tmp_path):
    """src/library.rs test_library_new_default_write: creating a Library
    writes the flattened config JSON (paths, features_version,
    number_cores, identity `m`) to disk."""
    config = BaseConfig(
        config_path=tmp_path / "config.json",
        database_path=tmp_path / "bliss.db",
    )
    library = Library(config, DummyDecoder)
    on_disk = json.loads((tmp_path / "config.json").read_text())
    assert on_disk["config_path"] == str(tmp_path / "config.json")
    assert on_disk["database_path"] == str(tmp_path / "bliss.db")
    assert on_disk["features_version"] == int(FeaturesVersion.latest())
    assert on_disk["number_cores"] == int(
        library.config.analysis_options.number_cores
    )
    assert on_disk["m"]["v"] == 1
    assert on_disk["m"]["dim"] == [NUMBER_FEATURES, NUMBER_FEATURES]
    np.testing.assert_array_equal(
        np.asarray(on_disk["m"]["data"], np.float32).reshape(
            NUMBER_FEATURES, NUMBER_FEATURES
        ),
        np.eye(NUMBER_FEATURES, dtype=np.float32),
    )


# --- extra_info analysis/update drivers (src/library.rs:2162-2566) ---------


class NoiseDecoder(Decoder):
    """Succeeds with 1s of deterministic noise for real-looking paths;
    fails for /path/to/* ghosts and non-existing entries — mirroring the
    reference tests' mix of real fixtures and dead DB paths."""

    @classmethod
    def decode(cls, path):
        import numpy as np

        from bliss_tpu.errors import DecodingError

        s = str(path)
        if s.startswith("/path/to/") or "non-existing" in s:
            raise DecodingError(f"while opening format for file '{s}'")
        rng = np.random.default_rng(abs(hash(s)) % 2**32)
        return PreAnalyzedSong(
            path=pathlib.Path(path),
            duration=1.0,
            sample_array=(rng.normal(size=22050) * 0.1).astype(np.float32),
        )


def _get_song_analyzed(library, path):
    row = library.sqlite_conn.execute(
        "select analyzed from song where path = ?", (path,)
    ).fetchone()
    return None if row is None else bool(row[0])


def test_update_extra_info(ref_library):
    """src/library.rs test_update_extra_info: per-path extra info is
    stored; the old-version song4001 is re-attempted (and fails here),
    and a non-existing path lands in the failed-songs ledger."""
    ref_library.decoder_cls = NoiseDecoder
    assert _get_song_analyzed(ref_library, "/path/to/song4001") is True

    paths = [
        ("/songs/a.flac", True),
        ("/songs/b.flac", False),
        ("/path/to/song4001", False),
        ("non-existing", False),
    ]
    ref_library.update_library_extra_info(paths, True, False)

    for path, expected_extra in paths[:2]:
        got = ref_library.song_from_path(path)
        assert got.extra_info is expected_extra
    # the old-version row was wiped and re-attempted: now a failed song
    assert _get_song_analyzed(ref_library, "/path/to/song4001") in (
        None,
        False,
    )
    failed = {str(f.song_path) for f in ref_library.get_failed_songs()}
    assert {"/path/to/song4001", "non-existing"} <= failed


def test_update_convert_extra_info(ref_library):
    """src/library.rs test_update_convert_extra_info: the converter maps
    the raw extra through (song, library)-aware logic before storage."""
    ref_library.decoder_cls = NoiseDecoder
    ref_library.update_library_convert_extra_info(
        [("/songs/a.flac", 7)],
        False,
        False,
        lambda extra, song, lib: {
            "n": extra,
            "path": str(song.path),
            "lib": lib is ref_library,
        },
        ref_library.config.analysis_options,
    )
    got = ref_library.song_from_path("/songs/a.flac")
    assert got.extra_info == {"n": 7, "path": "/songs/a.flac", "lib": True}


def test_update_convert_extra_info_do_not_delete(ref_library):
    """src/library.rs test_update_convert_extra_info_do_not_delete:
    delete_everything_else=False keeps unrelated analyzed songs."""
    ref_library.decoder_cls = NoiseDecoder
    before = len(ref_library.songs_from_library())
    ref_library.update_library_convert_extra_info(
        [("/songs/new.flac", None)],
        False,
        False,
        lambda extra, song, lib: extra,
        ref_library.config.analysis_options,
    )
    songs = ref_library.songs_from_library()
    assert len(songs) == before + 1
    assert "/path/to/song1001" in {str(s.bliss_song.path) for s in songs}


def test_analyze_paths_extra_info(tmp_path):
    """src/library.rs test_analyze_paths_extra_info: analysis stores the
    given extra info verbatim; failures are ledgered."""
    config = BaseConfig(
        config_path=tmp_path / "config.json",
        database_path=tmp_path / "bliss.db",
    )
    library = Library(config, NoiseDecoder)
    library.analyze_paths_extra_info(
        [("/songs/a.flac", {"mood": "calm"}), ("non-existing", None)], False
    )
    got = library.song_from_path("/songs/a.flac")
    assert got.extra_info == {"mood": "calm"}
    assert [str(f.song_path) for f in library.get_failed_songs()] == [
        "non-existing"
    ]


def test_analyze_paths_convert_extra_info(tmp_path):
    """src/library.rs test_analyze_paths_convert_extra_info."""
    config = BaseConfig(
        config_path=tmp_path / "config.json",
        database_path=tmp_path / "bliss.db",
    )
    library = Library(config, NoiseDecoder)
    library.analyze_paths_convert_extra_info(
        [("/songs/a.flac", "x")],
        False,
        lambda extra, song, lib: extra * 2,
        library.config.analysis_options,
    )
    assert library.song_from_path("/songs/a.flac").extra_info == "xx"
