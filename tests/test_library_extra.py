"""Additional Library behaviors mirrored from the reference's test corpus
(src/library.rs:1850-4529)."""

import json
import pathlib

import numpy as np
import pytest

from bliss_tpu import Analysis, AnalysisOptions, FeaturesVersion, Song
from bliss_tpu.errors import ProviderError
from bliss_tpu.io.decoder import Decoder, PreAnalyzedSong
from bliss_tpu.library import BaseConfig, Library, LibrarySong
from bliss_tpu.playlist import ForestOptions, closest_to_songs, song_to_song


class DummyDecoder(Decoder):
    @classmethod
    def decode(cls, path):
        return PreAnalyzedSong(path=pathlib.Path(path))


def _song(path, n, **kw):
    vec = np.full(23, n, dtype=np.float32)
    return Song(
        path=pathlib.Path(path),
        analysis=Analysis(vec, FeaturesVersion.VERSION2),
        duration=10.0,
        **kw,
    )


@pytest.fixture
def library(tmp_path):
    config = BaseConfig(
        config_path=tmp_path / "config.json",
        database_path=tmp_path / "songs.db",
    )
    return Library(config, DummyDecoder)


def test_playlist_from_multiple_seeds(library):
    for i in range(8):
        library.store_song(LibrarySong(_song(f"/tmp/{i}.flac", i), None))
    playlist = library.playlist_from(["/tmp/0.flac", "/tmp/7.flac"])
    paths = [str(s.bliss_song.path) for s in playlist]
    assert paths[0] == "/tmp/0.flac"
    assert paths[1] == "/tmp/7.flac"
    assert set(paths) == {f"/tmp/{i}.flac" for i in range(8)}


def test_playlist_from_custom_no_dedup_keeps_duplicates(library):
    library.store_song(LibrarySong(_song("/tmp/a.flac", 0.0), None))
    library.store_song(LibrarySong(_song("/tmp/b.flac", 0.0), None))
    library.store_song(LibrarySong(_song("/tmp/c.flac", 1.0), None))
    from bliss_tpu.playlist import euclidean_distance

    with_dedup = library.playlist_from_custom(
        ["/tmp/a.flac"], euclidean_distance, closest_to_songs, True
    )
    without = library.playlist_from_custom(
        ["/tmp/a.flac"], euclidean_distance, closest_to_songs, False
    )
    assert len(without) == 3
    assert len(with_dedup) == 2  # identical-analysis b dropped


def test_playlist_from_custom_forest(library):
    rng = np.random.default_rng(0)
    for i in range(30):
        library.store_song(
            LibrarySong(
                Song(
                    path=pathlib.Path(f"/tmp/{i}.flac"),
                    analysis=Analysis(
                        rng.normal(0, 0.05, 23).astype(np.float32),
                        FeaturesVersion.VERSION2,
                    ),
                ),
                None,
            )
        )
    library.store_song(
        LibrarySong(
            Song(
                path=pathlib.Path("/tmp/outlier.flac"),
                analysis=Analysis(
                    np.full(23, 3.0, np.float32), FeaturesVersion.VERSION2
                ),
            ),
            None,
        )
    )
    forest = ForestOptions(n_trees=100, sample_size=20, seed=7)
    playlist = library.playlist_from_custom(
        ["/tmp/0.flac", "/tmp/1.flac", "/tmp/2.flac"],
        forest,
        closest_to_songs,
        False,
    )
    assert str(playlist[-1].bliss_song.path) == "/tmp/outlier.flac"


def test_store_song_utf8ish_path(library):
    song = _song("/tmp/éàçü — 日本語.flac", 0.5)
    library.store_song(LibrarySong(song, None))
    got = library.song_from_path("/tmp/éàçü — 日本語.flac")
    assert got.bliss_song.path == song.path


# An invalid-UTF-8 POSIX path (b"/tmp/invalid\xFF\xFE.mp3") as Python
# surfaces it: surrogate-escaped (src/library.rs test_*_utf8_failure).
_INVALID_PATH = pathlib.Path(
    b"/tmp/invalid\xff\xfe.mp3".decode("utf-8", "surrogateescape")
)


def test_store_song_utf8_failure(library):
    """Invalid-UTF-8 path -> ProviderError, nothing stored
    (src/library.rs:3631-3661 test_store_song_utf8_failure)."""
    song = _song(_INVALID_PATH, 0.5)
    with pytest.raises(ProviderError, match="unicode"):
        library.store_song(LibrarySong(song, None))
    count = library.sqlite_conn.execute(
        "select count(*) from song"
    ).fetchone()[0]
    assert count == 0


def test_delete_song_utf8_failure(library):
    """(src/library.rs:3663-3688 test_delete_song_utf8_failure)."""
    with pytest.raises(ProviderError, match="unicode"):
        library.delete_path(_INVALID_PATH)


def test_song_from_path_utf8_failure(library):
    """(src/library.rs:3690-3713 test_song_from_path_utf8_failure)."""
    with pytest.raises(ProviderError, match="unicode"):
        library.song_from_path(_INVALID_PATH)


def test_update_library_reanalyzes_old_version(library):
    """Songs analyzed with an older features version are wiped and
    reanalyzed when new paths arrive (src/library.rs:1073-1085)."""
    old = _song("/tmp/old.flac", 0.1)
    old.features_version = FeaturesVersion.VERSION1
    old.analysis = Analysis(np.zeros(20, np.float32), FeaturesVersion.VERSION1)
    library.store_song(LibrarySong(old, None))

    attempted = []

    class Tracking(DummyDecoder):
        @classmethod
        def decode(cls, path):
            attempted.append(str(path))
            return super().decode(path)

    library.decoder_cls = Tracking
    library.update_library(["/tmp/old.flac", "/tmp/new.flac"])
    # both paths reanalyzed: the v1 row was deleted
    assert set(attempted) == {"/tmp/old.flac", "/tmp/new.flac"}
    rows = library.sqlite_conn.execute(
        "select count(*) from song where version = 1"
    ).fetchone()[0]
    assert rows == 0


def test_config_setters_persist(tmp_path):
    config = BaseConfig(config_path=tmp_path / "c.json")
    Library(config, DummyDecoder)
    config.set_number_cores(3)
    config.set_features_version(FeaturesVersion.VERSION1)
    loaded = BaseConfig.from_path(tmp_path / "c.json")
    assert loaded.get_number_cores() == 3
    assert loaded.get_features_version() == FeaturesVersion.VERSION1


def test_library_song_as_ref_surface(library):
    """LibrarySong proxies the Song fields used by the playlist engine
    (the AsRef<Song> surface of the reference)."""
    s = _song("/tmp/a.flac", 0.2, title="T", artist="A", album="Al")
    ls = LibrarySong(s, {"x": 1})
    assert ls.title == "T" and ls.artist == "A" and ls.album == "Al"
    assert np.array_equal(ls.analysis.as_arr1(), s.analysis.as_arr1())


def test_training_triplet_table_usable(library):
    library.store_song(LibrarySong(_song("/tmp/a.flac", 0.1), None))
    library.store_song(LibrarySong(_song("/tmp/b.flac", 0.2), None))
    library.store_song(LibrarySong(_song("/tmp/c.flac", 0.9), None))
    ids = [
        r[0]
        for r in library.sqlite_conn.execute(
            "select id from song order by id"
        )
    ]
    library.sqlite_conn.execute(
        "insert into training_triplet (song_1_id, song_2_id, odd_one_out_id)"
        " values (?, ?, ?)",
        (ids[0], ids[1], ids[2]),
    )
    library.sqlite_conn.commit()
    n = library.sqlite_conn.execute(
        "select count(*) from training_triplet"
    ).fetchone()[0]
    assert n == 1


def test_library_analyze_paths_uses_batched_driver(tmp_path, data_dir):
    """`Library.analyze_paths` over mixed real songs goes through the
    TPU-batched driver and stores rows identical to the per-song path
    (VERDICT r1 item 3; reference driver src/library.rs:1187-1293)."""
    from bliss_tpu.io.decoder import FFmpegDecoder

    fixtures = [
        data_dir / "s16_mono_22_5kHz.flac",
        data_dir / "piano.flac",
        data_dir / "s32_stereo_44_1_kHz.mp3",
        data_dir / "s32_stereo_44_1_kHz.flac",
    ]
    paths = []
    for i in range(8):
        src = fixtures[i % len(fixtures)]
        p = tmp_path / f"song{i}{src.suffix}"
        p.symlink_to(src)
        paths.append(p)
    config = BaseConfig(
        config_path=tmp_path / "config.json",
        database_path=tmp_path / "songs.db",
    )
    library = Library(config, FFmpegDecoder)
    library.analyze_paths(paths)

    stored = {
        str(s.bliss_song.path): s.bliss_song.analysis.as_arr1()
        for s in library.songs_from_library()
    }
    assert len(stored) == 8
    single = {}
    for src in fixtures:
        single[src.suffix + src.name] = FFmpegDecoder.song_from_path(
            src
        ).analysis.as_arr1()
    for i, p in enumerate(paths):
        src = fixtures[i % len(fixtures)]
        np.testing.assert_allclose(
            stored[str(p)], single[src.suffix + src.name], atol=5e-5
        )
    assert library.get_failed_songs() == []


def test_library_respects_custom_batch_driver(tmp_path):
    """A decoder that overrides `analyze_paths_with_options` keeps its own
    driver (third-party decoder escape hatch)."""
    calls = []

    class CustomDriverDecoder(Decoder):
        @classmethod
        def decode(cls, path):
            return PreAnalyzedSong(path=pathlib.Path(path))

        @classmethod
        def analyze_paths_with_options(cls, paths, analysis_options):
            calls.append([str(p) for p in paths])
            return iter(())

    config = BaseConfig(
        config_path=tmp_path / "config.json",
        database_path=tmp_path / "songs.db",
    )
    library = Library(config, CustomDriverDecoder)
    library.analyze_paths(["/tmp/x.flac"])
    assert calls == [["/tmp/x.flac"]]


def test_upgrade_non_bliss_db_raises_provider_error(tmp_path):
    """Opening a Library over a non-bliss sqlite file surfaces a
    ProviderError, not a raw sqlite3 error (r2 review)."""
    import sqlite3

    db = tmp_path / "other.db"
    conn = sqlite3.connect(db)
    conn.executescript(
        "create table a(x); create table b(x); create table c(x);"
    )
    conn.commit()
    conn.close()
    config = BaseConfig(
        config_path=tmp_path / "config.json", database_path=db
    )
    with pytest.raises(ProviderError, match="could not upgrade database"):
        Library(config, DummyDecoder)


def test_feature_matrix_rejects_corrupt_counts(library):
    """A song with a deviant feature count raises instead of silently
    mispairing rows (r2 review)."""
    library.store_song(LibrarySong(_song("/tmp/a.flac", 0.1), None))
    library.store_song(LibrarySong(_song("/tmp/b.flac", 0.2), None))
    library.sqlite_conn.execute(
        "insert into feature (song_id, feature, feature_index)"
        " select id, 9.9, 23 from song where path = '/tmp/a.flac'"
    )
    library.sqlite_conn.commit()
    with pytest.raises(ProviderError, match="different feature number"):
        library.feature_matrix()


def test_song_distance_unanalyzed_raises_provider_error():
    """Song.distance on a metadata-only Song raises inside the
    BlissError family (r2 review)."""
    import pathlib as _p

    a = Song(path=_p.Path("a"))
    b = _song("/tmp/b.flac", 0.1)
    with pytest.raises(ProviderError, match="has not been analyzed"):
        a.distance(b)
