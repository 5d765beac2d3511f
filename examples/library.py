#!/usr/bin/env python
"""Library CLI: init / update / playlist, mirroring `examples/library.rs`.

Usage:
  python examples/library.py init <folder> -c config.json [-d songs.db]
  python examples/library.py update -c config.json <folder>
  python examples/library.py playlist -c config.json <song path> <n>
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from bliss_tpu.library import BaseConfig, Library

AUDIO_EXTENSIONS = {
    ".flac", ".mp3", ".ogg", ".wav", ".m4a", ".opus", ".cue",
}


def _folder_paths(folder):
    return sorted(
        str(p.resolve())
        for p in pathlib.Path(folder).rglob("*")
        if p.suffix.lower() in AUDIO_EXTENSIONS
    )


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_init = sub.add_parser("init")
    p_init.add_argument("folder")
    p_init.add_argument("-c", "--config", required=True)
    p_init.add_argument("-d", "--database", default=None)

    p_update = sub.add_parser("update")
    p_update.add_argument("folder")
    p_update.add_argument("-c", "--config", required=True)

    p_playlist = sub.add_parser("playlist")
    p_playlist.add_argument("song")
    p_playlist.add_argument("n", type=int)
    p_playlist.add_argument("-c", "--config", required=True)

    args = parser.parse_args()

    if args.cmd == "init":
        config = BaseConfig(
            config_path=pathlib.Path(args.config),
            database_path=(
                pathlib.Path(args.database) if args.database else None
            ),
        )
        library = Library(config)
        library.analyze_paths(_folder_paths(args.folder), show_progress_bar=True)
    elif args.cmd == "update":
        library = Library.from_config_path(args.config)
        library.update_library(
            _folder_paths(args.folder),
            delete_everything_else=True,
            show_progress_bar=True,
        )
    elif args.cmd == "playlist":
        library = Library.from_config_path(args.config)
        playlist = library.playlist_from([args.song])
        for song in playlist[: args.n]:
            print(song.bliss_song.path)
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # e.g. piped into `head`
        sys.exit(0)
