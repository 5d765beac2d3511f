#!/usr/bin/env python
"""Print the distance between two songs.

Mirrors the reference `examples/distance.rs`.
Usage: python examples/distance.py <song1> <song2>
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from bliss_tpu.io.decoder import DefaultDecoder
from bliss_tpu.playlist import euclidean_distance


def main():
    if len(sys.argv) != 3:
        print("usage: distance.py <song1> <song2>", file=sys.stderr)
        return 1
    song1 = DefaultDecoder.song_from_path(sys.argv[1])
    song2 = DefaultDecoder.song_from_path(sys.argv[2])
    d = euclidean_distance(song1.analysis.as_arr1(), song2.analysis.as_arr1())
    print(f"d({song1.path}, {song2.path}) = {d}")
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # e.g. piped into `head`
        sys.exit(0)
