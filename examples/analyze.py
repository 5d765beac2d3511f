#!/usr/bin/env python
"""Analyze songs and print their feature vectors.

Mirrors the reference `examples/analyze.rs`.
Usage: python examples/analyze.py <song1> [<song2> ...]
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from bliss_tpu.io.decoder import DefaultDecoder


def main():
    paths = sys.argv[1:]
    if not paths:
        print("usage: analyze.py <song> [...]", file=sys.stderr)
        return 1
    for path, result in DefaultDecoder.analyze_paths(paths):
        if isinstance(result, Exception):
            print(f"error analyzing {path}: {result}", file=sys.stderr)
        else:
            print(f"{path}: {result.analysis.as_vec()}")
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # e.g. piped into `head`
        sys.exit(0)
