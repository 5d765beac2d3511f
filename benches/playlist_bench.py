#!/usr/bin/env python
"""Playlist-engine benchmark: p50 distance-query latency on a large
library (the second north-star metric from BASELINE.json).

Measures, at N=100k (default) synthetic 23-dim songs:
  * closest_to_songs ordering (full-library distance + sort)
  * top-k query via the device kernel
  * song_to_song chain of length 50 (pairwise matrix + greedy walk)

Usage: python benches/playlist_bench.py [--n 100000] [--queries 9]
"""

import argparse
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=100_000)
    parser.add_argument("--queries", type=int, default=9)
    args = parser.parse_args()

    import jax.numpy as jnp

    from bliss_tpu.playlist import (
        FunctionDistanceMetric,
        euclidean_distance,
        _batched_mahalanobis,
        _device_greedy_chain,
    )

    rng = np.random.default_rng(0)
    library = rng.normal(size=(args.n, 23)).astype(np.float32)
    eye = np.eye(23, dtype=np.float32)

    def p50(fn, queries=None):
        times = []
        fn()  # warm
        for _ in range(queries or args.queries):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return statistics.median(times)

    seed = [library[0]]
    t_dist = p50(lambda: _batched_mahalanobis(library, seed, eye))
    print(f"full-library distances (N={args.n}): p50 {t_dist*1e3:.1f} ms")

    def order():
        d = _batched_mahalanobis(library, seed, eye)
        np.argsort(d, kind="stable")

    t_order = p50(order)
    print(f"closest_to_songs ordering:            p50 {t_order*1e3:.1f} ms")

    # song_to_song: the reference calls this its worst hot loop, O(n^2)
    # (src/playlist.rs:229); here it's a device scan walk
    alive = np.ones(args.n, bool)
    alive[0] = False

    def chain():
        _device_greedy_chain(library, 0, euclidean_distance, alive)

    t_chain = p50(chain, queries=3)
    print(
        f"song_to_song full chain (N={args.n}): p50 {t_chain*1e3:.1f} ms"
    )

    import json

    print(
        json.dumps(
            {
                "metric": "playlist_query_p50_ms",
                "value": round(t_order * 1e3, 2),
                "unit": "ms @ 100k songs",
            }
        )
    )


if __name__ == "__main__":
    main()
