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


def _build_library(n: int, cache_dir: pathlib.Path):
    """A (cached) SQLite Library of `n` synthetic analyzed songs —
    the real persistence layer, not a bare matrix."""
    import sqlite3

    from bliss_tpu.library import BaseConfig, Library

    cache_dir.mkdir(parents=True, exist_ok=True)
    db = cache_dir / f"bench_library_{n}.db"
    cfg = cache_dir / f"bench_library_{n}.json"
    fresh = not db.exists()
    config = BaseConfig(config_path=cfg, database_path=db)
    lib = Library(config, None)
    if fresh:
        rng = np.random.default_rng(0)
        feats = rng.uniform(-1.0, 1.0, size=(n, 23)).astype(np.float32)
        conn = lib.sqlite_conn
        conn.execute("begin")
        conn.executemany(
            "insert into song (path, artist, title, album, duration, "
            "analyzed, version, extra_info) values (?,?,?,?,?,?,?,?)",
            (
                (
                    f"/library/{i // 1000:03d}/song_{i:06d}.flac",
                    f"artist {i % 997}",
                    f"title {i}",
                    f"album {i // 12}",
                    210.0,
                    True,
                    2,
                    "null",
                )
                for i in range(n)
            ),
        )
        ids = [
            r[0]
            for r in conn.execute("select id from song order by id").fetchall()
        ]
        assert len(ids) == n
        conn.executemany(
            "insert into feature (song_id, feature, feature_index) "
            "values (?,?,?)",
            (
                (ids[i], float(feats[i, j]), j)
                for i in range(n)
                for j in range(23)
            ),
        )
        conn.commit()
    return lib


def bench_library(args):
    """End-to-end p50 through the REAL query path: SQLite load + cached
    device matrix + sorter + dedup, via Library.playlist_from
    (the second north-star metric measured honestly — VERDICT r2 item 2)."""
    import json
    import tempfile

    from bliss_tpu.library import Library
    from bliss_tpu.playlist import euclidean_distance, song_to_song

    cache_dir = pathlib.Path(tempfile.gettempdir()) / "bliss_bench_lib"
    t0 = time.perf_counter()
    lib = _build_library(args.n, cache_dir)
    t_build = time.perf_counter() - t0

    seeds = [
        f"/library/{(i * 7919 % args.n) // 1000:03d}/"
        f"song_{i * 7919 % args.n:06d}.flac"
        for i in range(1, args.queries + 2)
    ]

    # cold: first query pays the SQLite zipper + matrix build + upload
    t0 = time.perf_counter()
    out = lib.playlist_from([seeds[0]])
    t_cold = time.perf_counter() - t0
    assert len(out) > args.n // 2

    times = []
    for s in seeds[1 : args.queries + 1]:
        t0 = time.perf_counter()
        out = lib.playlist_from([s])
        times.append(time.perf_counter() - t0)
    t_warm = statistics.median(times)

    # the greedy chain is a 100k-step sequential scan: ~7.6 s on the TPU
    # (unroll=32) but >100 s on one CPU — skip it there unless forced
    import jax

    t_chain = None
    if jax.default_backend() != "cpu" or args.chain:
        chain_times = []
        for s in seeds[1:3]:
            t0 = time.perf_counter()
            lib.playlist_from_custom(
                [s], euclidean_distance, song_to_song, False
            )
            chain_times.append(time.perf_counter() - t0)
        t_chain = statistics.median(chain_times)

    print(f"library build/open (N={args.n}):      {t_build:.2f} s")
    print(f"playlist_from cold (SQLite+upload):   {t_cold*1e3:.0f} ms")
    print(f"playlist_from warm p50:               {t_warm*1e3:.0f} ms")
    if t_chain is not None:
        print(f"song_to_song end-to-end p50:          {t_chain*1e3:.0f} ms")
    out = {
        "metric": "library_playlist_p50_ms",
        "value": round(t_warm * 1e3, 1),
        "unit": f"ms @ {args.n}-song library (end-to-end)",
        "cold_ms": round(t_cold * 1e3, 1),
    }
    if t_chain is not None:
        out["song_to_song_p50_ms"] = round(t_chain * 1e3, 1)
    print(json.dumps(out))


def _bench_topk(args, library, p50=None):
    """sharded_top_k p50 over the full visible mesh, matrix pre-placed
    (measures the query kernel, not the host->device upload)."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bliss_tpu.parallel.mesh import make_mesh, sharded_top_k

    if p50 is None:
        def p50(fn, queries=None):
            times = []
            fn()
            for _ in range(queries or args.queries):
                t0 = time.perf_counter()
                fn()
                times.append(time.perf_counter() - t0)
            return statistics.median(times)

    seed = [library[0]]
    mesh = make_mesh()
    n_pad = -(-args.n // mesh.size) * mesh.size
    lib_pad = np.concatenate(
        [library, np.zeros((n_pad - args.n, 23), np.float32)]
    )
    lib_dev = jax.device_put(
        lib_pad, NamedSharding(mesh, P(mesh.axis_names[0], None))
    )
    t_topk = p50(
        lambda: sharded_top_k(mesh, lib_dev, seed, k=32, n_real=args.n)
    )
    print(
        f"sharded_top_k (N={args.n}, {mesh.size} dev): "
        f"p50 {t_topk*1e3:.1f} ms"
    )


def main():
    # honor JAX_PLATFORMS from the caller: the sandbox's sitecustomize
    # pre-imports jax and pins the platform via jax.config, so the env
    # var alone is silently IGNORED (the CLAUDE.md gotcha) — a
    # `JAX_PLATFORMS=cpu` bench run would otherwise land on the real
    # accelerator and contend with whatever owns it.
    import os as _os

    want = _os.environ.get("JAX_PLATFORMS")
    if want:
        import jax as _jax0

        _jax0.config.update("jax_platforms", want)

    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=100_000)
    parser.add_argument("--queries", type=int, default=9)
    parser.add_argument(
        "--library",
        action="store_true",
        help="end-to-end p50 through a real SQLite Library",
    )
    parser.add_argument(
        "--chain",
        action="store_true",
        help="force the song_to_song chain bench even on CPU",
    )
    parser.add_argument(
        "--topk-only",
        action="store_true",
        help="only the sharded_top_k kernel (skips the upload-bound "
        "distance/order benches — the honest device metric on the "
        "tunneled sandbox)",
    )
    args = parser.parse_args()

    if args.library:
        bench_library(args)
        return

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

    if args.topk_only:
        _bench_topk(args, library)
        return

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

    # the chain is an N-step sequential scan; on a CPU backend at
    # north-star sizes it takes hours — gate it behind --chain there
    import jax as _jax

    if _jax.default_backend() != "cpu" or args.n <= 200_000 or args.chain:
        t_chain = p50(chain, queries=3)
        print(
            f"song_to_song full chain (N={args.n}): p50 {t_chain*1e3:.1f} ms"
        )

    # sharded top-k over the full device mesh (the 100k–1M north-star's
    # multi-chip query kernel, SURVEY §2.3 row 6)
    _bench_topk(args, library, p50)

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
