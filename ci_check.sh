#!/bin/sh
# Local replay of the CI steps (reference ci_check.sh analog).
set -e
cd "$(dirname "$0")"

echo "== build native decoder"
make -C bliss_tpu/io/native

echo "== tests"
python -m pytest tests/ -x -q

echo "== multi-chip dry run"
python __graft_entry__.py

echo "== bench smoke"
BLISS_BENCH_SONGS=2 python bench.py

echo "ci_check OK"
