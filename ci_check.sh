#!/bin/sh
# Local replay of the CI steps (reference ci_check.sh analog).
set -e
cd "$(dirname "$0")"

echo "== build native decoder"
make -C bliss_tpu/io/native

echo "== native decoder sanitizer smoke (ASAN+UBSAN)"
make -C bliss_tpu/io/native asan

echo "== tests"
python -m pytest tests/ -x -q

echo "== examples smoke (the CLI surface, reference examples/)"
EX_TMP=$(mktemp -d)
trap 'rm -rf "$EX_TMP"' EXIT
timeout 900 python examples/analyze.py tests/data/s16_mono_22_5kHz.flac
timeout 900 python examples/distance.py tests/data/s16_mono_22_5kHz.flac \
    tests/data/piano.flac
mkdir -p "$EX_TMP/music"
cp tests/data/s16_mono_22_5kHz.flac tests/data/piano.flac \
    tests/data/s32_stereo_44_1_kHz.mp3 "$EX_TMP/music/"
timeout 900 python examples/playlist.py "$EX_TMP/music" \
    -o "$EX_TMP/playlist.m3u" -a "$EX_TMP/analysis.json"
test -s "$EX_TMP/playlist.m3u"
timeout 900 python examples/library.py init "$EX_TMP/music" -c "$EX_TMP/config.json" \
    -d "$EX_TMP/songs.db"
timeout 900 python examples/library.py playlist -c "$EX_TMP/config.json" \
    "$EX_TMP/music/s16_mono_22_5kHz.flac" 2
timeout 900 python examples/library_extra_info.py init "$EX_TMP/music" \
    -c "$EX_TMP/config_extra.json"
timeout 900 python examples/library_extra_info.py playlist -c "$EX_TMP/config_extra.json" \
    "$EX_TMP/music/s16_mono_22_5kHz.flac" 2

echo "== multi-chip dry run"
timeout 900 python __graft_entry__.py

echo "== bench smoke"
BLISS_BENCH_SONGS=2 BLISS_BENCH_PASSES=3 timeout 1200 python bench.py

echo "ci_check OK"
