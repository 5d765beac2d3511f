#!/bin/sh
# Local replay of the CI steps (reference ci_check.sh analog).
set -e
cd "$(dirname "$0")"


# The tunneled-TPU PJRT connection occasionally wedges a whole process
# (zero CPU, no progress) while a fresh process succeeds immediately —
# bound every TPU step AND retry it once on a fresh process.
try2() {
    timeout 900 "$@" || { echo "== retrying (wedged tunnel?): $*"; timeout 900 "$@"; }
}

echo "== build native decoder + fixture encoder"
make -C bliss_tpu/io/native
make -C bliss_tpu/io/native encoder

echo "== native decoder sanitizer smoke (ASAN+UBSAN)"
make -C bliss_tpu/io/native asan

echo "== native decoder race-detector smoke (TSAN, concurrent decodes)"
make -C bliss_tpu/io/native tsan

echo "== tests"
python -m pytest tests/ -x -q

echo "== examples smoke (the CLI surface, reference examples/)"
EX_TMP=$(mktemp -d)
trap 'rm -rf "$EX_TMP"' EXIT
try2 python examples/analyze.py tests/data/s16_mono_22_5kHz.flac
try2 python examples/distance.py tests/data/s16_mono_22_5kHz.flac \
    tests/data/piano.flac
mkdir -p "$EX_TMP/music"
cp tests/data/s16_mono_22_5kHz.flac tests/data/piano.flac \
    tests/data/s32_stereo_44_1_kHz.mp3 "$EX_TMP/music/"
try2 python examples/playlist.py "$EX_TMP/music" \
    -o "$EX_TMP/playlist.m3u" -a "$EX_TMP/analysis.json"
test -s "$EX_TMP/playlist.m3u"
try2 python examples/library.py init "$EX_TMP/music" -c "$EX_TMP/config.json" \
    -d "$EX_TMP/songs.db"
try2 python examples/library.py playlist -c "$EX_TMP/config.json" \
    "$EX_TMP/music/s16_mono_22_5kHz.flac" 2
try2 python examples/library_extra_info.py init "$EX_TMP/music" \
    -c "$EX_TMP/config_extra.json"
try2 python examples/library_extra_info.py playlist -c "$EX_TMP/config_extra.json" \
    "$EX_TMP/music/s16_mono_22_5kHz.flac" 2

echo "== multi-chip dry run"
try2 python __graft_entry__.py

echo "== bench smoke"
BLISS_BENCH_SONGS=2 BLISS_BENCH_PASSES=3 timeout 1800 python bench.py

echo "ci_check OK"
