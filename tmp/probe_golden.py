import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from bliss_tpu.io.decoder import FFmpegDecoder
from bliss_tpu.models.analyzer import build_analyzer

song = FFmpegDecoder.decode("/root/repo/tests/data/s16_mono_22_5kHz.flac")
print("decoded", flush=True)
t0 = time.time()
feats = build_analyzer(2)(song.sample_array)
print(f"analyze: {time.time()-t0:.1f}s", flush=True)
GOLDEN = np.array([
    0.3846389, -0.849141, -0.75481045, -0.8790748, -0.63258266,
    -0.7258959, -0.7757379, -0.8146726, 0.2716726, 0.25779057,
    -0.34292513, -0.62803423, -0.28095096, 0.08686459, 0.24446082,
    -0.5723257, 0.23292065, 0.19981146, -0.58594406, -0.06784296,
    -0.06000763, -0.58485717, -0.07880378])
err = np.abs(feats-GOLDEN)
print("max err", err.max(), "worst idx", int(err.argmax()), flush=True)
print("per-feature:", np.array2string(err, precision=7), flush=True)
print("ALL DONE", flush=True)
