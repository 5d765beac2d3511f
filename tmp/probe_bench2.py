import sys; sys.path.insert(0, "/root/repo")
import time, pathlib, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/bliss_jax_cache")
from bliss_tpu.io.decoder import FFmpegDecoder
from bliss_tpu.io import batch as B

DATA = pathlib.Path("/root/repo/tests/data")
fixtures = [DATA/"s16_mono_22_5kHz.flac", DATA/"s32_stereo_44_1_kHz.flac",
            DATA/"piano.flac", DATA/"s32_stereo_44_1_kHz.mp3",
            DATA/"5_mins_of_noise_stereo_48kHz.ogg"]
paths = [fixtures[i % 5] for i in range(32)]

# instrument dispatch + fetch
orig_async = B._analyze_bucket_async
def timed_async(entries, padded_len, bsz, version):
    t0 = time.time()
    out = orig_async(entries, padded_len, bsz, version)
    print(f"dispatch T={padded_len} n={len(entries)}: {time.time()-t0:.2f}s", flush=True)
    return out
B._analyze_bucket_async = timed_async

orig_asarray = np.asarray
# warm up
t0=time.time()
list(B.analyze_paths_batched(FFmpegDecoder, sorted(set(paths))))
print(f"warmup: {time.time()-t0:.1f}s", flush=True)

t0=time.time()
res = list(B.analyze_paths_batched(FFmpegDecoder, paths))
print(f"main: {time.time()-t0:.2f}s for {len(res)} songs", flush=True)
print("ALL DONE", flush=True)
