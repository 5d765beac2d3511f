import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp

# 1. device_put bandwidth over the tunnel
x = np.random.default_rng(0).normal(size=(64<<20,)).astype(np.float32)  # 256MB
t0 = time.time(); d = jax.device_put(x); d.block_until_ready()
dt = time.time()-t0
print(f"device_put 256MB: {dt:.2f}s = {256/dt:.0f} MB/s", flush=True)
t0 = time.time(); _ = np.asarray(d[:1<<20]); print(f"fetch 4MB: {time.time()-t0:.2f}s", flush=True)

# 2. decode timings on host
from bliss_tpu.io.decoder import FFmpegDecoder
import os
print("cpus:", os.cpu_count(), flush=True)
for f in ["s16_mono_22_5kHz.flac", "5_mins_of_noise_stereo_48kHz.ogg"]:
    t0 = time.time()
    s = FFmpegDecoder.decode(f"/root/repo/tests/data/{f}")
    print(f"decode {f}: {time.time()-t0:.2f}s n={s.sample_array.shape[0]}", flush=True)

# 3. device compute per bucket (warm)
from bliss_tpu.models.analyzer import analyze_batch, bucket_length
for T, B in [(262144, 8), (7340032, 8)]:
    rng = np.random.default_rng(0)
    buf = (rng.normal(size=(B, T))*0.1).astype(np.float32)
    lengths = np.full((B,), T-100, np.int32)
    t0 = time.time(); out = analyze_batch(buf, lengths); t1 = time.time()
    t2 = time.time(); out = analyze_batch(buf, lengths); t3 = time.time()
    print(f"analyze_batch T={T} B={B}: compile+run={t1-t0:.1f}s warm={t3-t2:.2f}s ({B/(t3-t2):.2f} songs/s)", flush=True)
print("ALL DONE", flush=True)
