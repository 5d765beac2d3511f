import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from bliss_tpu.models.analyzer import analyze_batch

for T, B in [(262144, 8), (7340032, 8), (7340032, 2)]:
    rng = np.random.default_rng(0)
    buf = (rng.normal(size=(B, T))*0.1).astype(np.float32)
    lengths = np.full((B,), T-100, np.int32)
    t0=time.time(); _ = analyze_batch(buf, lengths); t1=time.time()
    t2=time.time(); _ = analyze_batch(buf, lengths); t3=time.time()
    print(f"T={T} B={B}: compile={t1-t0:.1f}s warm={t3-t2:.3f}s = {B/(t3-t2):.2f} songs/s = {B*T/22050/(t3-t2):.0f}x realtime", flush=True)
print("ALL DONE", flush=True)
