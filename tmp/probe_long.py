import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from bliss_tpu.models import timbral, loudness, chroma, tempo

T = 7340032
rng = np.random.default_rng(0)
sig = jnp.asarray((rng.normal(size=T)*0.1).astype(np.float32))
n = T - 100

def stage(name, fn):
    f = jax.jit(fn)
    t0 = time.time(); jax.block_until_ready(f(sig, n)); t1 = time.time()
    t2 = time.time(); jax.block_until_ready(f(sig, n)); t3 = time.time()
    print(f"{name}: compile={t1-t0:.1f}s warm={t3-t2:.3f}s", flush=True)

stage("zcr", lambda s, m: timbral.zcr_feature(s, m))
stage("loudness", lambda s, m: loudness.loudness_features(s, m))
stage("timbral", lambda s, m: timbral.spectral_features(s, m))
stage("chroma", lambda s, m: chroma.chroma_features(s, m, 2))
stage("tempo", lambda s, m: tempo.tempo_feature(s, m))
print("ALL DONE", flush=True)
