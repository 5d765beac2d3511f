import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from bliss_tpu.models import timbral, loudness, chroma, tempo

T = 7340032
B = 8
rng = np.random.default_rng(0)
sig = jnp.asarray((rng.normal(size=(B, T))*0.1).astype(np.float32))
lens = jnp.full((B,), T-100, jnp.int32)

def combo(name, parts):
    def one(s, n):
        outs = []
        if "t" in parts: outs.append(timbral.spectral_features(s, n))
        if "z" in parts: outs.append(timbral.zcr_feature(s, n)[None])
        if "l" in parts: outs.append(loudness.loudness_features(s, n))
        if "c" in parts: outs.append(chroma.chroma_features(s, n, 2))
        if "p" in parts: outs.append(tempo.tempo_feature(s, n)[None])
        return jnp.concatenate(outs)
    f = jax.jit(jax.vmap(one))
    _ = np.asarray(f(sig, lens))
    t0 = time.time(); _ = np.asarray(f(sig, lens)); dt = time.time()-t0
    print(f"{name}: warm={dt:.3f}s", flush=True)

combo("tempo-only", "p")
combo("t+p+c", "tpc")
combo("t+p+c+l", "tpcl")
combo("all", "tzlcp")
print("ALL DONE", flush=True)
