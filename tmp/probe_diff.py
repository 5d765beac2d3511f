import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from bliss_tpu.models.analyzer import analyze_samples, _compiled_batch

T = 7340032
B = 8
rng = np.random.default_rng(0)
buf = (rng.normal(size=(B, T))*0.1).astype(np.float32)
lengths = np.full((B,), T-100, np.int32)
sig = jnp.asarray(buf); lens = jnp.asarray(lengths)

def run(name, f):
    _ = np.asarray(f(sig, lens))
    t0=time.time(); _ = np.asarray(f(sig, lens)); print(f"{name}: {time.time()-t0:.3f}s", flush=True)

run("jit(vmap(analyze_samples))", jax.jit(jax.vmap(lambda s, n: analyze_samples(s, n, 2))))
run("_compiled_batch", _compiled_batch(T, 2))
print("ALL DONE", flush=True)
