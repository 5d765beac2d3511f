import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from bliss_tpu.ops.windows import frame_signal_reflect, hann_periodic
from bliss_tpu.ops.dft import rdft_mags
from bliss_tpu.models import chroma as C

T = 7340032
B = 8
F = 3330
rng = np.random.default_rng(0)
sig = jnp.asarray((rng.normal(size=(B, T))*0.1).astype(np.float32))
lens = jnp.full((B,), T-100, jnp.int32)

def run(name, fn, *args):
    f = jax.jit(fn)
    t0=time.time(); _ = np.asarray(f(*args)); t1=time.time()
    t2=time.time(); _ = np.asarray(f(*args)); print(f"{name}: compile={t1-t0:.1f}s warm={time.time()-t2:.3f}s", flush=True)

def frames_of(s, n):
    return jax.vmap(lambda x, m: frame_signal_reflect(x, m, 8192, 2205, F))(s, n)

run("slab_gather_only", lambda s, n: jnp.sum(frames_of(s, n)), sig, lens)
run("slab_gather+dft", lambda s, n: jnp.sum(rdft_mags(frames_of(s, n) * hann_periodic(8192))), sig, lens)
run("chroma_full", jax.vmap(lambda s, n: C.chroma_features(s, n, 2)), sig, lens)
print("ALL DONE", flush=True)
