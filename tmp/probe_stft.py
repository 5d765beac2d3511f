import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from bliss_tpu.ops.windows import frame_signal_reflect, hann_periodic
from bliss_tpu.ops.dft import rdft_mags, rdft

T = 7340032
B = 8
F = 3330
rng = np.random.default_rng(0)
sig = jnp.asarray((rng.normal(size=(B, T))*0.1).astype(np.float32))
lens = jnp.full((B,), T-100, jnp.int32)

def run(name, fn, *args):
    f = jax.jit(fn)
    _ = np.asarray(f(*args))
    t0=time.time(); _ = np.asarray(f(*args)); print(f"{name}: {time.time()-t0:.3f}s", flush=True)

def frames_of(s, n):
    return jax.vmap(lambda x, m: frame_signal_reflect(x, m, 8192, 2205, F))(s, n)

run("gather_only", lambda s, n: jnp.sum(frames_of(s, n)), sig, lens)

# dense input for DFT-only timing
dense = jnp.asarray((rng.normal(size=(B, F, 8192))*0.1).astype(np.float32))
run("dft_mags_dense", lambda x: jnp.sum(rdft_mags(x * hann_periodic(8192))), dense)
run("dft_re_dense_default_prec", lambda x: jnp.sum(
    jax.lax.dot_general(x, jnp.cos(jnp.arange(8192.)[:,None]*jnp.arange(4097.)[None,:]*0.001),
                        dimension_numbers=(((2,),(0,)),((),())),
                        precision=jax.lax.Precision.DEFAULT)), dense)
run("gather+dft", lambda s, n: jnp.sum(rdft_mags(frames_of(s, n) * hann_periodic(8192))), sig, lens)
print("ALL DONE", flush=True)
