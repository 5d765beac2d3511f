import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from bliss_tpu.models import chroma as C
from bliss_tpu.ops import stft, n_frames_stft

T = 7340032
B = 8
rng = np.random.default_rng(0)
sig = jnp.asarray((rng.normal(size=(B, T))*0.1).astype(np.float32))
lens = jnp.full((B,), T-100, jnp.int32)
F = int(n_frames_stft(T, 2205))

def run(name, fn, *args):
    f = jax.jit(fn)
    _ = np.asarray(jax.tree.leaves(f(*args))[0])  # compile
    t0 = time.time(); _ = np.asarray(jax.tree.leaves(f(*args))[0]); dt = time.time()-t0
    print(f"{name}: warm={dt:.3f}s", flush=True)

def do_stft(s, n):
    return jax.vmap(lambda x, m: stft(x, 8192, 2205, length=m, n_frames=F, dtype=jnp.float32))(s, n)

run("stft", do_stft, sig, lens)

spec = jax.jit(do_stft)(sig, lens)
mask = jnp.ones((B, F), bool)

run("tuning", jax.vmap(lambda s, m: C.estimate_tuning(s, m, 8192)), spec, mask)
tun = jnp.zeros((B,), jnp.float32)
run("chroma_stft", jax.vmap(lambda s, t: C.chroma_stft_from_spectrum(s, t, 8192)), spec, tun)
ch = jax.jit(jax.vmap(lambda s, t: C.chroma_stft_from_spectrum(s, t, 8192)))(spec, tun)
run("interval", jax.vmap(lambda c, m: C.chroma_interval_features(c, m)), ch, mask)
print("ALL DONE", flush=True)
