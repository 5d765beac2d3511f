import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from bliss_tpu.models import chroma as C
from bliss_tpu.ops import stft, n_frames_stft
from bliss_tpu.ops.reductions import masked_quantile_midpoint

T = 7340032
B = 8
F = int(n_frames_stft(T, 2205))
rng = np.random.default_rng(0)
sig = jnp.asarray((rng.normal(size=(B, T))*0.1).astype(np.float32))
lens = jnp.full((B,), T-100, jnp.int32)

def run(name, fn):
    f = jax.jit(jax.vmap(fn))
    _ = np.asarray(f(sig, lens))
    t0=time.time(); _ = np.asarray(f(sig, lens)); print(f"{name}: {time.time()-t0:.3f}s", flush=True)

def spec_of(s, n):
    return stft(s, 8192, 2205, length=n, n_frames=F, dtype=jnp.float32)

run("stft_sum", lambda s, n: jnp.sum(spec_of(s, n)))
def tun(s, n):
    spec = spec_of(s, n)
    mask = jnp.arange(F) < n_frames_stft(n, 2205)
    return C.estimate_tuning(spec, mask, 8192)
run("stft+tuning", tun)
def pip_only(s, n):
    spec = spec_of(s, n)
    mask = jnp.arange(F) < n_frames_stft(n, 2205)
    p, m, pk = C.pip_track(spec, mask, 8192)
    return jnp.sum(m * pk) + jnp.sum(p)
run("stft+pip", pip_only)
def pip_median(s, n):
    spec = spec_of(s, n)
    mask = jnp.arange(F) < n_frames_stft(n, 2205)
    p, m, pk = C.pip_track(spec, mask, 8192)
    pos = pk & (p > 0)
    return masked_quantile_midpoint(m.ravel(), pos.ravel(), 0.5)
run("stft+pip+median", pip_median)
def cstft(s, n):
    spec = spec_of(s, n)
    return jnp.sum(C.chroma_stft_from_spectrum(spec, jnp.float32(0.0), 8192))
run("stft+chroma_stft", cstft)
print("ALL DONE", flush=True)
