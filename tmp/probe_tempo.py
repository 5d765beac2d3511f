import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from bliss_tpu.models import tempo as T
consts = T._bt_constants(22050)
state0 = T.initial_beat_state(consts)
df = jnp.asarray(np.random.default_rng(0).normal(size=512).astype(np.float32))

def stage(name, fn, *args):
    t0 = time.time()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    print(f"{name}: {time.time()-t0:.1f}s", flush=True)

stage("autocorr", T._autocorr, df)
stage("comb", lambda a: T._comb_filterbank(a, 128, jnp.int32(4), True), df)
stage("checkstate", lambda s, a: T._checkstate(s, a, jnp.float32(43.0), consts), state0, df)
stage("bt_do_once", lambda s: T._bt_do(s, consts), state0._replace(dfframe=df))

def scan2(s):
    def step(st, _):
        st2, bv, bf = T._bt_do(st, consts)
        return st2, (bv, bf)
    return jax.lax.scan(step, s, None, length=2)
stage("bt_do_scan2", scan2, state0._replace(dfframe=df))

rng = np.random.default_rng(0)
sig = jnp.asarray((rng.normal(size=262144)*0.1).astype(np.float32))
stage("tempo_full_262k", lambda s: T.tempo_feature(s, 262044), sig)
print("ALL DONE", flush=True)
