import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/tmp/jaxcache")
from bliss_tpu.io.decoder import FFmpegDecoder
from bliss_tpu.ops import stft, n_frames_stft
from bliss_tpu.models import chroma as C

song = FFmpegDecoder.decode("/root/repo/tests/data/s16_mono_22_5kHz.flac")
sig = np.zeros(262144, np.float32); n = song.sample_array.shape[0]
sig[:n] = song.sample_array
F = int(n_frames_stft(262144, 2205))

@jax.jit
def tun(s, m):
    spec = stft(s, 8192, 2205, length=m, n_frames=F, dtype=jnp.float32)
    mask = jnp.arange(F) < n_frames_stft(m, 2205)
    t = C.estimate_tuning(spec, mask, 8192)
    ch = C.chroma_stft_from_spectrum(spec, t, 8192)
    raw = C.chroma_interval_features(ch, mask)
    return t, raw

t, raw = tun(jnp.asarray(sig), n)
print("TPU tuning:", float(t), "(reference: -0.05)", flush=True)
print("TPU raw interval feats:", np.asarray(raw), flush=True)
REF_RAW = np.array([0.03860284, 0.02185281, 0.04224379, 0.06385278, 0.07311148,
                    0.02512566, 0.00319899, 0.00311308, 0.00107433, 0.00241861])
# reference raw values are for the chroma.npy fixture of this exact song
print("raw err:", np.abs(np.asarray(raw) - REF_RAW), flush=True)
print("ALL DONE", flush=True)
