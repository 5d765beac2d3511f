import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np
from bliss_tpu.io.decoder import FFmpegDecoder
from bliss_tpu.models.analyzer import build_analyzer, analyze_batch

song = FFmpegDecoder.decode("/root/repo/tests/data/s16_mono_22_5kHz.flac")
feats = build_analyzer(2)(song.sample_array)
GOLDEN = np.array([
    0.3846389, -0.849141, -0.75481045, -0.8790748, -0.63258266,
    -0.7258959, -0.7757379, -0.8146726, 0.2716726, 0.25779057,
    -0.34292513, -0.62803423, -0.28095096, 0.08686459, 0.24446082,
    -0.5723257, 0.23292065, 0.19981146, -0.58594406, -0.06784296,
    -0.06000763, -0.58485717, -0.07880378])
err = np.abs(feats-GOLDEN)
print("TPU vs golden: max", err.max(), "worst idx", int(err.argmax()), flush=True)
print("per-feature:", np.array2string(err, precision=6), flush=True)

for T, B in [(7340032, 8)]:
    rng = np.random.default_rng(0)
    buf = (rng.normal(size=(B, T))*0.1).astype(np.float32)
    lengths = np.full((B,), T-100, np.int32)
    t0=time.time(); _ = analyze_batch(buf, lengths); t1=time.time()
    t2=time.time(); _ = analyze_batch(buf, lengths); t3=time.time()
    print(f"T={T} B={B}: compile={t1-t0:.1f}s warm={t3-t2:.3f}s = {B/(t3-t2):.2f} songs/s = {B*T/22050/(t3-t2):.0f}x realtime", flush=True)
print("ALL DONE", flush=True)
