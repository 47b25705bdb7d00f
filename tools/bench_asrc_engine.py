"""End-to-end BatchedASRC engine throughput.

Usage: bench_asrc_engine.py [kernel] [chunk_frames] [dense_kb] [--f64]
kernel = auto | hankel | dense | pallas | xla
256-stream preset-3 drifting-ratio config (BASELINE config 5).
"""
import sys, time
import numpy as np, jax, jax.numpy as jnp
from art_tpu.parallel.asrc import BatchedASRC

args = [a for a in sys.argv[1:] if not a.startswith("--")]
kernel = args[0] if len(args) > 0 else "auto"
n = int(args[1]) if len(args) > 1 else 8192
kb = int(args[2]) if len(args) > 2 else 128
dt = np.float64 if "--f64" in sys.argv else np.float32
S = 256
eng = BatchedASRC(S, 380, 380, kernel=kernel, dense_kb=kb, dtype=dt)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((S, n)).astype(dt))
ratios = 1.0 + 0.01 * np.sin(np.arange(S) * 0.1)
out, Ks = eng.process(x, ratios)
_ = float(jnp.sum(out))
t0 = time.perf_counter()
reps, tot = 10, 0
for _ in range(reps):
    out, Ks = eng.process(x, ratios)
    tot += int(Ks.sum())
_ = float(jnp.sum(out))
dt_s = (time.perf_counter() - t0) / reps
print(f"{kernel} n={n} {np.dtype(dt).name}: {tot/reps/dt_s/1e6:.1f} M out/s"
      f"  ({dt_s*1e3:.1f} ms/call)")
