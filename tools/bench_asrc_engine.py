"""End-to-end BatchedASRC engine throughput (kernel = xla | pallas | dense).

Usage: bench_asrc_engine.py [kernel] [chunk_frames] [dense_kb]
256-stream preset-3 drifting-ratio config (BASELINE config 5).
"""
import sys, time
import numpy as np, jax, jax.numpy as jnp
from art_tpu.parallel.asrc import BatchedASRC

kernel = sys.argv[1] if len(sys.argv) > 1 else "dense"
n = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
kb = int(sys.argv[3]) if len(sys.argv) > 3 else 128
S = 256
eng = BatchedASRC(S, 380, 380, kernel=kernel, dense_kb=kb)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((S, n)).astype(np.float32))
ratios = 1.0 + 0.01 * np.sin(np.arange(S) * 0.1)
out, Ks = eng.process(x, ratios)
_ = float(jnp.sum(out))
t0 = time.perf_counter()
reps, tot = 10, 0
for _ in range(reps):
    out, Ks = eng.process(x, ratios)
    tot += int(Ks.sum())
_ = float(jnp.sum(out))
dt = (time.perf_counter() - t0) / reps
print(f"{kernel} n={n}: {tot/reps/dt/1e6:.1f} M out/s  ({dt*1e3:.1f} ms/call)")
