"""On-chip B/Q sweep for the blocked-carry block-IIR (_iir_y): the wide
[B,B]@[B, nb*Sp] emulated-f64 Toeplitz matmul costs B*n*Sp*2 flops
(LINEAR in B) and measured ~30x below the f32 ceiling at B=256
(tools/exp_config4_stages.py toep_mm = 14.1 of 16.2 ms), while the carry
block solve cost grows as B shrinks -- sweep for the knee.

Usage: python tools/exp_iir_bq_sweep.py [reps] [NS]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from art_tpu.engines.biquad import Biquad, biquad_lowpass
from art_tpu.ops.biquad_kernel import _iir_y, iir_tables

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
NS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
chunk, S = 1 << 19, 6

coeffs = biquad_lowpass(0.45 * 44100 / 48000)
bq = Biquad.init(coeffs, 1.0, channels=S, dtype=np.float64)
b5 = jnp.asarray(np.asarray(bq.b, np.float64))
x = jax.random.normal(jax.random.PRNGKey(1), (chunk, S),
                      jnp.float64) * 0.25
yh0 = jnp.zeros((4, S), jnp.float64)

ref = None
runs = {}
for B in (32, 64, 128, 256):
    for Q in (32, 64, 128):
        t = iir_tables(np.asarray(bq.b, np.float64), B, Q)

        def make(t=t):
            @jax.jit
            def run(acc):
                def step(carry, _):
                    acc = carry
                    y = _iir_y(x + acc * 1e-30, b5, yh0, t)
                    return acc + jnp.sum(y[::4096]), None
                acc, _ = jax.lax.scan(step, acc, None, length=NS)
                return acc
            return run
        runs[(B, Q)] = make()

a0 = jnp.zeros((), jnp.float64)
for key, r in runs.items():
    t0 = time.perf_counter()
    a = float(r(a0))
    if ref is None:
        ref = a
    print(f"# {key} compile+run {time.perf_counter()-t0:.1f}s "
          f"relerr={abs(a-ref)/abs(ref):.2e}", file=sys.stderr, flush=True)

res = {k: [] for k in runs}
for _ in range(reps):
    for key, r in runs.items():
        t0 = time.perf_counter()
        float(r(a0))
        res[key].append(time.perf_counter() - t0)
for key in runs:
    m = sorted(res[key])[len(res[key]) // 2]
    print(f"B={key[0]:4d} Q={key[1]:4d}: {m/NS*1e3:7.2f} ms/chunk",
          flush=True)
