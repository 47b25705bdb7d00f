"""Isolate the refine chain regression: per-dispatch _comb4_step_full.

In-graph (one jit, scan, outputs consumed) the refined solve wins 2.2x
(tools/exp_iir_refine.py with full consumption), yet the shipped chain
measured it 4.4x SLOWER (exp_c4_ship.py interleaved).  The difference
is the dispatch shape: the chain calls the standalone _comb4_step_full
jit per chunk with a materialized [6, n] f64 in/out.  Time exactly that
call, exact vs refine, same-process interleaved: N calls chained on
device state + one scalar fetch.

Usage: exp_refine_dispatch.py [reps] [N]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from art_tpu.engines.biquad import Biquad, biquad_lowpass
from art_tpu.ops.biquad_kernel import (_comb4_step_full, combine_biquads,
                                       iir_tables)

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
N = int(sys.argv[2]) if len(sys.argv) > 2 else 8

coeffs = biquad_lowpass(0.45 * 44100 / 48000)
b1 = Biquad.init(coeffs, 1.0, 6, np.float64)
b2 = Biquad.init(coeffs, 1.0, 6, np.float64)
ac, bc = combine_biquads(b1, b2)
aj, bj = jnp.asarray(ac), jnp.asarray(bc)
t64 = iir_tables(bc)
t32 = iir_tables(bc, dtype=np.float32)

n, S = 160 * 3277, 6
x = jax.random.normal(jax.random.PRNGKey(4), (S, n), jnp.float64) * 0.25
z4 = jnp.zeros((4, S), jnp.float64)

variants = {"exact": None, "refine": t32}


def run(t32v):
    xh, yh = z4, z4
    for _ in range(N):
        y, xh, yh = _comb4_step_full(x.T, aj, bj, xh, yh, t64, sp=6,
                                     t32=t32v)
    return float(jnp.sum(yh))


for name, t32v in variants.items():
    t0 = time.perf_counter()
    run(t32v)
    print(f"# {name} compile+run {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

times = {name: [] for name in variants}
for _ in range(reps):
    for name, t32v in variants.items():
        t0 = time.perf_counter()
        run(t32v)
        times[name].append(time.perf_counter() - t0)
for name, ts in times.items():
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:7s}: {med/N*1e3:8.2f} ms/call", flush=True)
