"""Same-process A/B: the shipped static-plan stats scan with SCANNED xs
([G, ch, n] sliced per step) vs the identical body with a CLOSURE-CONSTANT
chunk (exp_winbuild's geometry, which measured 2.40 ms/chunk).  Isolates
the cost of streaming real per-chunk input through the scan — if the two
match, the bench is at the measured floor and the residual vs SOL.md is
service-hour drift; if scanned xs is slower, the input slice path has
overhead worth chasing.

Also times a G-variant sweep to see dispatch amortization at this hour.

Usage: python tools/exp_static_xs.py [reps] [G]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from art_tpu.core import flags as F
from art_tpu.parallel.streams import (DeviceStreamResampler, _chunk_body,
                                      _chunk_scan_step_static)

IB = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS | F.INCLUDE_LOWPASS
reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
G = int(sys.argv[2]) if len(sys.argv) > 2 else 16
chunk = 147 * 28533

eng = DeviceStreamResampler(2, 380, 380, 44100, 48000, 0, IB)
eng.advance_position(190)
eng._plan(chunk)                       # absorb the non-periodic first chunk
K, start, j0, pos0, plan = eng._plan_compute(chunk)
nb = -(-K // eng.L)
M, L, qn, hist_len = eng.M, eng.L, eng.qn, eng.num_samples
P = eng._matrix(j0)
x1 = jax.random.normal(jax.random.PRNGKey(0), (2, chunk), jnp.float32) * 0.25
xs = jnp.stack([x1] * G)
h0 = jnp.zeros((2, hist_len), jnp.float32)
a0 = jnp.zeros((), jnp.float32)


def run_scanned(hist, acc):
    hist, outs, acc = _chunk_scan_step_static(
        hist, xs, P, acc, int(start), int(K), M, L, nb, qn, hist_len,
        False, True)
    return hist, acc


@jax.jit
def run_constx(hist, acc):
    def body(carry, _):
        hist, acc = carry
        hist, out, acc = _chunk_body(hist, x1, P, jnp.int32(start),
                                     jnp.int32(K), acc, M, L, nb, qn,
                                     hist_len)
        return (hist, acc), None
    (hist, acc), _ = jax.lax.scan(body, (hist, acc), None, length=G)
    return hist, acc


runs = {"scanned": run_scanned, "constx": run_constx}
for name, r in runs.items():
    t0 = time.perf_counter()
    h, a = r(h0, a0)
    float(a)
    print(f"# {name} compile+run {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

res = {k: [] for k in runs}
for _ in range(reps):
    for name, r in runs.items():
        t0 = time.perf_counter()
        h, a = r(h0, a0)
        float(a)
        res[name].append(time.perf_counter() - t0)
for name in runs:
    m = sorted(res[name])[len(res[name]) // 2]
    print(f"{name:8s}: {m*1e3:7.1f} ms  {m/G*1e3:5.2f} ms/chunk  "
          f"({K*G/m/1e6:7.1f} M out/s)", flush=True)
