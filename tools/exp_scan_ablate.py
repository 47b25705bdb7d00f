"""Ablate the scan-batched bench body: why does the shipped
_chunk_scan_step run ~2x slower per chunk than the same body timed with
closure-constant operands (tools/exp_fixed_pallas.py)?

Variants (same 40-chunk workload, outputs stacked, one scalar fetch):
  full    : scanned xs [G,2,n] + P dynamic-indexed from the stacked bank
            + scanned meta (the shipped _chunk_scan_step)
  constx  : same but xs replaced by ONE closure-constant chunk reused
            every step (isolates the scanned-input slice cost)
  constP  : scanned xs, but P a closure constant (isolates the bank
            dynamic-index cost)
  constxP : both constant (the exp_fixed_pallas geometry)
  noouts  : full, but outputs reduced per step (sum) instead of stacked
            (isolates the scan-ys stacking cost)
  static  : the _chunk_scan_step_static path (compile-time-constant
            plan, the M-multiple-chunk steady state) on the same xs —
            start/K as graph literals, one P operand

Usage: python tools/exp_scan_ablate.py [G] [reps]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from art_tpu.core import flags as F
from art_tpu.parallel.streams import DeviceStreamResampler, _chunk_body

IB = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS | F.INCLUDE_LOWPASS
G = int(sys.argv[1]) if len(sys.argv) > 1 else 40
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
chunk = 1 << 22

eng = DeviceStreamResampler(2, 380, 380, 44100, 48000, 0, IB)
eng.advance_position(190)
M, L, qn, hist_len = eng.M, eng.L, eng.qn, eng.num_samples

plans = []
for _ in range(G):
    K, start, j0, pos0, plan = eng._plan_compute(chunk)
    eng.output_offset = plan.new_output_offset
    eng.input_index = plan.new_input_index
    plans.append((K, start, j0))
nb = max(-(-k // L) for k, _, _ in plans)
produced = sum(k for k, _, _ in plans)
P_all = eng._stacked_matrices()
meta = jnp.asarray([[p[2] for p in plans], [p[1] for p in plans],
                    [p[0] for p in plans]], jnp.int32)

key = jax.random.PRNGKey(0)
x1 = jax.random.normal(key, (2, chunk), jnp.float32) * 0.25
xs = jnp.stack([x1] * 8)
xs_full = jnp.concatenate([xs] * (G // 8), axis=0)
P_const = eng._matrix(plans[0][2])
h0 = jnp.zeros((2, hist_len), jnp.float32)
a0 = jnp.zeros((), jnp.float32)


def make(use_xs: bool, use_Pall: bool, stack: bool):
    @jax.jit
    def run(hist, acc):
        def body(carry, per):
            hist, acc = carry
            if use_xs:
                x, j, start, K = per
            else:
                j, start, K = per
                x = x1
            P = jax.lax.dynamic_index_in_dim(P_all, j, 0, keepdims=False) \
                if use_Pall else P_const
            hist, out, acc = _chunk_body(hist, x, P, start, K, acc,
                                         M, L, nb, qn, hist_len)
            return (hist, acc), (out if stack else jnp.sum(out))
        per = (xs_full, meta[0], meta[1], meta[2]) if use_xs \
            else (meta[0], meta[1], meta[2])
        (hist, acc), s = jax.lax.scan(body, (hist, acc), per)
        return hist, acc, jnp.sum(s[-1]) if stack else s
    return run


from art_tpu.parallel.streams import _chunk_scan_step_static  # noqa: E402

K0, start0 = plans[1][0], plans[1][1]   # the settled steady-state plan


def run_static_jit(hist, acc):
    hist, outs, acc = _chunk_scan_step_static(hist, xs_full, P_const, acc,
                                              int(start0), int(K0), M, L,
                                              nb, qn, hist_len)
    return hist, acc, outs


runs = {
    "full":    make(True, True, True),
    "constx":  make(False, True, True),
    "constP":  make(True, False, True),
    "constxP": make(False, False, True),
    "noouts":  make(True, True, False),
    "static":  run_static_jit,
}

for name, r in runs.items():
    t0 = time.perf_counter()
    h, a, s = r(h0, a0)
    float(a)
    print(f"# {name} compile+run {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

res = {k: [] for k in runs}
for _ in range(reps):
    for name, r in runs.items():
        t0 = time.perf_counter()
        h, a, s = r(h0, a0)
        float(a)
        res[name].append(time.perf_counter() - t0)
for name in runs:
    m = sorted(res[name])[len(res[name]) // 2]
    print(f"{name:8s}: {m*1e3:7.1f} ms  {m/G*1e3:5.2f} ms/chunk  "
          f"({produced/m/1e6:7.1f} M out/s)")
