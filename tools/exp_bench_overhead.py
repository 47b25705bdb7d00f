"""Decompose the headline bench's wall time: in-graph compute vs
per-group dispatch/upload overhead.

Same-process interleaved A/B of three formulations of the identical
workload (NCH chunks of 2^22 frames, stereo preset-3 44.1k->48k, outputs
materialized, one scalar fetch at the end — the exact bench.py shape):

  a) shipped : eng.process_scan per G-chunk group (uploads a [3,G] meta
               per call, plans on host per call)
  b) premeta : same G-chunk scan dispatches, but every group's meta is
               planned AND uploaded to the device BEFORE the timed
               region (calls _chunk_scan_step directly)
  c) onescan : ONE lax.scan over all NCH chunks (a single dispatch per
               timed run; metas preuploaded) — retries the round-1 G=32
               compile stall at full bench size

Usage: python tools/exp_bench_overhead.py [nch] [reps]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from art_tpu.core import flags as F
from art_tpu.parallel.streams import DeviceStreamResampler, _chunk_scan_step

IB = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS | F.INCLUDE_LOWPASS
NCH = int(sys.argv[1]) if len(sys.argv) > 1 else 40
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
G = 8
chunk = 1 << 22
assert NCH % G == 0

key = jax.random.PRNGKey(0)
xs = jax.random.normal(key, (G, 2, chunk), dtype=jnp.float32) * 0.25
xs_one = jnp.concatenate([xs] * (NCH // G), axis=0)   # same audio sequence


def fresh():
    eng = DeviceStreamResampler(2, 380, 380, 44100, 48000, 0, IB)
    eng.advance_position(190)
    eng.prewarm()
    return eng


# ---- plan all NCH chunks once (host math), preupload metas ---------------
planner = fresh()
plans = []
for _ in range(NCH):
    K, start, j0, pos0, plan = planner._plan_compute(chunk)
    planner.output_offset = plan.new_output_offset
    planner.input_index = plan.new_input_index
    plans.append((K, start, j0))
Ks = [p[0] for p in plans]
nb = max(-(-k // planner.L) for k in Ks)
metas = []
for g in range(NCH // G):
    sl = plans[g * G:(g + 1) * G]
    m = jnp.asarray([[p[2] for p in sl], [p[1] for p in sl],
                     [p[0] for p in sl]], jnp.int32)
    metas.append(m)
meta_one = jnp.asarray([[p[2] for p in plans], [p[1] for p in plans],
                        [p[0] for p in plans]], jnp.int32)
produced = sum(Ks)
print(f"# NCH={NCH} chunks, produced={produced} frames/run", file=sys.stderr)

eng = fresh()
P_all = eng._stacked_matrices()
M, L, qn, hist_len = eng.M, eng.L, eng.qn, eng.num_samples
h0 = jnp.zeros((2, hist_len), jnp.float32)


def run_shipped():
    e = fresh.eng
    e.output_offset, e.input_index = fresh.state0
    e.hist = h0
    acc = jnp.zeros((), jnp.float32)
    for _ in range(NCH // G):
        outs, Kv, acc = e.process_scan(xs, chunk, acc)
    return float(acc)


fresh.eng = fresh()
fresh.state0 = (fresh.eng.output_offset, fresh.eng.input_index)


def run_premeta():
    hist = h0
    acc = jnp.zeros((), jnp.float32)
    for m in metas:
        hist, outs, acc = _chunk_scan_step(hist, xs, P_all, m, acc,
                                           M, L, nb, qn, hist_len)
    return float(acc)


def run_onescan():
    hist = h0
    acc = jnp.zeros((), jnp.float32)
    hist, outs, acc = _chunk_scan_step(hist, xs_one, P_all, meta_one, acc,
                                       M, L, nb, qn, hist_len)
    return float(acc)


runs = {"shipped": run_shipped, "premeta": run_premeta}
accs = {k: r() for k, r in runs.items()}
print("warm accs:", accs, file=sys.stderr)
t0 = time.perf_counter()
accs["onescan"] = run_onescan()
print(f"onescan first call (compile) took {time.perf_counter()-t0:.1f}s",
      file=sys.stderr)
runs["onescan"] = run_onescan
base = accs["shipped"]
for k, a in accs.items():
    assert abs(a - base) / abs(base) < 1e-5, (k, a, base)

res = {k: [] for k in runs}
for _ in range(reps):
    for k, r in runs.items():
        t0 = time.perf_counter()
        r()
        res[k].append(time.perf_counter() - t0)
for k in runs:
    m = sorted(res[k])[len(res[k]) // 2]
    print(f"{k:8s}: {m*1e3:7.1f} ms  ({produced/m/1e6:7.1f} M out/s)  "
          f"times={['%.0f' % (t*1e3) for t in res[k]]}")
