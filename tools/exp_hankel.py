"""Hankel vs dense ASRC step: correctness + same-process interleaved A/B.

Usage: exp_hankel.py [n] [kb_hankel] [smax] [driftpct] [--cpu]
Engine-shape inputs (S=256 preset-3 drifting ratios +-driftpct%,
default 1 — pass ~10 with smax=32 for the wide-drift tier A/B).
"""
import sys
import time

import numpy as np

cpu = "--cpu" in sys.argv
args = [a for a in sys.argv[1:] if not a.startswith("--")]
n = int(args[0]) if len(args) > 0 else 8192
kb_h = int(args[1]) if len(args) > 1 else 128
smax = int(args[2]) if len(args) > 2 else 4
driftpct = float(args[3]) if len(args) > 3 else 1.0

import jax

if cpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from art_tpu.core.filters import make_filter_bank
from art_tpu.ops.pallas_kernels import (asrc_step_dense, asrc_step_hankel,
                                        dense_bank_tables, hankel_segl,
                                        pack_step_scalars, split_f64_pairs)

S, taps, F = 256, 380, 380
hist_len = taps * 16
half = taps // 2
rng = np.random.default_rng(0)

bank = make_filter_bank(taps, F, 1.0, True, np.float32)
bt, bt2 = dense_bank_tables(bank)
btj, bt2j = jnp.asarray(bt), jnp.asarray(bt2)
tp = bt.shape[0]

hist = jnp.asarray(rng.standard_normal((S, hist_len)).astype(np.float32))
x = jnp.asarray(rng.standard_normal((S, n)).astype(np.float32))
ratios = 1.0 + driftpct / 100.0 * np.sin(np.arange(S) * 0.1 + 0.3)
offsets = np.full(S, float(half), np.float64) + rng.random(S)
input_index = taps
shift = np.int32(hist_len - input_index)

k_max = int(np.ceil((n + 2) * ratios.max())) + 2
bound = float(input_index + n - half)
ks = np.arange(k_max, dtype=np.float64)
Ks = ((offsets[:, None] + ks[None, :] / ratios[:, None])
      < bound).sum(axis=1).astype(np.int32)

oh, ol = split_f64_pairs(offsets)
yh, yl = split_f64_pairs(1.0 / ratios)
scal, ints = pack_step_scalars(oh, ol, yh, yl, Ks, int(shift))
common = (hist, x, btj, bt2j, jnp.asarray(scal), jnp.asarray(ints))

interp = cpu
kb_d = 512
segl_d = tp + 1024
kp_d = -(-k_max // kb_d) * kb_d
kmax_d = kp_d
segl_h = hankel_segl(tp, kb_h, smax)
kp_h = -(-k_max // kb_h) * kb_h
kmax_h = kp_h

need = int(np.ceil(np.abs(1.0 / ratios - 1.0).max() * (kb_h - 1)))
print(f"n={n} k_max={k_max} kb_h={kb_h} smax={smax} (need {need}) "
      f"segl_h={segl_h}")
assert need <= smax

def run_dense():
    return asrc_step_dense(*common, taps, F, kmax_d, kp_d, hist_len, tp,
                           segl_d, kb_d, interp)

def run_hankel():
    return asrc_step_hankel(*common, taps, F, kmax_h, kp_h, hist_len, tp,
                            segl_h, kb_h, smax, interp)

h1, o1 = run_dense()
h2, o2 = run_hankel()
o1 = np.asarray(o1)[:, :k_max]
o2 = np.asarray(o2)[:, :k_max]
md = np.abs(o1 - o2).max()
scale = np.abs(o1).max()
print(f"maxdiff dense-vs-hankel: {md:.3e} (scale {scale:.2f})")
assert md <= 2e-5 * scale, "MISMATCH"

if cpu:
    print("CPU interpret check OK")
    sys.exit(0)

# interleaved timed batches
def timed(fn, reps):
    t0 = time.perf_counter()
    for _ in range(reps):
        h, o = fn()
    _ = float(jnp.sum(o))
    return (time.perf_counter() - t0) / reps

outs = int(Ks.sum())
for rnd in range(3):
    for name, fn in (("dense ", run_dense), ("hankel", run_hankel)):
        dt = timed(fn, 5)
        print(f"  {name}: {outs/dt/1e6:7.1f} M out/s  ({dt*1e3:6.2f} ms)")
