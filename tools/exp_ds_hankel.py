"""Double-single (f64) Hankel ASRC step: on-TPU correctness + throughput.

Compares asrc_step_hankel_ds against the XLA f64 gather step (exact vs the
host engine) at engine shapes.  NOTE: this check must run on REAL Mosaic —
XLA:CPU (and therefore pallas interpret mode) reassociates/fuses the
error-free transformations unpredictably (graph-shape dependent, measured
f32-class corruption; reduce_precision barriers do not reliably stop it),
while the TPU lowering keeps f32 ops exactly rounded (FMA contraction only
tightens two_prod).  See PARITY.md.

Usage: exp_ds_hankel.py [n] [kb] [smax]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from art_tpu.core.filters import make_filter_bank
from art_tpu.ops.pallas_kernels import (asrc_step_hankel_ds,
                                        dense_bank_tables_ds, hankel_segl,
                                        pack_step_scalars, split_f64_pairs)
from art_tpu.parallel.asrc import _asrc_step

n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
kb = int(sys.argv[2]) if len(sys.argv) > 2 else 128
smax = int(sys.argv[3]) if len(sys.argv) > 3 else 4

S, taps, F = 256, 380, 380
hist_len = taps * 16
half = taps // 2
rng = np.random.default_rng(0)
bank = make_filter_bank(taps, F, 1.0, True, np.float64)
tabs = [jnp.asarray(t) for t in dense_bank_tables_ds(bank)]
tp = tabs[0].shape[0]
segl = hankel_segl(tp, kb, smax)

hist = jnp.asarray(rng.standard_normal((S, hist_len)))
x = jnp.asarray(rng.standard_normal((S, n)))
ratios = 1.0 + 0.01 * np.sin(np.arange(S) * 0.1 + 0.3)
offsets = np.full(S, float(half)) + rng.random(S)
k_max = int(np.ceil((n + 2) * ratios.max())) + 2
k_max = -(-k_max // kb) * kb
bound = float(taps + n - half)
ks = np.arange(k_max, dtype=np.float64)
Ks = ((offsets[:, None] + ks[None, :] / ratios[:, None])
      < bound).sum(axis=1).astype(np.int32)
oh, ol = split_f64_pairs(offsets)
yh, yl = split_f64_pairs(1.0 / ratios)
scal, ints = pack_step_scalars(oh, ol, yh, yl, Ks, hist_len - taps)

interp = jax.default_backend() != "tpu"
print(f"backend={jax.default_backend()} n={n} kb={kb} smax={smax} "
      f"k_max={k_max}")

hds, ods = asrc_step_hankel_ds(
    hist, x, *tabs, jnp.asarray(scal), jnp.asarray(ints), taps, F, k_max,
    k_max, hist_len, tp, segl, kb, smax, interp)

# oracle on a subset of streams (the f64 gather step is extremely slow)
SS = 16
h64, o64 = _asrc_step(hist[:SS], x[:SS], jnp.asarray(bank),
                      jnp.asarray(offsets[:SS]), jnp.asarray(ratios[:SS]),
                      jnp.asarray(Ks[:SS]), jnp.int32(hist_len - taps),
                      taps, F, k_max, hist_len)
o64 = np.asarray(o64)
got = np.asarray(ods)[:SS]
md = np.abs(o64 - got).max()
scale = np.abs(o64).max()
print(f"ds-vs-f64-oracle maxdiff: {md:.3e} (scale {scale:.2f}, "
      f"rel {md/scale:.2e})")
assert md <= 1e-9 * scale, "ds accuracy regression"

t0 = time.perf_counter()
reps, tot = 5, 0
for _ in range(reps):
    hds, ods = asrc_step_hankel_ds(
        hist, x, *tabs, jnp.asarray(scal), jnp.asarray(ints), taps, F,
        k_max, k_max, hist_len, tp, segl, kb, smax, interp)
    tot += int(Ks.sum())
_ = float(jnp.sum(ods))
dt = (time.perf_counter() - t0) / reps
print(f"ds-hankel f64: {tot/reps/dt/1e6:.1f} M out/s ({dt*1e3:.1f} ms)")
