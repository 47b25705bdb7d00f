"""A/B: ds Hankel kernel low-channel compensation — two_sum-normalized
(fold_low=False, the round-3 original) vs plain folded adds
(fold_low=True).  The low channel is ~2^-24 of the high channel, so plain
accumulation costs ~2^-48 relative — below the ~2^-43 contract — and
drops one two_sum (6 VPU ops) per product term on a VPU-bound kernel.

Must run on REAL Mosaic (interpret mode corrupts error-free transforms,
see PARITY.md).  Same-process interleaved timing; both variants checked
against the host f64 engine oracle on a stream subset.
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

n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
kb = int(sys.argv[2]) if len(sys.argv) > 2 else 256
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
scal, ints = jnp.asarray(scal), jnp.asarray(ints)

interp = jax.default_backend() != "tpu"
print(f"backend={jax.default_backend()} n={n} kb={kb} smax={smax} "
      f"k_max={k_max}", flush=True)


def step(fold):
    return asrc_step_hankel_ds(hist, x, *tabs, scal, ints, taps, F, k_max,
                               k_max, hist_len, tp, segl, kb, smax, interp,
                               fold_low=fold)


# oracle on a subset of streams (the f64 gather step is extremely slow)
SS = 16
h64, o64 = _asrc_step(hist[:SS], x[:SS], jnp.asarray(bank),
                      jnp.asarray(offsets[:SS]), jnp.asarray(ratios[:SS]),
                      jnp.asarray(Ks[:SS]), jnp.int32(hist_len - taps),
                      taps, F, k_max, hist_len)
o64 = np.asarray(o64)
scale = np.abs(o64).max()
for fold in (False, True):
    got = np.asarray(step(fold)[1])[:SS]
    md = np.abs(o64 - got).max()
    print(f"fold_low={fold}: maxdiff {md:.3e} rel {md/scale:.2e}",
          flush=True)
    assert md <= 1e-9 * scale, "ds accuracy regression"


def timed(fold, reps=5):
    t0 = time.perf_counter()
    for _ in range(reps):
        hds, ods = step(fold)
    _ = float(jnp.sum(ods))
    return (time.perf_counter() - t0) / reps


timed(False); timed(True)   # warm
tA, tB = [], []
for _ in range(5):
    tA.append(timed(False))
    tB.append(timed(True))
mA, mB = sorted(tA)[2], sorted(tB)[2]
outs = int(Ks.sum()) * 5
print(f"compensated: {int(Ks.sum())*1.0/mA/1e6:.1f} M out/s "
      f"({mA*1e3:.1f} ms)  folded: {int(Ks.sum())*1.0/mB/1e6:.1f} M out/s "
      f"({mB*1e3:.1f} ms)  ratio {mA/mB:.3f}x", flush=True)
