"""Stage ablation of the fixed-ratio chunk body (preset-3 44.1->48,
2^22 chunks): where does the time go?

CAVEAT (learned the hard way): this harness times 8 SEPARATE dispatches
plus one scalar fetch per region, so ~(8*2ms dispatch + 25ms fetch) of
tunnel overhead is baked into every row — the per-stage RATIOS are
meaningful, the absolute ms are not.  tools/exp_winbuild.py re-measures
the same body inside one lax.scan dispatch (32 steps) and is the
authoritative per-chunk number (2.4 ms vs the ~9.5 ms this harness
reports).  Kept for the stage-ratio evidence and as a record of the
confound.

  full      : the shipped _chunk_step (window build + residue dots +
              mask/power + history extraction)
  dots-only : residue dots on a PRE-BUILT padded window (no concat /
              dynamic_slice / mask / power / hist)
  win-only  : window build + hist extraction, dots replaced by a cheap
              sum (isolates the HBM/elementwise side)

Interleaved same-process, device-resident, one scalar fetch per timed
region.  Rates in M out/s over the same K.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from art_tpu.core import flags as F
from art_tpu.parallel.pipeline import residue_window_dots
from art_tpu.parallel.streams import DeviceStreamResampler, _chunk_step

IB = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS | F.INCLUDE_LOWPASS
HI = jax.lax.Precision.HIGHEST
reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
chunk = 1 << 22

eng = DeviceStreamResampler(2, 380, 380, 44100, 48000, 0, IB)
eng.advance_position(190)
K, start, j0, pos0, plan = eng._plan_compute(chunk)
nb = -(-K // eng.L)
M, L, qn, hist_len = eng.M, eng.L, eng.qn, eng.num_samples
P = eng._matrix(j0)
x = jax.random.normal(jax.random.PRNGKey(1), (2, chunk), jnp.float32) * 0.25
nb_rs = -(-nb // qn) * qn
xlen = (nb_rs + qn) * M
win_pre = jax.random.normal(jax.random.PRNGKey(2), (2, xlen),
                            jnp.float32) * 0.25
acc0 = jnp.zeros((), jnp.float32)


@jax.jit
def dots_only(win, P, acc):
    out = residue_window_dots(win, P, M=M, nb_rs=nb_rs, qn_pad=qn,
                              qn_local=qn, q0=0)
    return acc + jnp.sum(out)


@jax.jit
def win_only(hist, x, start, acc):
    buf = jnp.concatenate([hist, x], axis=1)
    pad = jnp.zeros((2, xlen), dtype=x.dtype)
    win = jax.lax.dynamic_slice(
        jnp.concatenate([buf, pad], axis=1), (jnp.int32(0), start),
        (2, xlen))
    new_hist = jax.lax.dynamic_slice(
        buf, (0, buf.shape[1] - hist_len), (2, hist_len))
    return new_hist, acc + jnp.sum(win)


def t_full(n=8):
    a = jnp.zeros((), jnp.float32)
    h = eng.hist
    for _ in range(n):
        h, _, a = _chunk_step(h, x, P, jnp.int32(start), jnp.int32(K), a,
                              M, L, nb, qn, hist_len)
    float(a)


def t_dots(n=8):
    a = jnp.zeros((), jnp.float32)
    for _ in range(n):
        a = dots_only(win_pre, P, a)
    float(a)


def t_win(n=8):
    a = jnp.zeros((), jnp.float32)
    h = eng.hist
    for _ in range(n):
        h, a = win_only(h, x, jnp.int32(start), a)
    float(a)


for f in (t_full, t_dots, t_win):
    f()
res = {}
for _ in range(reps):
    for name, f in (("full", t_full), ("dots", t_dots), ("win", t_win)):
        t0 = time.perf_counter(); f(); res.setdefault(name, []).append(
            time.perf_counter() - t0)
for name in ("full", "dots", "win"):
    m = sorted(res[name])[len(res[name]) // 2]
    print(f"{name:5s}: {m*1e3:7.1f} ms  ({8*K/m/1e6:6.1f} M out/s)")
fl = 8 * 2 * 2 * nb_rs * L * qn * M
m = sorted(res["dots"])[len(res["dots"]) // 2]
print(f"dots-only MXU rate: {fl/m/1e12:.2f} TFLOP/s "
      f"(K={qn*M}, L={L}, rows={2*nb_rs//qn} x{qn} residues)")
