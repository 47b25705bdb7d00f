"""A/B/C: the residue-split contraction (4 dots of nr rows) vs one big
dot over an explicitly concatenated [S, nb_rs, KQ] operand (im2col
materialization: +1 HBM copy, but the MXU sees 4x the rows per dot) vs
lax.conv_general_dilated with window stride M.

Motivation (tools/exp_fixed_ablate.py, slow hour): the shipped residue
dots measure 1.58 TFLOP/s while the same-[K, L]-shape anchor strip with
4x the rows per dot measures 6.3 TFLOP/s (tools/sol_anchor.py) — if the
gap is per-dot row count, one big dot + copy should win big.

Interleaved same-process; values cross-checked against the shipped form.
Usage: python tools/exp_onedot.py [reps]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from art_tpu.core import flags as F
from art_tpu.parallel.pipeline import residue_window_dots
from art_tpu.parallel.streams import DeviceStreamResampler

IB = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS | F.INCLUDE_LOWPASS
HI = jax.lax.Precision.HIGHEST
reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
chunk = 1 << 22

eng = DeviceStreamResampler(2, 380, 380, 44100, 48000, 0, IB)
eng.advance_position(190)
K, start, j0, pos0, plan = eng._plan_compute(chunk)
nb = -(-K // eng.L)
M, L, qn = eng.M, eng.L, eng.qn
P = eng._matrix(j0)
nb_rs = -(-nb // qn) * qn
nr = nb_rs // qn
KQ = qn * M
xlen = (nb_rs + qn) * M
S = 2
win = jax.random.normal(jax.random.PRNGKey(2), (S, xlen),
                        jnp.float32) * 0.25


@jax.jit
def v_resid(win, P, acc):
    out = residue_window_dots(win, P, M=M, nb_rs=nb_rs, qn_pad=qn,
                              qn_local=qn, q0=0)
    return acc + jnp.sum(out), out


@jax.jit
def v_onedot(win, P, acc):
    # im2col grouped by residue: rows [r*nr + i] = window of block i*qn+r
    Vs = [jax.lax.slice(win, (0, r * M), (S, r * M + nr * KQ))
          .reshape(S, nr, KQ) for r in range(qn)]
    V = jnp.concatenate(Vs, axis=1)                 # [S, nb_rs, KQ] (copy)
    d = jax.lax.dot_general(V, P, (((2,), (0,)), ((), ())),
                            preferred_element_type=win.dtype, precision=HI)
    # ungroup: residue-major [qn, nr] -> block order [nr, qn]
    out = d.reshape(S, qn, nr, L).transpose(0, 2, 1, 3).reshape(
        S, nb_rs, L)
    return acc + jnp.sum(out), out


@jax.jit
def v_conv(win, P, acc):
    # [S, 1, xlen] conv [L_out=L, 1, KQ] stride M -> [S, L, n_blocks]
    lhs = win[:, None, :]
    rhs = P.T[:, None, :]                           # [L, 1, KQ]
    d = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(M,), padding="VALID",
        precision=HI)                               # [S, L, nw]
    out = d[:, :, :nb_rs].transpose(0, 2, 1)        # [S, nb_rs, L]
    return acc + jnp.sum(out), out


a0 = jnp.zeros((), jnp.float32)
_, o1 = v_resid(win, P, a0)
_, o2 = v_onedot(win, P, a0)
md = float(jnp.abs(o1 - o2).max())
print(f"onedot vs resid max abs diff: {md:.3e}")
try:
    _, o3 = v_conv(win, P, a0)
    mdc = float(jnp.abs(o1 - o3).max())
    print(f"conv  vs resid max abs diff: {mdc:.3e}")
    have_conv = True
except Exception as e:
    print("conv variant failed:", type(e).__name__, str(e)[:120])
    have_conv = False


def timed(fn, n=8):
    a = jnp.zeros((), jnp.float32)
    for _ in range(n):
        a, _ = fn(win, P, a)
    float(a)


variants = [("resid", v_resid), ("onedot", v_onedot)]
if have_conv:
    variants.append(("conv", v_conv))
for _, f in variants:
    timed(f)
res = {}
for _ in range(reps):
    for name, f in variants:
        t0 = time.perf_counter(); timed(f)
        res.setdefault(name, []).append(time.perf_counter() - t0)
fl = 8 * 2 * S * nb_rs * KQ * L
for name, _ in variants:
    m = sorted(res[name])[len(res[name]) // 2]
    print(f"{name:7s}: {m*1e3:7.1f} ms  ({8*K/m/1e6:6.1f} M out/s, "
          f"{fl/m/1e12:.2f} TFLOP/s)")


@jax.jit
def v_dot2d(win, P, acc):
    """Materialize im2col, flatten the [S, nb_rs] leading dims, one 2-D
    dot — isolates whether the 3-D dot_general (leading batch dim S=2)
    is what leaves 3.3x vs the 2-D anchor strip on the table."""
    Vs = [jax.lax.slice(win, (0, r * M), (S, r * M + nr * KQ))
          .reshape(S, nr, KQ) for r in range(qn)]
    V = jnp.concatenate(Vs, axis=1).reshape(S * nb_rs, KQ)
    d = jax.lax.dot_general(V, P, (((1,), (0,)), ((), ())),
                            preferred_element_type=win.dtype, precision=HI)
    out = d.reshape(S, qn, nr, L).transpose(0, 2, 1, 3).reshape(
        S, nb_rs, L)
    return acc + jnp.sum(out), out


if __name__ == "__main__" and "--dot2d" in sys.argv:
    a0 = jnp.zeros((), jnp.float32)
    _, o4 = v_dot2d(win, P, a0)
    print("dot2d vs resid max abs diff:",
          float(jnp.abs(o1 - o4).max()))
    timed(v_dot2d)
    res2 = {"resid": [], "dot2d": []}
    for _ in range(reps):
        for name, f in (("resid", v_resid), ("dot2d", v_dot2d)):
            t0 = time.perf_counter(); timed(f)
            res2[name].append(time.perf_counter() - t0)
    for name in ("resid", "dot2d"):
        m = sorted(res2[name])[len(res2[name]) // 2]
        print(f"{name:7s}: {m*1e3:7.1f} ms  ({8*K/m/1e6:6.1f} M out/s, "
              f"{fl/m/1e12:.2f} TFLOP/s)")
