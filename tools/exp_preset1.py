"""Preset-1 (mono 44.1k->48k, 48x48 interpolated) on-chip stage ablation.

BENCH_ALL_r03 put this config at 363 M out/s = 11.3x — far below the
preset-3 headline's per-flop rate.  The block-Toeplitz interpolated body
dots K = qn*M = 294 (x 2L = 320 banked columns) per output block while
only taps = 48 products are nonzero per output (6.1x flop inflation +
the 2x interp dual bank), yet the measured rate is still ~5x below the
inflated-flop MXU bound — this harness decomposes the chunk body
(one jit, NS-step lax.scan, carry-coupled operands, one scalar fetch;
CLAUDE.md measurement discipline):

  full     the shipped interpolated chunk body (static plan)
  dots     residue-split banked dots only (win = closure constant + carry)
  win      window build (concat/slice) only
  lerp     dd constant; lerp + mask + power only
  dots195  band-sliced dots: window columns [0, M+taps) of each stride-
           294 view, P2 rows likewise — K 294 -> 195 (1 K-tile, not 2)
  dotsL    single-bank dot [294, 160] (what the lerp's 2L doubling costs)

Usage: python tools/exp_preset1.py [reps] [NS]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from art_tpu.core import flags as F
from art_tpu.parallel import streams
from art_tpu.parallel.pipeline import residue_window_dots

HI = jax.lax.Precision.HIGHEST
reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
NS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
IB = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS

eng = streams.DeviceStreamResampler(1, 48, 48, 44100, 48000, 0, IB)
eng.advance_position(24)
chunk = 147 * 28533
# absorb the non-periodic first chunk, then capture the steady plan
x0 = jnp.zeros((1, chunk), jnp.float32)
eng.process(x0, chunk)
K, start, j0, pos0, plan = eng._plan_compute(chunk)
P2, fracv, dpat, fipat, fracpat = eng._interp_matrix(pos0)
M, L, qn, hist_len = eng.M, eng.L, eng.qn, eng.num_samples
taps = eng.num_taps
nb = -(-K // L)
nb_rs = -(-nb // qn) * qn
xlen = (nb_rs + qn) * M
KQ = qn * M
# nonzero window span per block row, measured from the banked matrix
# itself (structurally ~M + taps for taps < M)
_rows_nz = np.nonzero(np.any(np.asarray(P2) != 0.0, axis=1))[0]
Kband = int(_rows_nz[-1]) + 1 if _rows_nz.size else KQ
print(f"# M={M} L={L} qn={qn} taps={taps} K={K} nb={nb} nb_rs={nb_rs} "
      f"P2={P2.shape} hist_len={hist_len}", file=sys.stderr, flush=True)

x1 = jax.random.normal(jax.random.PRNGKey(0), (1, chunk),
                       jnp.float32) * 0.25
h0 = jnp.zeros((1, hist_len), jnp.float32)
a0 = jnp.zeros((), jnp.float32)
valid = (jnp.arange(nb * L, dtype=jnp.int32) < K)
# P2 with only the nonzero band rows (rows >= Kband are structurally zero:
# block row i covers window cols [0, M + taps) of its stride-KQ view)
P2band = P2[:Kband, :]
win_const = jax.random.normal(jax.random.PRNGKey(1), (1, xlen),
                              jnp.float32) * 0.25
dd_const = jax.random.normal(jax.random.PRNGKey(2), (1, nb_rs, 2 * L),
                             jnp.float32) * 0.25


def build_win(hist, x):
    buf = jnp.concatenate([hist, x], axis=1)
    pad = jnp.zeros((1, xlen), dtype=x.dtype)
    win = jax.lax.slice(jnp.concatenate([buf, pad], axis=1),
                        (0, start), (1, start + xlen))
    new_hist = jax.lax.slice(buf, (0, buf.shape[1] - hist_len),
                             (1, buf.shape[1]))
    return win, new_hist


def dots_band(win, P2b):
    nr = nb_rs // qn
    outs = []
    for r in range(qn):
        Vr = jax.lax.slice(win, (0, r * M), (1, r * M + nr * KQ)) \
            .reshape(1, nr, KQ)
        Vr = jax.lax.slice(Vr, (0, 0, 0), (1, nr, Kband))
        outs.append(jax.lax.dot_general(
            Vr, P2b, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=win.dtype, precision=HI))
    return jnp.stack(outs, axis=2).reshape(1, nb_rs, -1)


def lerp_mask_acc(dd, acc):
    dd = jax.lax.slice(dd, (0, 0, 0), (1, nb, 2 * L))
    f = fracv[None, None, :]
    out = dd[:, :, :L] * (1.0 - f) + dd[:, :, L:] * f
    out = out.reshape(1, nb * L) * valid.astype(out.dtype)[None, :]
    return acc + jnp.sum(out * out)


def body_full(hist, acc):
    x = x1 + acc * 1e-30
    win, new_hist = build_win(hist, x)
    dd = residue_window_dots(win, P2, M=M, nb_rs=nb_rs, qn_pad=qn,
                             qn_local=qn, q0=jnp.int32(0))
    return new_hist, lerp_mask_acc(dd, acc)


def body_band(hist, acc):
    x = x1 + acc * 1e-30
    win, new_hist = build_win(hist, x)
    dd = dots_band(win, P2band)
    return new_hist, lerp_mask_acc(dd, acc)


def body_dots(hist, acc):
    win = win_const + acc * 1e-30
    dd = residue_window_dots(win, P2, M=M, nb_rs=nb_rs, qn_pad=qn,
                             qn_local=qn, q0=jnp.int32(0))
    return hist, acc + jnp.sum(dd[:, ::8, ::16] ** 2)


def body_dots_band(hist, acc):
    win = win_const + acc * 1e-30
    dd = dots_band(win, P2band)
    return hist, acc + jnp.sum(dd[:, ::8, ::16] ** 2)


def body_dotsL(hist, acc):
    win = win_const + acc * 1e-30
    dd = residue_window_dots(win, P2[:, :L], M=M, nb_rs=nb_rs, qn_pad=qn,
                             qn_local=qn, q0=jnp.int32(0))
    return hist, acc + jnp.sum(dd[:, ::8, ::16] ** 2)


def body_win(hist, acc):
    x = x1 + acc * 1e-30
    win, new_hist = build_win(hist, x)
    return new_hist, acc + jnp.sum(win[:, ::4096] ** 2)


def body_lerp(hist, acc):
    dd = dd_const + acc * 1e-30
    return hist, lerp_mask_acc(dd, acc)


def make(body):
    @jax.jit
    def run(hist, acc):
        def step(carry, _):
            h, a = carry
            return body(h, a), None
        (h, a), _ = jax.lax.scan(step, (hist, acc), None, length=NS)
        return h, a
    return run


BODIES = {"full": body_full, "band": body_band, "dots": body_dots,
          "dots195": body_dots_band, "dotsL": body_dotsL,
          "win": body_win, "lerp": body_lerp}
runs = {}
for name, b in BODIES.items():
    runs[name] = make(b)

# equality check: band vs full on real data (same products — the sliced
# rows are structural zeros)
wtest = jax.random.normal(jax.random.PRNGKey(3), (1, xlen), jnp.float32)
d_full = residue_window_dots(wtest, P2, M=M, nb_rs=nb_rs, qn_pad=qn,
                             qn_local=qn, q0=jnp.int32(0))
d_band = dots_band(wtest, P2band)
err = float(jnp.max(jnp.abs(d_full - d_band)))
print(f"# band vs full max abs diff: {err:.3e}", flush=True)

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
    print(f"{name:8s}: {m/NS*1e3:6.2f} ms/chunk  "
          f"({K*NS/m/1e6:7.1f} M out/s)", flush=True)
