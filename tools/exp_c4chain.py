"""Config-4 (5.1ch 48k->44.1k f64 -p) chain restructuring A/B.

The in-graph stage ablation puts the chunk bodies at ~28 ms per 2^19
chunk (bq_full 16.7 + rs_full 10.9, tools/exp_config4_stages.py) while
the shipped 2-dispatch-per-chunk chain measures ~39 ms (312 ms / 8,
exp_config4) — and the biquad itself does twice the Toeplitz work it
needs to: the ART -p filter is a 2-section cascade of biquads whose
companion-matrix kernel is ALREADY order-4, so the cascade can run as
ONE combined 4th-order section (a_c = a1*a2, b_c = b1*b2 polynomial
products; state = (input history, final-output history)).

Variants (same-process, one scalar fetch per timed run, 8 x 2^19-class
chunks per run):
  percall   the shipped shape: casc.process + eng.process per chunk
  fused     cascade + resample chunk in ONE jit, per-chunk dispatch
  fscan     the fused chunk body lax.scan'ed G=8 -> ONE dispatch
  comb4     fscan with the single combined order-4 section
  comb4band fscan/comb4 + band-sliced residue dots (the f64 contraction
            is flop-bound; rows >= M+taps of P are structural zeros)

Accuracy: fused vs percall bitwise (same float ops), comb4 relerr vs
fused (reassociated cascade — expected ~1e-14 class), band bitwise vs
comb4.

Usage: python tools/exp_c4chain.py [reps]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from art_tpu.core import flags as F
from art_tpu.engines.biquad import Biquad, biquad_lowpass
from art_tpu.ops.biquad_kernel import (DeviceBiquadCascade,
                                       assoc_core_full, iir_tables)
from art_tpu.parallel.pipeline import residue_window_dots
from art_tpu.parallel.streams import DeviceStreamResampler, _chunk_body

IBL = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS | F.INCLUDE_LOWPASS
HI = jax.lax.Precision.HIGHEST
reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
G = 8

coeffs = biquad_lowpass(0.45 * 44100 / 48000)
eng = DeviceStreamResampler(6, 380, 380, 48000, 44100, 0, IBL,
                            dtype=np.float64)
eng.advance_position(190)
n = eng.M * 3277                       # M-multiple ~2^19 chunk
x0 = jnp.zeros((6, n), jnp.float64)
eng.process(x0, n)                      # absorb the non-periodic chunk
K, start, j0, pos0, plan = eng._plan_compute(n)
M, L, qn, hist_len = eng.M, eng.L, eng.qn, eng.num_samples
nb = -(-K // L)
nb_rs = -(-nb // qn) * qn
P = eng._matrix(j0)
Pnp = np.asarray(P)
rows_nz = np.nonzero(np.any(Pnp != 0.0, axis=1))[0]
Kb = (int(rows_nz[-1]) + 8) // 8 * 8 if rows_nz.size else qn * M
print(f"# M={M} L={L} qn={qn} K={K} nb={nb} n={n} band rows {Kb} of "
      f"{qn*M}", file=sys.stderr, flush=True)

b1 = Biquad.init(coeffs, 1.0, 6, np.float64)
b2 = Biquad.init(coeffs, 1.0, 6, np.float64)
a1j, b1j = jnp.asarray(b1.a), jnp.asarray(b1.b)
a2j, b2j = jnp.asarray(b2.a), jnp.asarray(b2.b)
t1, t2 = iir_tables(b1.b), iir_tables(b2.b)
# combined order-4 section: polynomial products of the two sections
ac = np.convolve(b1.a[:3], b2.a[:3])               # [5]
bc = np.convolve(np.concatenate([[1.0], b1.b[1:3]]),
                 np.concatenate([[1.0], b2.b[1:3]]))
bc[0] = 0.0                                        # b[0] unused
acj, bcj = jnp.asarray(ac), jnp.asarray(bc)
tc = iir_tables(bc)

x1 = jax.random.normal(jax.random.PRNGKey(4), (6, n), jnp.float64) * 0.25
h0 = jnp.zeros((6, hist_len), jnp.float64)
z4 = jnp.zeros((4, 6), jnp.float64)
a0 = jnp.zeros((), jnp.float64)


def dots_band(win, Pb, S):
    nr = nb_rs // qn
    KQ = qn * M
    outs = []
    for r in range(qn):
        Vr = jax.lax.slice(win, (0, r * M), (S, r * M + nr * KQ)) \
            .reshape(S, nr, KQ)
        Vr = jax.lax.slice(Vr, (0, 0, 0), (S, nr, Kb))
        outs.append(jax.lax.dot_general(
            Vr, Pb, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=win.dtype, precision=HI))
    return jnp.stack(outs, axis=2).reshape(S, nb_rs, -1)


def rs_body(hist, y, acc, band):
    if not band:
        return _chunk_body(hist, y, P, jnp.int32(start), jnp.int32(K),
                           acc, M, L, nb, qn, hist_len)
    xlen = (nb_rs + qn) * M
    buf = jnp.concatenate([hist, y], axis=1)
    pad = jnp.zeros((6, xlen), dtype=y.dtype)
    win = jax.lax.dynamic_slice(
        jnp.concatenate([buf, pad], axis=1), (jnp.int32(0),
                                              jnp.int32(start)), (6, xlen))
    out = dots_band(win, P[:Kb], 6)
    out = jax.lax.slice(out, (0, 0, 0), (6, nb, L)).reshape(6, nb * L)
    valid = (jnp.arange(nb * L, dtype=jnp.int32) < K).astype(out.dtype)
    out = out * valid[None, :]
    new_hist = jax.lax.dynamic_slice(
        buf, (0, buf.shape[1] - hist_len), (6, hist_len))
    return new_hist, out, acc + jnp.sum(out * out)


def chain_body(carry, comb, band):
    hist, acc, st = carry
    x = x1 + acc * 1e-300
    if comb:
        y, xh, yh = assoc_core_full(x.T, acj, bcj, st[0], st[1], tc)
        st = (xh, yh, st[2], st[3])
    else:
        y1, xh1, yh1 = assoc_core_full(x.T, a1j, b1j, st[0], st[1], t1)
        y, xh2, yh2 = assoc_core_full(y1, a2j, b2j, st[2], st[3], t2)
        st = (xh1, yh1, xh2, yh2)
    hist, out, acc = rs_body(hist, y.T, acc, band)
    return (hist, acc, st), out


def make_fused(comb, band):
    @jax.jit
    def step(hist, acc, st):
        (hist, acc, st), _ = chain_body((hist, acc, st), comb, band)
        return hist, acc, st
    return step


def make_fscan(comb, band):
    @jax.jit
    def run(hist, acc, st):
        def body(carry, _):
            carry, _out = chain_body(carry, comb, band)
            return carry, None
        (hist, acc, st), _ = jax.lax.scan(body, (hist, acc, st), None,
                                          length=G)
        return hist, acc, st
    return run


# ---- correctness ------------------------------------------------------
st0 = (z4, z4, z4, z4)
c_ref, out_ref = chain_body((h0, a0, st0), False, False)
c_c4, out_c4 = chain_body((h0, a0, st0), True, False)
c_cb, out_cb = chain_body((h0, a0, st0), True, True)
rel = float(jnp.max(jnp.abs(out_c4 - out_ref))
            / jnp.max(jnp.abs(out_ref)))
bd = float(jnp.max(jnp.abs(out_cb - out_c4)))
print(f"# comb4 vs cascade relerr {rel:.2e}; band vs comb4 max abs "
      f"{bd:.2e}", flush=True)

# ---- shipped per-call shape ------------------------------------------
eng2 = DeviceStreamResampler(6, 380, 380, 48000, 44100, 0, IBL,
                             dtype=np.float64)
eng2.advance_position(190)
eng2.prewarm()
eng2.process(x0, n)
casc = DeviceBiquadCascade(Biquad.init(coeffs, 1.0, 1, np.float64),
                           Biquad.init(coeffs, 1.0, 1, np.float64))
casc.push_from(b1, b2)


def run_percall():
    acc = jnp.zeros((), jnp.float64)
    for _ in range(G):
        y = casc.process(x1, n)
        out, Kk, acc = eng2.process(y, n, acc)
    float(acc)


fused = make_fused(False, False)
fscan = make_fscan(False, False)
comb4 = make_fscan(True, False)
comb4band = make_fscan(True, True)


def run_fused():
    hist, acc, st = h0, a0, st0
    for _ in range(G):
        hist, acc, st = fused(hist, acc, st)
    float(acc)


def mk(runner):
    def run():
        hist, acc, st = runner(h0, a0, st0)
        float(acc)
    return run


RUNS = {"percall": run_percall, "fused": run_fused,
        "fscan": mk(fscan), "comb4": mk(comb4),
        "comb4band": mk(comb4band)}
for name, r in RUNS.items():
    t0 = time.perf_counter()
    r()
    print(f"# {name} compile+run {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
res = {k: [] for k in RUNS}
for _ in range(reps):
    for name, r in RUNS.items():
        t0 = time.perf_counter()
        r()
        res[name].append(time.perf_counter() - t0)
for name in RUNS:
    m = sorted(res[name])[len(res[name]) // 2]
    print(f"{name:10s}: {m/G*1e3:7.2f} ms/chunk  "
          f"({K*G/m/1e6:6.2f} M out/s)", flush=True)
