"""Stage-level decomposition of the config-4 f64 device chain, measured
per-chunk inside ONE scan dispatch (NS steps) so tunnel overhead cannot
confound (method: tools/exp_winbuild.py).  Complements exp_config4.py's
engine-level split (bq vs rs) with the *inside* of each:

  rs_full   : the shipped f64 _chunk_body (window + residue dots + mask +
              power)
  rs_dot    : residue dots only, operands prebuilt (carry-anchored so XLA
              cannot hoist the loop-invariant dot — CLAUDE.md)
  rs_win    : window build + new_hist only (concat + dynamic slices),
              dots replaced by a cheap sum
  rs_mask   : mask + power only on a prebuilt [S, nb*L] f64 array
  bq_fir    : the cascade's FIR prologue (a-taps pointwise f64) only
  bq_toep   : the block-Toeplitz einsums + 4-vector carry scan only
  bq_full   : one full masked cascade section pair (_cascade2_step body)

Usage: python tools/exp_config4_stages.py [reps] [NS]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from art_tpu.core import flags as F
from art_tpu.engines.biquad import Biquad, biquad_lowpass
from art_tpu.ops.biquad_kernel import assoc_core_masked, iir_tables
from art_tpu.parallel.streams import DeviceStreamResampler, _chunk_body

HI = jax.lax.Precision.HIGHEST
IB = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS | F.INCLUDE_LOWPASS
reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
NS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
chunk = 1 << 19
S = 6

eng = DeviceStreamResampler(S, 380, 380, 48000, 44100, 0, IB,
                            dtype=np.float64)
eng.advance_position(190)
K, start, j0, pos0, plan = eng._plan_compute(chunk)
nb = -(-K // eng.L)
M, L, qn, hist_len = eng.M, eng.L, eng.qn, eng.num_samples
P = eng._matrix(j0)
nb_rs = -(-nb // qn) * qn
nr = nb_rs // qn
KQ = qn * M
xlen = (nb_rs + qn) * M
x = jax.random.normal(jax.random.PRNGKey(1), (S, chunk), jnp.float64) * 0.25
win0 = jax.random.normal(jax.random.PRNGKey(2), (S, xlen),
                         jnp.float64) * 0.25
out0 = jax.random.normal(jax.random.PRNGKey(3), (S, nb * L),
                         jnp.float64) * 0.25

coeffs = biquad_lowpass(0.45 * 44100 / 48000)
bq = Biquad.init(coeffs, 1.0, channels=S, dtype=np.float64)
a5 = jnp.asarray(np.asarray(bq.a, np.float64))
b5 = jnp.asarray(np.asarray(bq.b, np.float64))
t1 = iir_tables(np.asarray(bq.b, np.float64))
xh0 = jnp.zeros((4, S), jnp.float64)
yh0 = jnp.zeros((4, S), jnp.float64)
xT = x.T                                           # [n, S] for the biquad


def rs_full(hist, acc, c):
    hist, out, acc = _chunk_body(hist, x + c * 1e-30, P, jnp.int32(start),
                                 jnp.int32(K), acc, M, L, nb, qn, hist_len)
    return hist, acc


def rs_dot(hist, acc, c):
    win = win0 + c * 1e-30
    outs = []
    for r in range(qn):
        Vr = jax.lax.slice(win, (0, r * M), (S, r * M + nr * KQ)) \
            .reshape(S, nr, KQ)
        outs.append(jax.lax.dot_general(
            Vr, P, (((2,), (0,)), ((), ())),
            preferred_element_type=win.dtype, precision=HI))
    out = jnp.stack(outs, axis=2).reshape(S, nb_rs, L)
    return hist, acc + jnp.sum(out[:, 0, 0])


def rs_win(hist, acc, c):
    buf = jnp.concatenate([hist, x + c * 1e-30], axis=1)
    pad = jnp.zeros((S, xlen), dtype=x.dtype)
    win = jax.lax.dynamic_slice(
        jnp.concatenate([buf, pad], axis=1),
        (jnp.int32(0), jnp.int32(start)), (S, xlen))
    new_hist = jax.lax.dynamic_slice(
        buf, (0, buf.shape[1] - hist_len), (S, hist_len))
    return new_hist, acc + jnp.sum(win[:, ::4096])


def rs_mask(hist, acc, c):
    out = out0 + c * 1e-30
    valid = (jnp.arange(nb * L, dtype=jnp.int32)
             < jnp.int32(K)).astype(out.dtype)
    out = out * valid[None, :]
    return hist, acc + jnp.sum(out * out)


def bq_fir(hist, acc, c):
    xm = xT + c * 1e-30
    xpad = jnp.concatenate([xh0[::-1], xm], axis=0)
    f = (a5[0] * xpad[4:] + a5[1] * xpad[3:-1] + a5[2] * xpad[2:-2]
         + a5[3] * xpad[1:-3] + a5[4] * xpad[:-4])
    return hist, acc + jnp.sum(f[::4096])


def bq_toep(hist, acc, c):
    from art_tpu.ops.biquad_kernel import _iir_y
    f = xT + c * 1e-30
    y = _iir_y(f, b5, yh0, t1)
    return hist, acc + jnp.sum(y[::4096])


# --- inside-of-_iir_y decomposition (geometry of the 2^19 6ch call) ---
_B = 256
_Sp = 8
_nb = chunk // _B
_T_, _G_, _Wv_, _AB_, _PW_, _W_, _WQ_, _ABQ_ = t1
_F2c = jax.random.normal(jax.random.PRNGKey(7), (_B, _nb * _Sp),
                         jnp.float64) * 0.25
_S2c = jax.random.normal(jax.random.PRNGKey(8), (4, _nb * _Sp),
                         jnp.float64) * 0.25
_HI = jax.lax.Precision.HIGHEST


def toep_mm(hist, acc, c):
    """The two wide f64 matmuls alone (T@F2 + G@S2)."""
    F2 = _F2c + c * 1e-30
    Y2 = jnp.dot(_T_, F2, precision=_HI) + jnp.dot(_G_, _S2c, precision=_HI)
    return hist, acc + jnp.sum(Y2[0, ::4096])


def toep_tr(hist, acc, c):
    """The layout moves alone: [n,Sp] -> blocks -> [B, nb*Sp] -> back."""
    f = xT + c * 1e-30
    f = jnp.concatenate(
        [f, jnp.zeros((chunk, _Sp - S), jnp.float64)], axis=1)
    fb = f.reshape(_nb, _B, _Sp)
    F2 = fb.transpose(1, 0, 2).reshape(_B, _nb * _Sp)
    y = F2.reshape(_B, _nb, _Sp).transpose(1, 0, 2).reshape(_nb * _B, _Sp)
    return hist, acc + jnp.sum(y[::4096])


def toep_inner(hist, acc, c):
    """The carry einsums + 32-step outer scan alone."""
    F2 = _F2c + c * 1e-30
    v2 = jnp.dot(_Wv_, F2, precision=_HI)
    v = v2.reshape(4, _nb, _Sp).transpose(1, 0, 2)
    nsb = _nb // 64
    vsb = v.reshape(nsb, 64, 4, _Sp)
    inner = jnp.einsum("qjab,kjbs->kqas", _W_, vsb, precision=_HI)
    u = jnp.einsum("jab,kjbs->kas", _WQ_, vsb, precision=_HI)

    def sstep(e, ub):
        return jnp.dot(_ABQ_, e, precision=_HI) + ub, e
    _, E = jax.lax.scan(sstep, jnp.zeros((4, _Sp), jnp.float64), u)
    sks = (jnp.einsum("qab,kbs->kqas", _PW_, E, precision=_HI) + inner)
    return hist, acc + jnp.sum(sks[:, 0, 0, :])


def bq_full(hist, acc, c):
    y, xh, yh = assoc_core_masked(xT + c * 1e-30, a5, b5, xh0, yh0,
                                  jnp.int32(chunk), t1)
    return hist, acc + jnp.sum(y[::4096])


def scan_of(body):
    @jax.jit
    def run(hist, acc):
        def step(carry, _):
            hist, acc = carry
            c = acc * 0 + 1e-30          # carry-dependent anchor
            hist, acc = body(hist, acc + c, acc)
            return (hist, acc), None
        (hist, acc), _ = jax.lax.scan(step, (hist, acc), None, length=NS)
        return hist, acc
    return run


variants = {"rs_full": rs_full, "rs_dot": rs_dot, "rs_win": rs_win,
            "rs_mask": rs_mask, "bq_fir": bq_fir, "bq_toep": bq_toep,
            "bq_full": bq_full, "toep_mm": toep_mm, "toep_tr": toep_tr,
            "toep_inner": toep_inner}
if "--toep-only" in sys.argv:
    variants = {k: v for k, v in variants.items() if k.startswith("toep")}
h0 = jnp.zeros((S, hist_len), jnp.float64)
a0 = jnp.zeros((), jnp.float64)
runs = {}
for name, body in variants.items():
    runs[name] = scan_of(body)
    t0 = time.perf_counter()
    h, a = runs[name](h0, a0)
    float(a)
    print(f"# {name} compile+run {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

res = {k: [] for k in runs}
for _ in range(reps):
    for name, r in runs.items():
        t0 = time.perf_counter()
        h, a = r(h0, a0)
        float(a)
        res[name].append(time.perf_counter() - t0)
for name in runs:
    m = sorted(res[name])[len(res[name]) // 2]
    print(f"{name:8s}: {m/NS*1e3:7.2f} ms/chunk  "
          f"({K/(m/NS)/1e6:7.2f} M out/s-equiv)")
