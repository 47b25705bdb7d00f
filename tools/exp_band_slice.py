"""A/B: band-sliced contraction (K cut to the tile-rounded Toeplitz band
height span=M+taps; the dropped rows are exact zeros in the phase
matrix) vs the shipped full qn*M contraction.

MEASURED NEGATIVE (2026-08-17, v5e via tunnel, interleaved same-process):

  preset-2 96k->44.1k   K 640->512: 0.999x  (neutral)
  preset-1 44.1->48 int K 294->256: 0.902x  (regression!)
  preset-3 headline     K 588->588: 1.066x  (identical programs -> the
                                    A/B noise floor is ~±7%)

Conclusion: the residue-split dot is NOT K-tile-bound at these shapes
(window build / HBM traffic dominate), and the strided sub-slice operand
can even cost a repack.  The span plumbing was reverted from the product
code; this tool keeps the experiment reproducible standalone.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from art_tpu.core import flags as F
from art_tpu.parallel.streams import DeviceStreamResampler

IB = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS | F.INCLUDE_LOWPASS
HI = jax.lax.Precision.HIGHEST
reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def body(hist, x, P, start, K, acc, M, L, nb, qn, hist_len, K_eff):
    """The fused chunk body with an optional band slice of the
    contraction (K_eff < qn*M drops the all-zero tail rows)."""
    ch = x.shape[0]
    nb_rs = -(-nb // qn) * qn
    xlen = (nb_rs + qn) * M
    buf = jnp.concatenate([hist, x], axis=1)
    pad = jnp.zeros((ch, xlen), dtype=x.dtype)
    win = jax.lax.dynamic_slice(
        jnp.concatenate([buf, pad], axis=1), (jnp.int32(0), start),
        (ch, xlen))
    S_, nr, KQ = ch, nb_rs // qn, qn * M
    P_use = P if K_eff == KQ else jax.lax.slice(P, (0, 0),
                                                (K_eff, P.shape[1]))
    outs = []
    for r in range(qn):
        Vr = jax.lax.slice(win, (0, r * M), (S_, r * M + nr * KQ)) \
            .reshape(S_, nr, KQ)
        if K_eff != KQ:
            Vr = jax.lax.slice(Vr, (0, 0, 0), (S_, nr, K_eff))
        outs.append(jax.lax.dot_general(
            Vr, P_use, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=win.dtype, precision=HI))
    out = jnp.stack(outs, axis=2).reshape(S_, nb_rs, -1)
    out = jax.lax.slice(out, (0, 0, 0), (ch, nb, L)).reshape(ch, nb * L)
    valid = (jnp.arange(nb * L, dtype=jnp.int32) < K).astype(out.dtype)
    out = out * valid[None, :]
    acc = acc + jnp.sum(out * out)
    new_hist = jax.lax.dynamic_slice(
        buf, (0, buf.shape[1] - hist_len), (ch, hist_len))
    return new_hist, out, acc


step = jax.jit(body, static_argnames=("M", "L", "nb", "qn", "hist_len",
                                      "K_eff"))


def ab(name, ctor, chunk):
    eng = DeviceStreamResampler(*ctor)
    eng.advance_position(ctor[1] // 2)
    K, start, j0, pos0, plan = eng._plan_compute(chunk)
    if eng.interp:
        print(f"{name}: interp mode, using lerp-free probe of the first "
              "bank only")
        return
    nb = -(-K // eng.L)
    span = eng.M + eng.num_taps
    KQ = eng.qn * eng.M
    K_eff = min(KQ, -(-span // 256) * 256)
    P = eng._matrix(j0)
    x = jax.random.normal(jax.random.PRNGKey(1), (ctor[0], chunk),
                          dtype=jnp.float32) * 0.25
    acc0 = jnp.zeros((), jnp.float32)

    def call(ke):
        return step(eng.hist, x, P, jnp.int32(start), jnp.int32(K), acc0,
                    eng.M, eng.L, nb, eng.qn, eng.num_samples, ke)

    h1, o1, a1 = call(KQ)
    h2, o2, a2 = call(K_eff)
    same = bool(jnp.all(o1 == o2)) and bool(jnp.all(h1 == h2))

    def timed(ke, n=8):
        a = jnp.zeros((), jnp.float32)
        for _ in range(n):
            _, _, a = call(ke)
        float(a)

    timed(KQ); timed(K_eff)
    t0s, t1s = [], []
    for _ in range(reps):
        t = time.perf_counter(); timed(KQ); t0s.append(time.perf_counter() - t)
        t = time.perf_counter(); timed(K_eff); t1s.append(time.perf_counter() - t)
    m0 = sorted(t0s)[len(t0s) // 2]
    m1 = sorted(t1s)[len(t1s) // 2]
    print(f"{name}: K {KQ}->{K_eff}  bitwise={same}  "
          f"full {8*K/m0/1e6:.0f} M/s  sliced {8*K/m1/1e6:.0f} M/s  "
          f"speedup {m0/m1:.3f}x")


ab("preset-2 96k->44.1k", (2, 156, 320, 96000, 44100, 0, IB), 1 << 22)
ab("preset-3 44.1->48 headline", (2, 380, 380, 44100, 48000, 0, IB), 1 << 22)
