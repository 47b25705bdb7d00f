"""A/B: interpolated chunk body — per-shift dots (the pre-residue-split
form, inlined here) vs the shipped residue-split body
(streams._chunk_body_interp), at preset-3 interpolated geometry
(M=147, L=320, 2L-wide lerp bank, qn=4).  Same-process interleaved."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from art_tpu.parallel.streams import _chunk_body_interp

HI = jax.lax.Precision.HIGHEST


def body_old(hist, x, P2, fracv, start, K, acc, M, L, nb, qn, hist_len):
    ch = x.shape[0]
    nbq = nb + qn
    xlen = nbq * M
    buf = jnp.concatenate([hist, x], axis=1)
    pad = jnp.zeros((ch, xlen), dtype=x.dtype)
    win = jax.lax.dynamic_slice(
        jnp.concatenate([buf, pad], axis=1), (jnp.int32(0), start),
        (ch, xlen))
    W2 = win.reshape(ch, nbq, M)
    P3 = P2.reshape(qn, M, 2 * L)
    dd = None
    for q in range(qn):
        part = jax.lax.dot_general(
            W2[:, q:q + nb], P3[q],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=x.dtype, precision=HI)
        dd = part if dd is None else dd + part
    f = fracv[None, None, :]
    out = (dd[:, :, :L] * (1.0 - f) + dd[:, :, L:] * f).reshape(ch, nb * L)
    valid = (jnp.arange(nb * L, dtype=jnp.int32) < K).astype(out.dtype)
    out = out * valid[None, :]
    acc = acc + jnp.sum(out * out)
    new_hist = jax.lax.dynamic_slice(
        buf, (0, buf.shape[1] - hist_len), (ch, hist_len))
    return new_hist, out, acc


def run_cfg(name, ch, M, L, qn, taps, nb, reps=6, inner=8):
    hist_len = taps * 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((ch, nb * M)).astype(np.float32))
    P2 = jnp.asarray(rng.standard_normal((qn * M, 2 * L))
                     .astype(np.float32) * 0.05)
    fracv = jnp.asarray(rng.random(L).astype(np.float32))
    hist0 = jnp.asarray(rng.standard_normal((ch, hist_len))
                        .astype(np.float32))
    start = jnp.int32(hist_len - taps // 2)
    K = jnp.int32(nb * L)

    stepA = jax.jit(lambda h, a: body_old(
        h, x, P2, fracv, start, K, a, M, L, nb, qn, hist_len))
    stepB = jax.jit(lambda h, a: _chunk_body_interp(
        h, x, P2, fracv, start, K, a, M, L, nb, qn, hist_len))

    hA, oA, aA = stepA(hist0, jnp.zeros((), jnp.float32))
    hB, oB, aB = stepB(hist0, jnp.zeros((), jnp.float32))
    md = float(jnp.max(jnp.abs(oA - oB)))
    sc = float(jnp.max(jnp.abs(oA))) or 1.0
    print(f"{name}: maxdiff {md:.3e} (rel {md/sc:.3e})", flush=True)

    def timed(step):
        h, a = hist0, jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(inner):
            h, o, a = step(h, a)
        _ = float(a)
        return time.perf_counter() - t0

    timed(stepA); timed(stepB)
    tsA, tsB = [], []
    for _ in range(reps):
        tsA.append(timed(stepA))
        tsB.append(timed(stepB))
    mA = sorted(tsA)[len(tsA) // 2]
    mB = sorted(tsB)[len(tsB) // 2]
    outs = nb * L * inner
    print(f"{name}: per-shift {outs/mA/1e6:.1f} M out/s  "
          f"residue-split {outs/mB/1e6:.1f} M out/s  "
          f"ratio {mA/mB:.3f}x", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    # preset-3 interpolated: 44.1k->96k, Lp=320, Mp=147, qn=4, taps=380
    run_cfg("p3i", 2, 147, 320, 4, 380, 14264)
    # preset-2 interpolated form: 96k->44.1k, Lp=147, Mp=320, qn=2, taps=156
    run_cfg("p2i", 2, 320, 147, 2, 156, 13108)
