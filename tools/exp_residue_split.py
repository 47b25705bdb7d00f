"""A/B: fixed-ratio chunk step — per-shift dots (qn dots of K=M) vs
residue-split dots (qn dots of K=qn*M over nb/qn rows, pure reshapes).

Motivation: MXU cost steps at ceil(K/256).  Preset 1 has M=44 (83% of the
K dimension is padding waste per dot); splitting output blocks by residue
i mod qn makes each window row a CONTIGUOUS qn*M slice of the input
buffer, so the whole contraction runs as qn dots of K=qn*M on
reshape-of-slice views — identical FLOPs and identical element reads, but
1/qn the K-padding waste when qn*M <= 256 (p1: K=132 in one pass vs 3
passes' worth of padded dots).

Same-process interleaved comparison (CLAUDE.md discipline), device-
resident chaining, one scalar fetch per timed batch.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from art_tpu.parallel.streams import _chunk_body

HI = jax.lax.Precision.HIGHEST


def _chunk_body_rs(hist, x, P, start, K, acc, M, L, nb, qn, hist_len):
    """Residue-split variant: nb must be a multiple of qn."""
    ch = x.shape[0]
    nbq = nb + qn
    xlen = nbq * M
    buf = jnp.concatenate([hist, x], axis=1)
    pad = jnp.zeros((ch, xlen), dtype=x.dtype)
    win = jax.lax.dynamic_slice(
        jnp.concatenate([buf, pad], axis=1), (jnp.int32(0), start),
        (ch, xlen))
    nr = nb // qn
    KQ = qn * M
    outs = []
    for r in range(qn):
        Vr = jax.lax.slice(win, (0, r * M), (ch, (nb + r) * M)) \
            .reshape(ch, nr, KQ)
        outs.append(jax.lax.dot_general(
            Vr, P, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=x.dtype, precision=HI))
    out = jnp.stack(outs, axis=2).reshape(ch, nb * L)
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
    P = jnp.asarray(rng.standard_normal((qn * M, L)).astype(np.float32)
                    * 0.05)
    hist0 = jnp.asarray(rng.standard_normal((ch, hist_len))
                        .astype(np.float32))
    start = jnp.int32(hist_len - taps // 2)
    K = jnp.int32(nb * L)

    stepA = jax.jit(lambda h, a: _chunk_body(
        h, x, P, start, K, a, M, L, nb, qn, hist_len))
    stepB = jax.jit(lambda h, a: _chunk_body_rs(
        h, x, P, start, K, a, M, L, nb, qn, hist_len))

    # correctness: one call each, compare outputs at the f32 matmul floor
    hA, oA, aA = stepA(hist0, jnp.zeros((), jnp.float32))
    hB, oB, aB = stepB(hist0, jnp.zeros((), jnp.float32))
    md = float(jnp.max(jnp.abs(oA - oB)))
    sc = float(jnp.max(jnp.abs(oA))) or 1.0
    print(f"{name}: maxdiff {md:.3e} (rel {md/sc:.3e}), hist equal "
          f"{bool(jnp.array_equal(hA, hB))}", flush=True)

    def timed(step):
        h, a = hist0, jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(inner):
            h, o, a = step(h, a)
        _ = float(a)          # tunnel-safe sync
        return time.perf_counter() - t0

    timed(stepA); timed(stepB)   # warm
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
    # p1: preset-1 mono 44.1->48 (M=44, L=48, qn=3, taps=48)
    run_cfg("p1", 1, 44, 48, 3, 48, 95325 // 3 * 3)
    # p3: preset-3 stereo 44.1->96 (M=147, L=320, qn=4, taps=380)
    run_cfg("p3", 2, 147, 320, 4, 380, 28532)
    # p2: preset-2 stereo 96->44.1 reduced (M=320, L=147, qn=2, taps=156)
    run_cfg("p2", 2, 320, 147, 2, 156, 13108)
