"""Delivery-layout redesign A/B (same-process, on-chip).

exp_delivery2/3 established: any delivered form pays ~1.26-1.36x the
stats floor, and the time delta (~13 ms/group for 292 MB of f32 audio)
runs ~7x BELOW the 157 GB/s HBM stream anchor — the write is not
byte-bound, it is LAYOUT-bound.  Mechanism: the per-anchor dots emit
[ch, nr, L=160]; 160 lanes pad to 256 physically (1.6x), and the
reshape to the dense [ch, nb*L] delivery form is a physical relayout
(read padded + write dense), so the "output write" is really ~3-4
passes over the audio.

The fix candidate: the BANDED-wide contraction (shipped for f64/precise,
pipeline.residue_window_dots) emits [ch, nr, qn*L=640] — 640 = 5 exact
lane tiles, zero padding — and its row-major flattening IS the output
sample order (i = j*qn + r, sample l -> col r*L + l).  Delivering that
array UNSLICED (the valid K samples are a flat prefix; the <=0.01% tail
is documented garbage) removes every relayout: the only cost over stats
is the dot's own output write at logical bytes.

Variants (per G-chunk group, tuple outputs per chunk):
  stats            in-graph power accumulator (floor)
  out_tuple        per-anchor dots + slice-K tuple  (best of exp_delivery3)
  banded_blocked   banded dot, [ch, nr, 640] delivered unsliced
  banded_flat      banded dot + reshape + slice K   (relayout, no padding)
  pk_blocked       banded dot + fused quantize+pack, u16 [ch, nr, 640]
                   + clip count restricted to the valid prefix
  banded_stats     banded dot consumed in-graph (isolates the dot-cost
                   delta of banded vs per-anchor at f32)

Also asserts on-chip whether the banded f32 dot is BITWISE equal to the
per-anchor form (zeros accumulate as exact identity when the MXU's K
accumulation is order-preserving — known true for the f64 path).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from art_tpu.core import flags as F

IBL = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS | F.INCLUDE_LOWPASS


def main():
    from art_tpu.parallel.streams import (DeviceStreamResampler,
                                          _group_buf, _group_chunk_out,
                                          _floor_half_up_exact)

    G = 8
    chunk = 147 * 28533
    inner = 4
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    key = jax.random.PRNGKey(0)
    xs_flat = jax.random.normal(key, (2, G * chunk), dtype=jnp.float32) \
        * 0.25

    eng = DeviceStreamResampler(2, 380, 380, 44100, 48000, 0, IBL)
    eng.advance_position(190)
    eng.prewarm()
    eng.process(xs_flat[:, :chunk], chunk)
    G_, K, start, nb, P2, fracv, state0 = eng._flat_plan(xs_flat, chunk)
    M, L, qn, hist_len = eng.M, eng.L, eng.qn, eng.num_samples
    n = chunk
    nb_rs = -(-nb // qn) * qn
    nr = nb_rs // qn
    KQ = qn * M
    KW = KQ + (qn - 1) * M
    xlen = (nb_rs + qn) * M
    S = 2
    sc = jnp.float32(32768.0)
    hi, lo = 32767, -32768

    P = P2  # [qn*M, L] reduced-mode phase matrix
    L2 = P.shape[1]
    assert L2 == L
    Pb_host = np.zeros((KW, qn * L2), dtype=np.float32)
    for r in range(qn):
        Pb_host[r * M:r * M + KQ, r * L2:(r + 1) * L2] = np.asarray(P)
    Pb = jnp.asarray(Pb_host)

    def banded_dot(buf, g):
        off = g * n + start
        win = jax.lax.slice(buf, (0, off), (S, off + xlen))
        Va = jax.lax.slice(win, (0, 0), (S, nr * KQ)).reshape(S, nr, KQ)
        Vb = jax.lax.slice(win, (0, KQ), (S, KQ + nr * KQ)) \
            .reshape(S, nr, KQ)[:, :, :KW - KQ]
        V = jnp.concatenate([Va, Vb], axis=2)
        return jax.lax.dot_general(
            V, Pb, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)        # [S, nr, 640]

    def f_stats(hist, xs, acc):
        buf, nh = _group_buf(hist, xs, start, xlen, G, n, hist_len)
        for g in range(G):
            o = _group_chunk_out(buf, P2, fracv, g, start=start, K=K,
                                 n=n, M=M, L=L, nb=nb, qn=qn)
            acc = acc + jnp.sum(o * o)
        return nh, acc

    def f_banded_stats(hist, xs, acc):
        buf, nh = _group_buf(hist, xs, start, xlen, G, n, hist_len)
        valid = (jnp.arange(nr * qn * L2, dtype=jnp.int32) < K) \
            .astype(jnp.float32)
        for g in range(G):
            d = banded_dot(buf, g).reshape(S, nr * qn * L2) * valid
            acc = acc + jnp.sum(d * d)
        return nh, acc

    def f_out_tuple(hist, xs):
        buf, nh = _group_buf(hist, xs, start, xlen, G, n, hist_len)
        outs = tuple(_group_chunk_out(buf, P2, fracv, g, start=start,
                                      K=K, n=n, M=M, L=L, nb=nb, qn=qn)
                     for g in range(G))
        return outs, nh

    def f_banded_blocked(hist, xs):
        buf, nh = _group_buf(hist, xs, start, xlen, G, n, hist_len)
        return tuple(banded_dot(buf, g) for g in range(G)), nh

    def f_banded_flat(hist, xs):
        buf, nh = _group_buf(hist, xs, start, xlen, G, n, hist_len)
        outs = tuple(jax.lax.slice(
            banded_dot(buf, g).reshape(S, nr * qn * L2), (0, 0), (S, K))
            for g in range(G))
        return outs, nh

    def f_pk_blocked(hist, xs, clips):
        buf, nh = _group_buf(hist, xs, start, xlen, G, n, hist_len)
        validc = (jnp.arange(nr * qn * L2, dtype=jnp.int32) < K) \
            .reshape(nr, qn * L2)[None]
        packs = []
        for g in range(G):
            d = banded_dot(buf, g)
            code = d * sc                       # pow2 scaler: exact
            ov = _floor_half_up_exact(code)
            clips = clips + jnp.sum(((ov > hi) | (ov < lo)) & validc,
                                    dtype=jnp.int32)
            v = jnp.clip(ov, lo, hi).astype(jnp.uint32) & jnp.uint32(0xFFFF)
            packs.append(v.astype(jnp.uint16))
        return tuple(packs), clips, nh

    hist0 = eng.hist
    acc0 = jnp.zeros((), jnp.float32)
    cl0 = jnp.zeros((), jnp.int32)
    fns = {
        "stats": (jax.jit(f_stats), (hist0, xs_flat, acc0)),
        "banded_stats": (jax.jit(f_banded_stats), (hist0, xs_flat, acc0)),
        "out_tuple": (jax.jit(f_out_tuple), (hist0, xs_flat)),
        "banded_blocked": (jax.jit(f_banded_blocked), (hist0, xs_flat)),
        "banded_flat": (jax.jit(f_banded_flat), (hist0, xs_flat)),
        "pk_blocked": (jax.jit(f_pk_blocked), (hist0, xs_flat, cl0)),
    }
    comps = {}
    for name, (fn, args) in fns.items():
        comp = fn.lower(*args).compile()
        ca = comp.cost_analysis()
        print(f"# {name:15s} bytes {ca.get('bytes accessed', 0) / 2**30:7.2f}"
              f" GiB", flush=True)
        comps[name] = (comp, args)

    # bitwise: banded f32 vs per-anchor (valid prefix)
    o_ref = np.asarray(comps["out_tuple"][0](hist0, xs_flat)[0][0])
    o_band = np.asarray(comps["banded_flat"][0](hist0, xs_flat)[0][0])
    same = np.array_equal(o_ref, o_band)
    md = np.max(np.abs(o_ref.astype(np.float64) - o_band)) if not same \
        else 0.0
    print(f"# banded f32 bitwise == per-anchor: {same} (maxdiff {md:g})")

    def sync(name, res):
        if "stats" in name:
            float(res[1])
        elif name == "pk_blocked":
            int(res[1])
        else:
            np.asarray(jax.device_get(res[0][-1].ravel()[-1:]))

    def run(name, ngroups):
        comp, args = comps[name]
        res = None
        for _ in range(ngroups):
            res = comp(*args)
        sync(name, res)

    for name in comps:
        run(name, 1)
    times = {n_: [] for n_ in comps}
    for _ in range(reps):
        for name in comps:
            t0 = time.perf_counter()
            run(name, inner)
            times[name].append(time.perf_counter() - t0)
    tm0 = sorted(times["stats"])[reps // 2]
    frames = inner * G * K
    for name in comps:
        tm = sorted(times[name])[reps // 2]
        print(f"time {name:15s} {tm:7.3f} s  {frames / tm / 1e6:7.1f} "
              f"Mframes/s  vs_stats {tm / tm0:.3f}")


if __name__ == "__main__":
    main()
