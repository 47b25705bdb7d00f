"""Banded-wide int8 (Ozaki) contraction A/B (same-process, on-chip).

The banded-wide f32 contraction (one [S, nr, KW] operand pass, 100%
lane fill) measured 0.677x the per-anchor stats time and is now the
shipped default (tools/exp_delivery4.py).  The int8 fixed-point
headline mode still runs per-anchor dense3d dots (4 operand passes of
3 digit planes; NW*L2 = 800 cols pads to 896 lanes).  This measures
the banded analog:

  V3   [S, nr, NDV*KW] int8  (3 digit planes of the KW-wide window,
       each the same concat-of-two-reshape-views trick as f32 banded)
  Pb   [NDV*KW, qn*NW*L2] int8: digit i, anchor r, weight w block at
       rows i*KW + r*M .. +KQ, cols (r*NW + w)*L2 (zeros elsewhere)
  ONE int8 dot -> int32 [S, nr, qn*NW*L2 = 3200 = 25 exact lane tiles]
  residual: banded f32 dot (DEFAULT precision) [KW, qn*L2]
  epilogue per anchor block -> [S, nr, qn*L2] flat = output order

Exactness: int32 accumulation is order-independent and the structural
zeros contribute exact zeros, so the digit blocks are BITWISE equal to
the per-anchor form (asserted below); only the f32 residual dot
reassociates (its noise enters at ~2^-40 absolute — same class).
Overflow bound unchanged: per column block sum_i KQ terms |d| <= 64
-> < 3*KQ*64^2 < 2^24.

Flops: 1.75x structural zeros on the int8 dot (KW/KQ = (2qn-1)/qn) —
the question is whether one operand pass + exact lane fill beats that.

Variants (faithful _chunk_group_static context, stats form):
  f32b     shipped banded f32 (floor reference)
  ship     shipped per-anchor ozaki_window_dots (current headline body)
  banded   banded int8 as above
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from art_tpu.core import flags as F
from art_tpu.parallel.pipeline import OzakiPlan, _ds_round_once
from art_tpu.parallel.streams import DeviceStreamResampler

HI = jax.lax.Precision.HIGHEST
IBL = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS | F.INCLUDE_LOWPASS
NDV, NDP, NW, SV = (OzakiPlan.NDV, OzakiPlan.NDP, OzakiPlan.NW,
                    OzakiPlan.SV)


def main():
    G = 8
    chunk = 147 * 28533
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    eng = DeviceStreamResampler(2, 380, 380, 44100, 48000, 0, IBL)
    eng.advance_position(190)
    key = jax.random.PRNGKey(0)
    xs_flat = jax.random.normal(key, (2, G * chunk), dtype=jnp.float32) \
        * 0.25
    eng.process(xs_flat[:, :chunk], chunk)
    G_, K0, start0, nb, P32, fracv, state0 = eng._flat_plan(xs_flat, chunk)
    M, L, qn, hist_len = eng.M, eng.L, eng.qn, eng.num_samples
    nb_rs = -(-nb // qn) * qn
    nr = nb_rs // qn
    KQ = qn * M
    KW = KQ + (qn - 1) * M
    xlen = (nb_rs + qn) * M
    S = 2
    sp = OzakiPlan.scale_for(max(float(np.abs(eng.bank).max()), 1.0))
    plan = OzakiPlan.from_device(P32, sp)
    lim = (1 << (7 * NDV - 1)) - 1

    # ---- banded operands (one-time, off the hot path) ----
    # per-digit P planes (exact f64 split, as OzakiPlan.from_device)
    pi = jnp.rint(P32.astype(jnp.float64) * 2.0 ** sp)
    eds, rem = [], pi
    for _ in range(NDP - 1):
        low = jnp.mod(rem + 64.0, 128.0) - 64.0
        eds.append(low)
        rem = (rem - low) * (1.0 / 128.0)
    eds.append(rem)
    eds = [e.astype(jnp.int32).astype(jnp.int8) for e in eds[::-1]]
    Pb8 = jnp.zeros((NDV * KW, qn * NW * L), jnp.int8)
    for i in range(NDV):
        for r in range(qn):
            for w in range(NW):
                j = w - i
                if 0 <= j < NDP:
                    Pb8 = jax.lax.dynamic_update_slice(
                        Pb8, eds[j], (i * KW + r * M, (r * NW + w) * L))
    Pb32 = jnp.zeros((KW, qn * L), jnp.float32)
    for r in range(qn):
        Pb32 = jax.lax.dynamic_update_slice(Pb32, P32, (r * M, r * L))
    Pb8, Pb32 = jax.device_put(Pb8), jax.device_put(Pb32)

    # ---- contraction variants: win [S, xlen] -> [S, nb_rs, L] ----
    def c_f32b(win):
        Va = jax.lax.slice(win, (0, 0), (S, nr * KQ)).reshape(S, nr, KQ)
        Vb = jax.lax.slice(win, (0, KQ), (S, KQ + nr * KQ)) \
            .reshape(S, nr, KQ)[:, :, :KW - KQ]
        V = jnp.concatenate([Va, Vb], axis=2)
        Pb = jnp.zeros((KW, qn * L), dtype=P32.dtype)
        for r in range(qn):
            Pb = jax.lax.dynamic_update_slice(Pb, P32, (r * M, r * L))
        d = jax.lax.dot_general(V, Pb, (((2,), (0,)), ((), ())),
                                precision=HI)
        return d.reshape(S, nb_rs, L)

    def c_ship(win):
        from art_tpu.parallel.pipeline import ozaki_window_dots
        return ozaki_window_dots(win, plan, M=M, nb_rs=nb_rs, qn_pad=qn)

    def c_banded(win):
        # digit split on the full window (dense 1D — the banded views
        # below are reshape-of-slice, so no 3D materialization needed)
        vi = jnp.clip(jnp.rint(win * np.float32(2.0 ** SV)),
                      -lim, lim).astype(jnp.int32)
        digs, rem = [], vi
        for _ in range(NDV - 1):
            low = ((rem + 64) & 127) - 64
            digs.append(low)
            rem = (rem - low) >> 7
        digs.append(rem)
        digs = [d.astype(jnp.int8) for d in digs[::-1]]
        vr = win - vi.astype(jnp.float32) * np.float32(2.0 ** -SV)

        def banded_view(p):
            Va = jax.lax.slice(p, (0, 0), (S, nr * KQ)).reshape(S, nr, KQ)
            Vb = jax.lax.slice(p, (0, KQ), (S, KQ + nr * KQ)) \
                .reshape(S, nr, KQ)[:, :, :KW - KQ]
            return jnp.concatenate([Va, Vb], axis=2)   # [S, nr, KW]

        V3 = jnp.concatenate([banded_view(d) for d in digs], axis=2)
        blk = jax.lax.dot_general(V3, Pb8, (((2,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        t2 = jax.lax.dot_general(banded_view(vr), Pb32,
                                 (((2,), (0,)), ((), ())),
                                 precision=jax.lax.Precision.DEFAULT)
        outs = []
        for r in range(qn):
            parts = [blk[..., (r * NW + w) * L:(r * NW + w + 1) * L]
                     .astype(jnp.float32) * plan.wts[w] for w in range(NW)]
            outs.append(_ds_round_once(
                parts + [t2[..., r * L:(r + 1) * L]]))
        # col block r = anchor r: concat gives the flat output order
        return jnp.concatenate(outs, axis=2).reshape(S, nb_rs, L)

    variants = {"f32b": c_f32b, "ship": c_ship, "banded": c_banded}

    # ---- value check (small jit, one window) ----
    win0 = jax.lax.slice(
        jnp.concatenate([eng.hist, xs_flat,
                         jnp.zeros((S, xlen), jnp.float32)], axis=1),
        (0, int(start0)), (S, int(start0) + xlen))
    ref = np.asarray(jax.jit(c_ship)(win0))
    got = np.asarray(jax.jit(c_banded)(win0))
    d = np.abs(ref - got)
    print(f"# banded vs ship per-anchor: max|d| {d.max():.3e} "
          f"(bitwise {'YES' if d.max() == 0 else 'no — residual-dot '
          'reassociation only'})")
    f64 = np.asarray(jax.jit(lambda w: jax.lax.dot_general(
        jax.lax.slice(w, (0, 0), (S, nr * KQ)).reshape(S, nr, KQ)
        .astype(jnp.float64), P32.astype(jnp.float64),
        (((2,), (0,)), ((), ())), precision=HI))(win0))
    # compare anchor-0 block only (cheap truth)
    print(f"# vs f64 truth (anchor 0): ship "
          f"{np.abs(ref[:, 0::qn] - f64).max():.3e}  banded "
          f"{np.abs(got[:, 0::qn] - f64).max():.3e}")

    # ---- faithful group step ----
    def make_group(contract):
        @jax.jit
        def group(hist, xs, acc):
            tail = (G - 1) * chunk + int(start0) + xlen \
                - (hist_len + G * chunk)
            parts = [hist, xs]
            if tail > 0:
                parts.append(jnp.zeros((S, tail), dtype=xs.dtype))
            buf = jnp.concatenate(parts, axis=1)
            valid = (jnp.arange(nb * L, dtype=jnp.int32) < int(K0))
            for g in range(G):
                off = g * chunk + int(start0)
                win = jax.lax.slice(buf, (0, off), (S, off + xlen))
                out = contract(win)
                out = jax.lax.slice(out, (0, 0, 0), (S, nb, L)) \
                    .reshape(S, nb * L)
                out = out * valid.astype(out.dtype)[None, :]
                acc = acc + jnp.sum(out * out)
            new_hist = jax.lax.slice(buf, (0, G * chunk),
                                     (S, hist_len + G * chunk))
            return new_hist, acc
        return group

    groups = {}
    args = (eng.hist, xs_flat, jnp.zeros((), jnp.float32))
    for n, c in variants.items():
        try:
            comp = make_group(c).lower(*args).compile()
            ca = comp.cost_analysis()
            print(f"# {n:7s} bytes {ca.get('bytes accessed', 0) / 2**30:7.2f}"
                  f" GiB  flops {ca.get('flops', 0) / 1e9:8.1f} G")
            groups[n] = comp
        except Exception as e:
            print(f"# {n:7s} compile failed: {str(e)[:200]}")
    for n, comp in groups.items():
        h, acc = comp(*args)
        float(acc)
    times = {n: [] for n in groups}
    for _ in range(reps):
        for n, comp in groups.items():
            t0 = time.perf_counter()
            h, acc = comp(*args)
            float(acc)
            times[n].append(time.perf_counter() - t0)
    t0m = sorted(times["f32b"])[reps // 2]
    for n in groups:
        tm = sorted(times[n])[reps // 2]
        print(f"time {n:7s} {tm * 1e3 / G:7.2f} ms/chunk  vs_f32b "
              f"{tm / t0m:.3f}  {G * chunk / (48000/44100) * 0 + 0:.0f}")
    # output frames/s for reference
    for n in groups:
        tm = sorted(times[n])[reps // 2]
        fr = G * int(K0) / 2  # K0 is per-stream samples? keep simple:
        print(f"rate {n:7s} {G * int(K0) / tm / 1e6:7.1f} Mframes/s")


if __name__ == "__main__":
    main()
