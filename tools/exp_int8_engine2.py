"""int8-mode variant sweep INSIDE the faithful group context.

exp_int8_engine.py measured the shipped int8 engine step at 2.4x the
default (17.9 vs 7.5 ms/chunk, slow hour) while the isolated ablation
said 1.09-1.23x — its f32 baseline was inflated by an argument-layout
artifact (a [2, xlen] f32 argument window is padded and re-read per
anchor; the engine fuses window reads from the group buf).  This sweep
replicates the REAL _chunk_group_static structure (group buf concat +
static window slices + mask + acc) locally and swaps only the
contraction:

  f32      shipped default residue dots (baseline)
  ship     shipped ozaki_window_dots (flat planes + 3D K-concat dot)
  flat2d   digit planes as now, but dots flattened to 2D
           ([S*nr, 3KQ] @ [3KQ, 5N]) — tests the batched-3D-int8-dot
           lowering hypothesis
  sep3     2D + three separate per-digit dots (no K-concat), int32 adds
  dense3d  planes materialized in the [S, rows, M] dense 3D form + 2D
           dots (kills the [6, xlen] 32-sublane padding)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from art_tpu.core import flags as F
from art_tpu.parallel.pipeline import (OzakiPlan, _ds_round_once,
                                       _ozaki_digit_planes)
from art_tpu.parallel.streams import DeviceStreamResampler

HI = jax.lax.Precision.HIGHEST
IBL = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS | F.INCLUDE_LOWPASS
NDV, NW, SV = OzakiPlan.NDV, OzakiPlan.NW, OzakiPlan.SV


def main():
    G = 8
    chunk = 147 * 28533
    eng = DeviceStreamResampler(2, 380, 380, 44100, 48000, 0, IBL)
    eng.advance_position(190)
    key = jax.random.PRNGKey(0)
    xs_flat = jax.random.normal(key, (2, G * chunk), dtype=jnp.float32) \
        * 0.25
    eng.process(xs_flat[:, :chunk], chunk)
    G_, K0, start0, nb, P32, fracv, state0 = eng._flat_plan(xs_flat, chunk)
    eng.output_offset, eng.input_index = state0
    M, L, qn, hist_len = eng.M, eng.L, eng.qn, eng.num_samples
    nb_rs = -(-nb // qn) * qn
    nr = nb_rs // qn
    KQ = qn * M
    xlen = (nb_rs + qn) * M
    S = 2
    plan = OzakiPlan.from_device(P32, OzakiPlan.scale_for(
        max(float(np.abs(eng.bank).max()), 1.0)))
    Psd = [jax.lax.slice(plan.Pstack, (d * KQ, 0), ((d + 1) * KQ, NW * L))
           for d in range(NDV)]
    lim = (1 << (7 * NDV - 1)) - 1

    def epilogue(blk, t2):
        parts = [blk[..., w * L:(w + 1) * L].astype(jnp.float32)
                 * plan.wts[w] for w in range(NW)]
        return _ds_round_once(parts + [t2])

    # ---- contraction variants: win [S, xlen] -> [S, nb_rs, L]
    def c_f32(win):
        outs = []
        for r in range(qn):
            Vr = jax.lax.slice(win, (0, r * M), (S, r * M + nr * KQ)) \
                .reshape(S, nr, KQ)
            outs.append(jax.lax.dot_general(
                Vr, P32, (((2,), (0,)), ((), ())), precision=HI))
        return jnp.stack(outs, axis=2).reshape(S, nb_rs, L)

    def c_ship(win):
        from art_tpu.parallel.pipeline import ozaki_window_dots
        return ozaki_window_dots(win, plan, M=M, nb_rs=nb_rs, qn_pad=qn)

    def c_flat2d(win):
        planes, vr = _ozaki_digit_planes(win)
        outs = []
        for r in range(qn):
            Vd = [jax.lax.slice(planes, (d * S, r * M),
                                ((d + 1) * S, r * M + nr * KQ))
                  .reshape(S * nr, KQ) for d in range(NDV)]
            V8 = jnp.concatenate(Vd, axis=1)
            blk = jax.lax.dot_general(
                V8, plan.Pstack, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            Vr = jax.lax.slice(vr, (0, r * M), (S, r * M + nr * KQ)) \
                .reshape(S * nr, KQ)
            t2 = jax.lax.dot_general(
                Vr, plan.P32, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT)
            outs.append(epilogue(blk, t2).reshape(S, nr, L))
        return jnp.stack(outs, axis=2).reshape(S, nb_rs, L)

    def c_sep3(win):
        planes, vr = _ozaki_digit_planes(win)
        outs = []
        for r in range(qn):
            blk = None
            for d in range(NDV):
                Vd = jax.lax.slice(planes, (d * S, r * M),
                                   ((d + 1) * S, r * M + nr * KQ)) \
                    .reshape(S * nr, KQ)
                b = jax.lax.dot_general(
                    Vd, Psd[d], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                blk = b if blk is None else blk + b
            Vr = jax.lax.slice(vr, (0, r * M), (S, r * M + nr * KQ)) \
                .reshape(S * nr, KQ)
            t2 = jax.lax.dot_general(
                Vr, plan.P32, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT)
            outs.append(epilogue(blk, t2).reshape(S, nr, L))
        return jnp.stack(outs, axis=2).reshape(S, nb_rs, L)

    def c_dense3d(win):
        w3 = win.reshape(S, nb_rs + qn, M)
        vi = jnp.clip(jnp.rint(w3 * np.float32(2.0 ** SV)),
                      -lim, lim).astype(jnp.int32)
        digs, rem = [], vi
        for _ in range(NDV - 1):
            low = ((rem + 64) & 127) - 64
            digs.append(low)
            rem = (rem - low) >> 7
        digs.append(rem)
        digs = [d.astype(jnp.int8) for d in digs[::-1]]
        vr = w3 - vi.astype(jnp.float32) * np.float32(2.0 ** -SV)

        def view(p3, r):
            return jax.lax.slice(
                p3, (0, r, 0), (S, r + nr * qn, M)).reshape(S * nr, KQ)

        outs = []
        for r in range(qn):
            V8 = jnp.concatenate([view(d, r) for d in digs], axis=1)
            blk = jax.lax.dot_general(
                V8, plan.Pstack, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            t2 = jax.lax.dot_general(
                view(vr, r), plan.P32, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT)
            outs.append(epilogue(blk, t2).reshape(S, nr, L))
        return jnp.stack(outs, axis=2).reshape(S, nb_rs, L)

    variants = {"f32": c_f32, "ship": c_ship, "flat2d": c_flat2d,
                "sep3": c_sep3, "dense3d": c_dense3d}

    # ---- the faithful group step around each contraction
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

    groups = {n: make_group(c) for n, c in variants.items()}
    args = (eng.hist, xs_flat, jnp.zeros((), jnp.float32))
    for n, g in groups.items():
        try:
            comp = g.lower(*args).compile()
            ca = comp.cost_analysis()
            ba = ca.get('bytes accessed', 0) / 2 ** 30
            print(f"# {n:8s} bytes {ba:7.2f} GiB  "
                  f"flops {ca.get('flops', 0) / 1e9:8.1f} G")
            groups[n] = (comp, None)
        except Exception as e:
            print(f"# {n:8s} compile failed: {str(e)[:160]}")
            groups[n] = None
    groups = {n: v for n, v in groups.items() if v is not None}
    for n, (comp, _) in groups.items():
        h, acc = comp(*args)
        float(acc)
    reps = 5
    times = {n: [] for n in groups}
    for _ in range(reps):
        for n, (comp, _) in groups.items():
            t0 = time.perf_counter()
            h, acc = comp(*args)
            float(acc)
            times[n].append(time.perf_counter() - t0)
    t0m = sorted(times["f32"])[reps // 2]
    for n in groups:
        tm = sorted(times[n])[reps // 2]
        print(f"time {n:8s} {tm * 1e3 / G:7.2f} ms/chunk  vs_f32 "
              f"{tm / t0m:.3f}")


if __name__ == "__main__":
    main()
