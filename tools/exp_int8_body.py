"""Why the int8 (Ozaki) mode lost 2.6x inside the real chunk body when
the isolated probe said 1.15x (tools/exp_ozaki.py vs exp_int8_ship.py).

Suspects, in the order of the CLAUDE.md layout-trap playbook:
  1. the digit planes materialize as [3*S, xlen] int8 = [6, xlen]:
     int8 tiling is (32, 128) sublanes x lanes, so 6 rows pad 5.3x —
     and vr as [S, xlen] f32 pads 4x;
  2. the per-anchor K-concat of 3 strided plane views materializes
     [S, nr, 3KQ] int8 per anchor (4x ~25 MB);
  3. batched-3D int8 dots [2, nr, 3KQ] @ [3KQ, 5N] may lower worse than
     the probe's flat [R, 3K] form.

Variants (same epilogue, same-process, scan-of-8 anchors, plus XLA
cost_analysis bytes-accessed — the diagnostic that caught the round-4
[n, 6] f64 trap):
  f32     the shipped default body dot (baseline)
  ship    current ozaki_window_dots (flat [6, xlen] planes + K-concat)
  ３d      planes materialized in [S, rows, M] 3D form (lane dim M pads
          147->256 but sublanes are dense); anchor operand = pure row
          slice + reshape; K-concat per anchor
  3d3     3D planes + 3 separate int8 dots per anchor (no concat),
          int32 adds fused in the epilogue
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


def make_variants(eng, nb):
    M, L, qn = eng.M, eng.L, eng.qn
    S = 2
    nb_rs = -(-nb // qn) * qn
    nr = nb_rs // qn
    KQ = qn * M
    xlen = (nb_rs + qn) * M
    P32 = eng._mats[0] if eng._mats else eng._matrix(0)
    if isinstance(P32, OzakiPlan):
        plan = P32
        P32 = plan.P32
    else:
        plan = OzakiPlan.from_device(P32, OzakiPlan.scale_for(
            max(float(np.abs(eng.bank).max()), 1.0)))
    sv = OzakiPlan.SV
    lim = (1 << (7 * OzakiPlan.NDV - 1)) - 1
    NW = OzakiPlan.NW

    def digits_of(vi):
        digs, rem = [], vi
        for _ in range(OzakiPlan.NDV - 1):
            low = ((rem + 64) & 127) - 64
            digs.append(low)
            rem = (rem - low) >> 7
        digs.append(rem)
        return digs[::-1]

    def epilogue(blk, t2):
        parts = [blk[..., w * L:(w + 1) * L].astype(jnp.float32)
                 * plan.wts[w] for w in range(NW)]
        return _ds_round_once(parts + [t2])

    def f32(win):
        outs = []
        for r in range(qn):
            Vr = jax.lax.slice(win, (0, r * M), (S, r * M + nr * KQ)) \
                .reshape(S, nr, KQ)
            outs.append(jax.lax.dot_general(
                Vr, P32, (((2,), (0,)), ((), ())), precision=HI))
        return jnp.stack(outs, axis=2)

    def ship(win):
        from art_tpu.parallel.pipeline import ozaki_window_dots
        return ozaki_window_dots(win, plan, M=M, nb_rs=nb_rs, qn_pad=qn)

    def planes3d(win):
        w3 = win.reshape(S, nb_rs + qn, M)
        vi = jnp.clip(jnp.rint(w3 * np.float32(2.0 ** sv)),
                      -lim, lim).astype(jnp.int32)
        digs = [d.astype(jnp.int8) for d in digits_of(vi)]
        vr = w3 - vi.astype(jnp.float32) * np.float32(2.0 ** -sv)
        return digs, vr

    def view(p3, r):
        return jax.lax.slice(
            p3, (0, r, 0), (S, r + nr * qn, M)).reshape(S, nr, KQ)

    def v3d(win):
        digs, vr = planes3d(win)
        outs = []
        for r in range(qn):
            V8 = jnp.concatenate([view(d, r) for d in digs], axis=2)
            blk = jax.lax.dot_general(
                V8, plan.Pstack, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            t2 = jax.lax.dot_general(
                view(vr, r), P32, (((2,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT)
            outs.append(epilogue(blk, t2))
        return jnp.stack(outs, axis=2)

    def v3d3(win):
        digs, vr = planes3d(win)
        Psd = [jax.lax.slice(plan.Pstack, (d * KQ, 0),
                             ((d + 1) * KQ, NW * L))
               for d in range(OzakiPlan.NDV)]
        outs = []
        for r in range(qn):
            blk = None
            for d in range(OzakiPlan.NDV):
                b = jax.lax.dot_general(
                    view(digs[d], r), Psd[d], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                blk = b if blk is None else blk + b
            t2 = jax.lax.dot_general(
                view(vr, r), P32, (((2,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT)
            outs.append(epilogue(blk, t2))
        return jnp.stack(outs, axis=2)

    return {"f32": f32, "ship": ship, "3d": v3d, "3d3": v3d3}, xlen


def main():
    eng = DeviceStreamResampler(2, 380, 380, 44100, 48000, 0, IBL)
    nb = 7132                      # quarter-bench chunk class
    variants, xlen = make_variants(eng, nb)
    rng = np.random.default_rng(0)
    win = jnp.asarray((rng.standard_normal((2, xlen)) * 0.25)
                      .astype(np.float32))

    def make_anchor(fn):
        @jax.jit
        def anchor(v):
            def body(c, _):
                out = fn(v + c * jnp.float32(1e-30))
                return c + jnp.sum(out * out) * jnp.float32(1e-30), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=8)
            return c
        return anchor

    anchors = {n: make_anchor(fn) for n, fn in variants.items()}
    for n, a in anchors.items():
        try:
            comp = a.lower(win).compile()
            ca = comp.cost_analysis()
            ba = ca.get("bytes accessed", float("nan"))
            print(f"# {n:5s} bytes accessed {ba / 2 ** 30:8.2f} GiB "
                  f"(8 iters)")
        except Exception as e:
            print(f"# {n:5s} cost_analysis failed: {str(e)[:120]}")
        float(a(win))
    reps = 3
    times = {n: [] for n in anchors}
    for _ in range(reps):
        for n, a in anchors.items():
            t0 = time.perf_counter()
            float(a(win))
            times[n].append(time.perf_counter() - t0)
    t0m = sorted(times["f32"])[reps // 2]
    for n in anchors:
        tm = sorted(times[n])[reps // 2]
        print(f"cost {n:5s} {tm * 1e3 / 8:7.3f} ms/iter  vs_f32 "
              f"{tm / t0m:.3f}")


if __name__ == "__main__":
    main()
