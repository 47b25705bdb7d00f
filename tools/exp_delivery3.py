"""Packed-delivery fix candidates (same-process, on-chip).

exp_delivery2 findings: clip-count reduction ~free; u16 write does NOT
beat the f32 write; packed pays f32-materialize + u16-write (bytes
20.5 vs out 17.6 vs stats 13.1 GiB).  Suspects: (1) the quantizer
multiply routes through EMULATED f64 + reduce_precision (_mul_for) —
dozens of pointwise ops and a fusion barrier; (2) the concat root
materializes its operands.

For a power-of-two scaler (gain 1.0: scaler = 2^(bits-1) always), a
plain f32 multiply is BIT-IDENTICAL to the f64-route-and-round (the
product is exact — exponent shift), so (1) can be removed with no
parity cost on the delivery configuration.

Variants:
  stats       floor reference
  out         f32 concat delivered (byte-cost reference)
  packed      shipped epilogue (f64-mul + barrier + concat)
  pk_f32mul   plain f32 multiply, same concat root
  pk_tuple    f32 multiply + per-chunk u16 outputs (NO concat — the
              reference hands one buffer per process() call anyway)
  out_tuple   f32 audio per-chunk outputs (concat-cost control)
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
    from art_tpu.ops.decimate_device import _mul_for

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
    xlen = (nb_rs + qn) * M
    mul = _mul_for(xs_flat.dtype)
    sc = jnp.float32(32768.0)
    hi, lo = 32767, -32768

    def outs_of(buf):
        return [_group_chunk_out(buf, P2, fracv, g, start=start, K=K,
                                 n=n, M=M, L=L, nb=nb, qn=qn)
                for g in range(G)]

    def quant(o, f64):
        code = mul(o, sc) if f64 else o * sc
        ov = _floor_half_up_exact(code)
        cn = jnp.sum((ov > hi) | (ov < lo), dtype=jnp.int32)
        v = jnp.clip(ov, lo, hi).astype(jnp.uint32) & jnp.uint32(0xFFFF)
        return v.astype(jnp.uint16), cn

    def f_stats(hist, xs, acc):
        buf, nh = _group_buf(hist, xs, start, xlen, G, n, hist_len)
        for o in outs_of(buf):
            acc = acc + jnp.sum(o * o)
        return nh, acc

    def f_out(hist, xs):
        buf, nh = _group_buf(hist, xs, start, xlen, G, n, hist_len)
        return jnp.concatenate(outs_of(buf), axis=1), nh

    def f_out_tuple(hist, xs):
        buf, nh = _group_buf(hist, xs, start, xlen, G, n, hist_len)
        return tuple(outs_of(buf)), nh

    def mk_packed(f64, concat):
        def f(hist, xs, clips):
            buf, nh = _group_buf(hist, xs, start, xlen, G, n, hist_len)
            packs = []
            for o in outs_of(buf):
                v, cn = quant(o, f64)
                clips = clips + cn
                packs.append(v)
            if concat:
                return jnp.concatenate(packs, axis=1), clips, nh
            return tuple(packs), clips, nh
        return f

    hist0 = eng.hist
    acc0 = jnp.zeros((), jnp.float32)
    cl0 = jnp.zeros((), jnp.int32)
    fns = {
        "stats": (jax.jit(f_stats), (hist0, xs_flat, acc0)),
        "out": (jax.jit(f_out), (hist0, xs_flat)),
        "packed": (jax.jit(mk_packed(True, True)), (hist0, xs_flat, cl0)),
        "pk_f32mul": (jax.jit(mk_packed(False, True)),
                      (hist0, xs_flat, cl0)),
        "pk_tuple": (jax.jit(mk_packed(False, False)),
                     (hist0, xs_flat, cl0)),
        "out_tuple": (jax.jit(f_out_tuple), (hist0, xs_flat)),
    }
    comps = {}
    for name, (fn, args) in fns.items():
        comp = fn.lower(*args).compile()
        ca = comp.cost_analysis()
        print(f"# {name:10s} bytes {ca.get('bytes accessed', 0) / 2**30:7.2f}"
              f" GiB", flush=True)
        comps[name] = (comp, args)

    # bitwise check: pk_f32mul / pk_tuple == shipped packed epilogue
    pref = comps["packed"][0](*comps["packed"][1])
    pf32 = comps["pk_f32mul"][0](*comps["pk_f32mul"][1])
    ptup = comps["pk_tuple"][0](*comps["pk_tuple"][1])
    same_f32 = bool(jnp.array_equal(pref[0], pf32[0])) and \
        int(pref[1]) == int(pf32[1])
    tup_cat = jnp.concatenate(ptup[0], axis=1)
    same_tup = bool(jnp.array_equal(pref[0], tup_cat)) and \
        int(pref[1]) == int(ptup[1])
    print(f"# bitwise: f32mul=={same_f32} tuple=={same_tup}", flush=True)

    def sync(name, res):
        if name == "stats":
            float(res[1])
        elif name == "out":
            float(np.asarray(res[0][0, -1:])[0])
        elif name == "out_tuple":
            float(np.asarray(res[0][-1][0, -1:])[0])
        else:
            int(res[1])

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
        print(f"time {name:10s} {tm:7.3f} s  {frames / tm / 1e6:7.1f} "
              f"Mframes/s  vs_stats {tm / tm0:.3f}")


if __name__ == "__main__":
    main()
