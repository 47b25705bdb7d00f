"""Packed-delivery epilogue decomposition (same-process, on-chip).

exp_delivery.py measured (836.9-hour): stats 1.000, f32-out 1.283,
packed-u16 1.354 — the packed form writes HALF the bytes of f32-out yet
costs MORE.  Hypothesis: the clip-count reduction is a SECOND consumer
of the quantize chain, splitting the output fusion so the f32 dot
output (or the quantized intermediate) materializes/re-reads at full
size (~292 MB/group) — the packed write itself should only cost
~146 MB ≈ +4.7 ms/group over stats.

Variants (all bitwise-identical packed bytes):
  stats      in-graph power accumulator (floor reference)
  out        f32 audio materialized (byte-cost reference)
  packed     shipped: quantize + clip-count sum + u16 write
  pk_noclip  quantize + u16 write, clip count DROPPED (sync = last
             packed sample) — isolates the clip reduction's cost
  pk_block   clip count as a [ch, G] per-chunk partial (second fusion
             output at tiny size), summed in the same jit — tests
             whether reduction SHAPE (scalar vs row) splits the fusion
  pk_fold    clip indicator summed via the same dtype/layout as the
             packed value (u16 popcount-style add) — fusion-friendliness
             probe

Prints compiled bytes-accessed per variant (the 54-GB-class diagnostic,
CLAUDE.md) and interleaved timings.
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

    def quant(out):
        code = mul(out, sc)
        ov = _floor_half_up_exact(code)
        clip_n = jnp.sum((ov > hi) | (ov < lo), dtype=jnp.int32)
        v = jnp.clip(ov, lo, hi).astype(jnp.uint32) & jnp.uint32(0xFFFF)
        return v.astype(jnp.uint16), clip_n

    def f_stats(hist, xs, acc):
        buf, nh = _group_buf(hist, xs, start, xlen, G, n, hist_len)
        for o in outs_of(buf):
            acc = acc + jnp.sum(o * o)
        return nh, acc

    def f_out(hist, xs):
        buf, nh = _group_buf(hist, xs, start, xlen, G, n, hist_len)
        return jnp.concatenate(outs_of(buf), axis=1), nh

    def f_packed(hist, xs, clips):
        buf, nh = _group_buf(hist, xs, start, xlen, G, n, hist_len)
        packs = []
        for o in outs_of(buf):
            v, cn = quant(o)
            clips = clips + cn
            packs.append(v)
        return jnp.concatenate(packs, axis=1), clips, nh

    def f_pk_noclip(hist, xs):
        buf, nh = _group_buf(hist, xs, start, xlen, G, n, hist_len)
        packs = []
        for o in outs_of(buf):
            code = mul(o, sc)
            ov = _floor_half_up_exact(code)
            v = jnp.clip(ov, lo, hi).astype(jnp.uint32) & jnp.uint32(0xFFFF)
            packs.append(v.astype(jnp.uint16))
        return jnp.concatenate(packs, axis=1), nh

    def f_pk_block(hist, xs, clips):
        buf, nh = _group_buf(hist, xs, start, xlen, G, n, hist_len)
        packs, parts = [], []
        for o in outs_of(buf):
            code = mul(o, sc)
            ov = _floor_half_up_exact(code)
            parts.append(jnp.sum((ov > hi) | (ov < lo), axis=1,
                                 dtype=jnp.int32))        # [ch] per chunk
            v = jnp.clip(ov, lo, hi).astype(jnp.uint32) & jnp.uint32(0xFFFF)
            packs.append(v.astype(jnp.uint16))
        clips = clips + jnp.sum(jnp.stack(parts))
        return jnp.concatenate(packs, axis=1), clips, nh

    def f_pk_fold(hist, xs, clips):
        buf, nh = _group_buf(hist, xs, start, xlen, G, n, hist_len)
        packs = []
        for o in outs_of(buf):
            code = mul(o, sc)
            ov = _floor_half_up_exact(code)
            flag = ((ov > hi) | (ov < lo)).astype(jnp.int32)
            v = jnp.clip(ov, lo, hi).astype(jnp.uint32) & jnp.uint32(0xFFFF)
            packs.append(v.astype(jnp.uint16))
            clips = clips + jnp.sum(flag)
        return jnp.concatenate(packs, axis=1), clips, nh

    hist0 = eng.hist
    acc0 = jnp.zeros((), jnp.float32)
    cl0 = jnp.zeros((), jnp.int32)
    fns = {
        "stats": (jax.jit(f_stats), (hist0, xs_flat, acc0)),
        "out": (jax.jit(f_out), (hist0, xs_flat)),
        "packed": (jax.jit(f_packed), (hist0, xs_flat, cl0)),
        "pk_noclip": (jax.jit(f_pk_noclip), (hist0, xs_flat)),
        "pk_block": (jax.jit(f_pk_block), (hist0, xs_flat, cl0)),
        "pk_fold": (jax.jit(f_pk_fold), (hist0, xs_flat, cl0)),
    }
    comps = {}
    for name, (fn, args) in fns.items():
        comp = fn.lower(*args).compile()
        ca = comp.cost_analysis()
        print(f"# {name:10s} bytes {ca.get('bytes accessed', 0) / 2**30:7.2f}"
              f" GiB", flush=True)
        comps[name] = (comp, args)

    def sync(name, res):
        if name == "stats":
            float(res[1])
        elif name in ("out", "pk_noclip"):
            float(np.asarray(res[0][0, -1:])[0])
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
