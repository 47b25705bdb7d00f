"""A/B: Hankel filter stage with separate (bankT, bankT2) gathers vs ONE
row-stacked table [2*tp, nc*128] (half the gather ops, same elements).
Full-kernel same-process interleaved comparison at engine geometry;
checks outputs equal bitwise (same values, same order of operations on
the gathered data)."""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from art_tpu.ops.pallas_kernels import hankel_segl

S, K, KB, SMAX = 256, 2048, 256, 4
F = 380
TP = 384
SEGL = hankel_segl(TP, KB, SMAX)
NT = K // KB
R8 = 8 * KB
B = 8960
NC = -(-(F + 1) // 128)
TPX = -(-(TP + SMAX) // 8) * 8

rng = np.random.default_rng(0)


def make_kernel(stacked):
    def kern(carry_ref, fir_ref, frr_ref, buf_ref, tb_ref, rel_ref,
             t1_ref, t2_ref, out_ref):
        t = pl.program_id(0)
        fi = fir_ref[0, 0, :, :]
        c = jax.lax.shift_right_logical(fi, 7)
        f1c, f2c = [], []
        for h in range(R8 // 128):
            sl = slice(128 * h, 128 * (h + 1))
            if stacked:
                idx_h = jnp.broadcast_to(jnp.bitwise_and(fi[:, sl], 127),
                                         (2 * TP, 128))
                p = [jnp.take_along_axis(t1_ref[:, 128*u:128*(u+1)], idx_h,
                                         axis=1, mode="promise_in_bounds")
                     for u in range(NC)]
                o = p[NC - 1]
                for u in range(NC - 2, -1, -1):
                    m = jnp.broadcast_to(c[:, sl] == u, (2 * TP, 128))
                    o = jnp.where(m, p[u], o)
                f1c.append(o[:TP])
                f2c.append(o[TP:])
            else:
                idx_h = jnp.broadcast_to(jnp.bitwise_and(fi[:, sl], 127),
                                         (TP, 128))
                p1 = [jnp.take_along_axis(t1_ref[:TP, 128*u:128*(u+1)],
                                          idx_h, axis=1,
                                          mode="promise_in_bounds")
                      for u in range(NC)]
                p2 = [jnp.take_along_axis(t2_ref[:TP, 128*u:128*(u+1)],
                                          idx_h, axis=1,
                                          mode="promise_in_bounds")
                      for u in range(NC)]
                o1, o2 = p1[NC-1], p2[NC-1]
                for u in range(NC - 2, -1, -1):
                    m = jnp.broadcast_to(c[:, sl] == u, (TP, 128))
                    o1 = jnp.where(m, p1[u], o1)
                    o2 = jnp.where(m, p2[u], o2)
                f1c.append(o1)
                f2c.append(o2)
        f1 = jnp.concatenate(f1c, axis=1)
        f2 = jnp.concatenate(f2c, axis=1)
        fr = frr_ref[0, 0, :, :]
        w = f1 * (1.0 - fr) + f2 * fr

        wpad = jnp.concatenate(
            [w, jnp.zeros((TPX - TP, R8), dtype=w.dtype)], axis=0)
        carry = carry_ref[0, 0, :, :]
        w2 = wpad
        for cc in range(1, SMAX + 1):
            m = jnp.broadcast_to(carry == cc, (TPX, R8))
            w2 = jnp.where(m, pltpu.roll(wpad, cc, 0), w2)

        acc = None
        for j in range(8):
            start = pl.multiple_of(tb_ref[j, t], 128)
            seg = buf_ref[pl.ds(j, 1), pl.ds(start, SEGL)]
            C = jnp.concatenate(
                [seg] + [pltpu.roll(seg, SEGL - s, 1) for s in range(1, 8)],
                axis=0)
            C2 = pltpu.roll(C, jnp.int32(SEGL) - rel_ref[j, t], 1)
            parts = []
            for a in range(TPX // 8):
                band = (C2 if a == 0
                        else pltpu.roll(C2, SEGL - 8 * a, 1))[:, :KB]
                wband = w2[8*a:8*(a+1), KB*j:KB*(j+1)]
                parts.append(jnp.sum(band * wband, axis=0, keepdims=True))
            colsum = parts[0]
            for p_ in parts[1:]:
                colsum = colsum + p_
            acc = colsum if acc is None else jnp.concatenate([acc, colsum],
                                                             axis=1)
        out_ref[0, 0, :, :] = acc
    return kern


def timed(fn, *args, reps=20):
    out = fn(*args)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / reps, out


def build(stacked, tabA, tabB):
    blk4 = lambda t, s: (t, s, 0, 0)
    vspec = pl.BlockSpec((1, 1, 1, R8), blk4, memory_space=pltpu.VMEM)
    rows = 2 * TP if stacked else TP

    def run(carry, fi, fr, buf, tb, rel):
        with jax.enable_x64(False):
            return pl.pallas_call(
                make_kernel(stacked), grid=(NT, S // 8),
                in_specs=[vspec, vspec, vspec,
                          pl.BlockSpec((8, B), lambda t, s: (s, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((8, NT), lambda t, s: (s, 0),
                                       memory_space=pltpu.SMEM),
                          pl.BlockSpec((8, NT), lambda t, s: (s, 0),
                                       memory_space=pltpu.SMEM),
                          pl.BlockSpec((rows, NC * 128),
                                       lambda t, s: (0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((TP, NC * 128), lambda t, s: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=vspec,
                out_shape=jax.ShapeDtypeStruct((NT, S // 8, 1, R8),
                                               jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024),
            )(carry, fi, fr, buf, tb, rel, tabA, tabB)
    return jax.jit(lambda *a: run(*a))


def main():
    bankT = rng.standard_normal((TP, NC*128)).astype(np.float32)
    bankT2 = rng.standard_normal((TP, NC*128)).astype(np.float32)
    stackedT = jnp.asarray(np.concatenate([bankT, bankT2], axis=0))
    bT, bT2 = jnp.asarray(bankT), jnp.asarray(bankT2)
    buf = jnp.asarray(rng.standard_normal((S, B)).astype(np.float32))
    tb = jnp.asarray((rng.integers(0, (B - SEGL) // 128, (S, NT)) * 128)
                     .astype(np.int32))
    rel = jnp.asarray(rng.integers(0, 128, (S, NT)).astype(np.int32))
    carry = jnp.asarray(rng.integers(0, SMAX + 1, (NT, S//8, 1, R8))
                        .astype(np.int32))
    fi = jnp.asarray(rng.integers(0, F, (NT, S//8, 1, R8)).astype(np.int32))
    fr = jnp.asarray(rng.random((NT, S//8, 1, R8)).astype(np.float32))
    args = (carry, fi, fr, buf, tb, rel)

    sep = build(False, bT, bT2)
    stk = build(True, stackedT, bT2)     # t2 unused in stacked mode
    for rnd in range(3):
        for name, fn in (("separate", sep), ("stacked ", stk)):
            dt, out = timed(fn, *args)
            print(f"  {name}: {S*K/dt/1e6:6.1f} M out/s ({dt*1e3:.2f} ms)")
        if rnd == 0:
            d = float(jnp.max(jnp.abs(sep(*args) - stk(*args))))
            print(f"  maxdiff: {d}")


if __name__ == "__main__":
    main()
