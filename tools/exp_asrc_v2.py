"""ASRC kernel v2 probes (run on the real TPU).

Mosaic lowers jnp.take_along_axis to tpu.dynamic_gather when input, indices
and output shapes are all equal (2D): axis=0 selects rows per column, axis=1
gathers lanes per row.  These probes measure both forms and a full v2
prototype that replaces the per-output roll/row-load structure of the v1
kernel with three dynamic_gathers per tile.

P0a: bank-row sublane gather rate ([1024, 512] from a row-padded bank).
P0b: window lane gather rate ([128, 896] Hankel-ish from a broadcast seg).
P2:  full v2 prototype: seg slice from resident buf + window gather + two
     bank gathers + lerp + rowwise dot.
"""
import time
import traceback

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, K, KB = 256, 2048, 128
TAPS, F = 380, 380
TP = 512
SEG = 896
NT = K // KB
BPAD = 1024            # bank rows padded for the batched sublane gather

rng = np.random.default_rng(0)


def timed(fn, *args, reps=20):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / reps


BLK = lambda t, s: (t, s, 0)


def pcall(kern, out_shape, in_specs, outs_spec, scratch=()):
    def run(*args):
        with jax.enable_x64(False):
            return pl.pallas_call(kern, grid=(NT, S // 8),
                                  in_specs=in_specs, out_specs=outs_spec,
                                  out_shape=out_shape,
                                  scratch_shapes=list(scratch))(*args)
    return jax.jit(run)


def tala(x, idx, axis):
    return jnp.take_along_axis(x, idx, axis=axis, mode="promise_in_bounds")


# ------------------------------------------------------ P0a: bank gather
def p0a():
    bank = np.zeros((BPAD, TP), np.float32)
    bank[:F + 2] = rng.standard_normal((F + 2, TP)).astype(np.float32)
    bank = jnp.asarray(bank)
    fi = jnp.asarray(rng.integers(0, F, (NT, S, KB)).astype(np.int32))

    def kern(fi_ref, bank_ref, out_ref):
        fiv = fi_ref[0].reshape(8 * KB)
        idx = jnp.broadcast_to(fiv[:, None], (BPAD, TP))
        rows = tala(bank_ref[:, :], idx, 0)            # [BPAD, TP]
        out_ref[0] = jnp.sum(rows, axis=1).reshape(8, KB)

    run = pcall(kern, jax.ShapeDtypeStruct((NT, S, KB), jnp.float32),
                [pl.BlockSpec((1, 8, KB), BLK, memory_space=pltpu.VMEM),
                 pl.BlockSpec(bank.shape, lambda t, s: (0, 0),
                              memory_space=pltpu.VMEM)],
                pl.BlockSpec((1, 8, KB), BLK, memory_space=pltpu.VMEM))
    o = np.asarray(run(fi, bank))
    ref = np.sum(np.asarray(bank)[np.asarray(fi)[1, 9]], axis=1)
    err = np.abs(o[1, 9] - ref).max()
    dt = timed(run, fi, bank)
    print(f"P0a bank sublane-gather: {S*K/dt/1e6:.1f} M rows/s "
          f"({dt*1e3:.2f} ms) err={err:.2e}")


# ---------------------------------------------------- P0b: window gather
def p0b():
    seg = jnp.asarray(rng.standard_normal((NT, S, SEG)).astype(np.float32))
    rel = jnp.asarray(rng.integers(0, SEG - TP, (NT, S, KB)).astype(np.int32))

    def kern(seg_ref, rel_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (KB, SEG), 1)
        for j in range(8):
            segb = jnp.broadcast_to(seg_ref[0, j, :], (KB, SEG))
            idx = rel_ref[0, j, :][:, None] + lane
            idx = jnp.where(lane < TP, idx, 0)
            win = tala(segb, idx, 1)                   # [KB, SEG]
            out_ref[0, j] = jnp.sum(win[:, :TP], axis=1)

    run = pcall(kern, jax.ShapeDtypeStruct((NT, S, KB), jnp.float32),
                [pl.BlockSpec((1, 8, SEG), BLK, memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, 8, KB), BLK, memory_space=pltpu.VMEM)],
                pl.BlockSpec((1, 8, KB), BLK, memory_space=pltpu.VMEM))
    o = np.asarray(run(seg, rel))
    sn, rn = np.asarray(seg)[2, 5], np.asarray(rel)[2, 5]
    ref = np.array([np.sum(sn[r:r + TP]) for r in rn])
    err = np.abs(o[2, 5] - ref).max()
    dt = timed(run, seg, rel)
    print(f"P0b window lane-gather: {S*K/dt/1e6:.1f} M win/s "
          f"({dt*1e3:.2f} ms) err={err:.2e}")


# ------------------------------------------------------ P2: full v2 proto
def p2():
    B = 8960
    bank = np.zeros((BPAD, TP), np.float32)
    bank[:F + 2] = rng.standard_normal((F + 2, TP)).astype(np.float32)
    bank = jnp.asarray(bank)
    buf = jnp.asarray(rng.standard_normal((S, B)).astype(np.float32))
    tb = jnp.asarray((rng.integers(0, (B - SEG) // 128, (S, NT)) * 128)
                     .astype(np.int32))
    rel = jnp.asarray(rng.integers(0, SEG - TP, (NT, S, KB)).astype(np.int32))
    fi = jnp.asarray(rng.integers(0, F, (NT, S, KB)).astype(np.int32))
    frac = jnp.asarray(rng.random((NT, S, KB)).astype(np.float32))

    def kern(rel_ref, fi_ref, frac_ref, buf_ref, tb_ref, bank_ref, out_ref):
        t = pl.program_id(0)
        fiv = fi_ref[0].reshape(8 * KB)
        bidx = jnp.broadcast_to(fiv[:, None], (BPAD, TP))
        f1 = tala(bank_ref[:, :], bidx, 0)
        f2 = tala(bank_ref[:, :], bidx + 1, 0)
        fr = frac_ref[0].reshape(8 * KB)[:, None]
        w = f1 * (1.0 - fr) + f2 * fr                  # [1024, TP]
        lane = jax.lax.broadcasted_iota(jnp.int32, (KB, SEG), 1)
        for j in range(8):
            start = pl.multiple_of(tb_ref[j, t], 128)
            seg = buf_ref[pl.ds(j, 1), pl.ds(start, SEG)]
            segb = jnp.broadcast_to(seg, (KB, SEG))
            idx = rel_ref[0, j, :][:, None] + lane
            idx = jnp.where(lane < TP, idx, 0)
            win = tala(segb, idx, 1)[:, :TP]
            out_ref[0, j] = jnp.sum(win * w[j * KB:(j + 1) * KB], axis=1)

    def run(rel, fi, frac, buf, tb, bank):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kern, grid=(NT, S // 8),
                in_specs=[
                    pl.BlockSpec((1, 8, KB), BLK, memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 8, KB), BLK, memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 8, KB), BLK, memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, B), lambda t, s: (s, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, NT), lambda t, s: (s, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec(bank.shape, lambda t, s: (0, 0),
                                 memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 8, KB), BLK,
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((NT, S, KB), jnp.float32),
            )(rel, fi, frac, buf, tb, bank)
    run = jax.jit(run)

    o = np.asarray(run(rel, fi, frac, buf, tb, bank))
    bn, fn2, rn, fin, frn, tbn = map(np.asarray, (buf, bank, rel, fi, frac, tb))
    t0, s0, k0 = 1, 3, 17
    st = tbn[s0, t0] + rn[t0, s0, k0]
    wv = bn[s0, st:st + TP]
    frv = frn[t0, s0, k0]
    ref = np.sum(wv * (fn2[fin[t0, s0, k0]] * (1 - frv)
                       + fn2[fin[t0, s0, k0] + 1] * frv))
    err = abs(o[t0, s0, k0] - ref) / max(1e-9, abs(ref))
    dt = timed(run, rel, fi, frac, buf, tb, bank)
    print(f"P2 v2 proto: {S*K/dt/1e6:.1f} M out/s ({dt*1e3:.2f} ms) "
          f"relerr={err:.2e}")


if __name__ == "__main__":
    for p in (p0a, p0b, p2):
        try:
            p()
        except Exception:
            print(f"{p.__name__} FAILED:")
            traceback.print_exc()
