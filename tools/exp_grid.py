"""Same-process A/B: grid order (nt, S//8) [s minor, buf re-fetched per
k-tile] vs (S//8, nt) [t minor, buf block resident across k-tiles]."""
import functools
import time

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo")
from art_tpu.ops.pallas_kernels import _asrc_dense_kernel

S, K, KB = 256, 8192 + 128, 128   # ~n=8192-call geometry
F, TP = 380, 384
SEGL = TP + 640
NT = K // KB
B = 16000 // 128 * 128 + 128
rng = np.random.default_rng(0)


def build(order):
    if order == "s_minor":
        grid = (NT, S // 8)
        blk = lambda t, s: (t, s, 0)
        relm = lambda t, s: (t, s, 0, 0)
        bufm = lambda t, s: (s, 0)
        tbm = lambda t, s: (s, 0)
        bankm = lambda t, s: (0, 0)
        kern = functools.partial(_asrc_dense_kernel, tp=TP, segl=SEGL,
                                 kb=KB)
    else:
        grid = (S // 8, NT)
        blk = lambda s, t: (t, s, 0)
        relm = lambda s, t: (t, s, 0, 0)
        bufm = lambda s, t: (s, 0)
        tbm = lambda s, t: (s, 0)
        bankm = lambda s, t: (0, 0)

        def kern(relT_ref, fi_ref, frac_ref, buf_ref, tb_ref, bankT_ref,
                 bankT2_ref, out_ref):
            # identical body; program_id(1) is now the k-tile index
            import art_tpu.ops.pallas_kernels as pk
            t = pl.program_id(1)
            nc = bankT_ref.shape[1] // 128
            lane128 = jax.lax.broadcasted_iota(jnp.int32, (KB, 128), 1)
            lane8 = jax.lax.broadcasted_iota(jnp.int32, (KB, 8), 1)
            for j in range(8):
                start = pl.multiple_of(tb_ref[j, t], 128)
                seg = buf_ref[pl.ds(j, 1), pl.ds(start, SEGL)]
                rel_col = relT_ref[0, 0, :, j:j + 1]
                win = pk._dense_windows(seg, rel_col, lane128, lane8, TP)
                fi_row = fi_ref[0, j:j + 1, :]
                c = jax.lax.shift_right_logical(fi_row, 7)
                idx = jnp.broadcast_to(jnp.bitwise_and(fi_row, 127),
                                       (TP, KB))
                masks = [jnp.broadcast_to(c == u, (TP, KB))
                         for u in range(nc - 1)]
                f1 = pk._dense_bank_rows(bankT_ref[:, :], idx, masks)
                f2 = pk._dense_bank_rows(bankT2_ref[:, :], idx, masks)
                fr = frac_ref[0, j:j + 1, :]
                w = f1 * (1.0 - fr) + f2 * fr
                out_ref[0, j:j + 1, :] = jnp.sum(win.T * w, axis=0,
                                                 keepdims=True)

    def run(relT, fi, frac, buf, tb, bankT, bankT2):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kern, grid=grid,
                in_specs=[
                    pl.BlockSpec((1, 1, KB, 8), relm,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 8, KB), blk, memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 8, KB), blk, memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, B), bufm, memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, NT), tbm, memory_space=pltpu.SMEM),
                    pl.BlockSpec((TP, 512), bankm,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((TP, 512), bankm,
                                 memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 8, KB), blk,
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((NT, S, KB), jnp.float32),
            )(relT, fi, frac, buf, tb, bankT, bankT2)
    return jax.jit(run)


def main():
    bankT = jnp.asarray(rng.standard_normal((TP, 512)).astype(np.float32))
    bankT2 = jnp.asarray(rng.standard_normal((TP, 512)).astype(np.float32))
    buf = jnp.asarray(rng.standard_normal((S, B)).astype(np.float32))
    tb = jnp.asarray((rng.integers(0, (B - SEGL) // 128, (S, NT)) * 128)
                     .astype(np.int32))
    rel = jnp.asarray(rng.integers(0, 512, (NT, S, KB)).astype(np.int32))
    relT = rel.reshape(NT, S // 8, 8, KB).transpose(0, 1, 3, 2)
    fi = jnp.asarray(rng.integers(0, F, (NT, S, KB)).astype(np.int32))
    frac = jnp.asarray(rng.random((NT, S, KB)).astype(np.float32))
    args = (relT, fi, frac, buf, tb, bankT, bankT2)
    fns = {o: build(o) for o in ("s_minor", "t_minor")}
    outs = {}
    for o, fn in fns.items():
        outs[o] = fn(*args)
        _ = float(jnp.sum(outs[o]))
    d = float(jnp.max(jnp.abs(outs["s_minor"] - outs["t_minor"])))
    results = {o: [] for o in fns}
    for _ in range(6):
        for o, fn in fns.items():
            t0 = time.perf_counter()
            for _ in range(8):
                out = fn(*args)
            _ = float(jnp.sum(out))
            results[o].append((time.perf_counter() - t0) / 8)
    for o, ts in results.items():
        dt = sorted(ts)[len(ts) // 2]
        print(f"{o}: {S*K/dt/1e6:6.1f} M out/s")
    print(f"maxdiff {d:.2e}")


if __name__ == "__main__":
    main()
