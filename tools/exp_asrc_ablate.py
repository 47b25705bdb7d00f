"""Dense ASRC kernel ablations: where does the time go?

A: full kernel (baseline)
B: filter side replaced by one constant row (window + dot cost only)
C: window side replaced by a constant slice (filter + dot cost only)
D: dot only (both sides constant)
"""
import functools
import time
import traceback

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo")
from art_tpu.ops.pallas_kernels import (_KB, _dense_windows,
                                        _dense_bank_rows)

S, K, KB = 256, 2048, 128
F = 380
TP = 384
SEGL = TP + 640
NT = K // KB
B = 8960

rng = np.random.default_rng(0)
BLK = lambda t, s: (t, s, 0)


def timed(fn, *args, reps=20):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / reps


def make_kernel(mode):
    def kern(relT_ref, fi_ref, frac_ref, buf_ref, tb_ref, bankT_ref,
             bankT2_ref, out_ref):
        t = pl.program_id(0)
        nc = bankT_ref.shape[1] // 128
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (_KB, 128), 1)
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (_KB, 8), 1)
        for j in range(8):
            start = pl.multiple_of(tb_ref[j, t], 128)
            seg = buf_ref[pl.ds(j, 1), pl.ds(start, SEGL)]
            if mode == "E":
                # window extraction + lane-dot, no transpose at all
                rel_col = relT_ref[0, 0, :, j:j + 1]
                win = _dense_windows(seg, rel_col, lane128, lane8, TP)
                fr = frac_ref[0, j:j + 1, :]
                wrow = jnp.broadcast_to(bankT_ref[0:1, :TP], (_KB, TP))
                out_ref[0, j:j + 1, :] = jnp.sum(
                    win * wrow, axis=1, keepdims=True).T
                continue
            if mode == "F":
                # like B but skip the coarse one-hot matmul (fixed slice)
                coarse = jnp.broadcast_to(seg[:, :TP + 128],
                                          (_KB, TP + 128))
                b_ = jnp.bitwise_and(relT_ref[0, 0, :, j:j + 1], 127)
                idxf = jnp.bitwise_and(b_ + lane128, 127)
                g = [jnp.take_along_axis(
                        coarse[:, 128 * u:128 * (u + 1)], idxf, axis=1,
                        mode="promise_in_bounds") for u in range(TP // 128 + 1)]
                mask = lane128 < (128 - b_)
                win = jnp.concatenate(
                    [jnp.where(mask, g[u], g[u + 1])
                     for u in range(TP // 128)], axis=1)
                winT = win.T
                fr = frac_ref[0, j:j + 1, :]
                w = jnp.broadcast_to(bankT_ref[:, 0:1], (TP, _KB)) * fr
                out_ref[0, j:j + 1, :] = jnp.sum(winT * w, axis=0,
                                                 keepdims=True)
                continue
            if mode == "G":
                # like B but window = coarse matmul only (no fine gathers)
                rel_col = relT_ref[0, 0, :, j:j + 1]
                a_ = jax.lax.shift_right_logical(rel_col, 7)
                onehot = (a_ == lane8).astype(jnp.float32)
                sw = TP + 128
                segshift = jnp.concatenate(
                    [seg[:, 128 * c:128 * c + sw] for c in range(4)]
                    + [seg[:, :sw]] * 4, axis=0)
                coarse = jax.lax.dot_general(
                    onehot, segshift, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                winT = coarse[:, :TP].T
                fr = frac_ref[0, j:j + 1, :]
                w = jnp.broadcast_to(bankT_ref[:, 0:1], (TP, _KB)) * fr
                out_ref[0, j:j + 1, :] = jnp.sum(winT * w, axis=0,
                                                 keepdims=True)
                continue
            if mode in ("A", "B"):
                rel_col = relT_ref[0, 0, :, j:j + 1]
                win = _dense_windows(seg, rel_col, lane128, lane8, TP)
                winT = win.T
            else:
                winT = jnp.broadcast_to(bankT_ref[:, 0:1], (TP, _KB))
            if mode in ("A", "C"):
                fi_row = fi_ref[0, j:j + 1, :]
                c = jax.lax.shift_right_logical(fi_row, 7)
                idx = jnp.broadcast_to(jnp.bitwise_and(fi_row, 127),
                                       (TP, _KB))
                masks = [jnp.broadcast_to(c == u, (TP, _KB))
                         for u in range(nc - 1)]
                f1 = _dense_bank_rows(bankT_ref[:, :], idx, masks)
                f2 = _dense_bank_rows(bankT2_ref[:, :], idx, masks)
            else:
                f1 = jnp.broadcast_to(bankT_ref[:, 7:8], (TP, _KB))
                f2 = jnp.broadcast_to(bankT2_ref[:, 7:8], (TP, _KB))
            fr = frac_ref[0, j:j + 1, :]
            w = f1 * (1.0 - fr) + f2 * fr
            out_ref[0, j:j + 1, :] = jnp.sum(winT * w, axis=0,
                                             keepdims=True)
    return kern


def run_mode(mode, args):
    def run(relT, fi, frac, buf, tb, bankT, bankT2):
        with jax.enable_x64(False):
            return pl.pallas_call(
                make_kernel(mode), grid=(NT, S // 8),
                in_specs=[
                    pl.BlockSpec((1, 1, KB, 8), lambda t, s: (t, s, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 8, KB), BLK, memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 8, KB), BLK, memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, B), lambda t, s: (s, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, NT), lambda t, s: (s, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((TP, 512), lambda t, s: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((TP, 512), lambda t, s: (0, 0),
                                 memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 8, KB), BLK,
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((NT, S, KB), jnp.float32),
            )(*args)
    run = jax.jit(run)
    dt = timed(run, *args)
    print(f"{mode}: {S*K/dt/1e6:6.1f} M out/s ({dt*1e3:.2f} ms)")


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
    for mode in "ABCDEFG":
        try:
            run_mode(mode, args)
        except Exception:
            print(f"{mode} FAILED"); traceback.print_exc()


if __name__ == "__main__":
    main()
