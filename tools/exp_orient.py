"""Same-process A/B of the dense kernel's dot orientation (service-hour
drift confounded the earlier sequential measurements)."""
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
from art_tpu.ops.pallas_kernels import _dense_windows, _dense_bank_rows

S, K, KB = 256, 2048, 128
F, TP = 380, 384
SEGL = TP + 640
NT = K // KB
B = 8960
BLK = lambda t, s: (t, s, 0)
rng = np.random.default_rng(0)


def make_kernel(orient):
    def kern(relT_ref, fi_ref, frac_ref, buf_ref, tb_ref, bankT_ref,
             bankT2_ref, out_ref):
        t = pl.program_id(0)
        nc = bankT_ref.shape[1] // 128
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (KB, 128), 1)
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (KB, 8), 1)
        for j in range(8):
            start = pl.multiple_of(tb_ref[j, t], 128)
            seg = buf_ref[pl.ds(j, 1), pl.ds(start, SEGL)]
            rel_col = relT_ref[0, 0, :, j:j + 1]
            win = _dense_windows(seg, rel_col, lane128, lane8, TP)
            fi_row = fi_ref[0, j:j + 1, :]
            c = jax.lax.shift_right_logical(fi_row, 7)
            idx = jnp.broadcast_to(jnp.bitwise_and(fi_row, 127), (TP, KB))
            masks = [jnp.broadcast_to(c == u, (TP, KB))
                     for u in range(nc - 1)]
            f1 = _dense_bank_rows(bankT_ref[:, :], idx, masks)
            f2 = _dense_bank_rows(bankT2_ref[:, :], idx, masks)
            fr = frac_ref[0, j:j + 1, :]
            w = f1 * (1.0 - fr) + f2 * fr
            if orient == "sub":
                out_ref[0, j:j + 1, :] = jnp.sum(win.T * w, axis=0,
                                                 keepdims=True)
            else:
                out_ref[0, j:j + 1, :] = jnp.sum(win * w.T, axis=1,
                                                 keepdims=True).T
    return kern


def build(orient):
    def run(relT, fi, frac, buf, tb, bankT, bankT2):
        with jax.enable_x64(False):
            return pl.pallas_call(
                make_kernel(orient), grid=(NT, S // 8),
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
    fns = {o: build(o) for o in ("sub", "lane")}
    outs = {}
    for o, fn in fns.items():
        outs[o] = fn(*args)
        _ = float(jnp.sum(outs[o]))
    d = float(jnp.max(jnp.abs(outs["sub"] - outs["lane"])))
    results = {o: [] for o in fns}
    for _ in range(6):                  # interleaved to cancel drift
        for o, fn in fns.items():
            t0 = time.perf_counter()
            for _ in range(10):
                out = fn(*args)
            _ = float(jnp.sum(out))
            results[o].append((time.perf_counter() - t0) / 10)
    for o, ts in results.items():
        dt = sorted(ts)[len(ts) // 2]
        print(f"{o}: {S*K/dt/1e6:6.1f} M out/s (median of {len(ts)})")
    print(f"maxdiff {d:.2e}")


if __name__ == "__main__":
    main()
