"""Decisive same-process engine-shape A/B: looped (v1) vs batched (v2)
dense-kernel structures at the real ladder geometries."""
import functools
import sys
import time

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
import art_tpu.ops.pallas_kernels as pk
from kernel_v1_reference import _asrc_dense_kernel_v1

F, TAPS = 380, 380
TP = 384
rng = np.random.default_rng(0)


def build(variant, S, KP, kb, segl, B):
    nt = KP // kb
    r8 = 8 * kb
    if variant == "v1":
        kern = functools.partial(_asrc_dense_kernel_v1, tp=TP, segl=segl,
                                 kb=kb)
        blk = lambda t, s: (t, s, 0)
        in_specs = [
            pl.BlockSpec((1, 1, kb, 8), lambda t, s: (t, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, kb), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, kb), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, B), lambda t, s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, nt), lambda t, s: (s, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TP, 512), lambda t, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, 512), lambda t, s: (0, 0),
                         memory_space=pltpu.VMEM)]
        out_specs = pl.BlockSpec((1, 8, kb), blk, memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((nt, S, kb), jnp.float32)
    else:
        kern = functools.partial(pk._asrc_dense_kernel, tp=TP, segl=segl,
                                 kb=kb)
        blk4 = lambda t, s: (t, s, 0, 0)
        in_specs = [
            pl.BlockSpec((1, 1, r8, 1), blk4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, r8), blk4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, r8), blk4, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, B), lambda t, s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, nt), lambda t, s: (s, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TP, 512), lambda t, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, 512), lambda t, s: (0, 0),
                         memory_space=pltpu.VMEM)]
        out_specs = pl.BlockSpec((1, 1, 1, r8), blk4,
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((nt, S // 8, 1, r8), jnp.float32)

    def run(*args):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kern, grid=(nt, S // 8), in_specs=in_specs,
                out_specs=out_specs, out_shape=out_shape,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=96 * 1024 * 1024),
            )(*args)
    return jax.jit(run)


def main():
    S = 256
    for kb, KP in ((128, 8448), (512, 66560)):
        segl = TP + (640 if kb <= 128 else 1024)
        B = (17000 + KP + segl) // 128 * 128
        nt = KP // kb
        bankT = np.zeros((TP, 512), np.float32)
        bankT[:, :F + 2] = rng.standard_normal((F + 2, TP)) \
            .astype(np.float32).T
        bankT2 = np.roll(bankT, -1, axis=1)
        buf = jnp.asarray(rng.standard_normal((S, B)).astype(np.float32))
        tb = jnp.asarray((rng.integers(0, (B - segl) // 128, (S, nt))
                          * 128).astype(np.int32))
        rel = rng.integers(0, segl - TP - 1, (S, nt, kb)).astype(np.int32)
        fi = rng.integers(0, F, (S, nt, kb)).astype(np.int32)
        frac = rng.random((S, nt, kb)).astype(np.float32)
        # v1 layouts
        relT = jnp.asarray(rel.reshape(S // 8, 8, nt, kb)
                           .transpose(2, 0, 3, 1))
        fi1 = jnp.asarray(rel * 0 + fi).reshape(S, nt, kb) \
            .transpose(1, 0, 2)
        fr1 = jnp.asarray(frac).reshape(S, nt, kb).transpose(1, 0, 2)
        # v2 layouts
        relc = jnp.asarray(rel.reshape(S // 8, 8, nt, kb)
                           .transpose(2, 0, 1, 3)
                           .reshape(nt, S // 8, 8 * kb, 1))
        fir = jnp.asarray(fi.reshape(S // 8, 8, nt, kb)
                          .transpose(2, 0, 1, 3)
                          .reshape(nt, S // 8, 1, 8 * kb))
        frr = jnp.asarray(frac.reshape(S // 8, 8, nt, kb)
                          .transpose(2, 0, 1, 3)
                          .reshape(nt, S // 8, 1, 8 * kb))
        bt, bt2 = jnp.asarray(bankT), jnp.asarray(bankT2)
        tbj = tb
        f1 = build("v1", S, KP, kb, segl, B)
        f2 = build("v2", S, KP, kb, segl, B)
        a1 = (relT, fi1, fr1, buf, tbj, bt, bt2)
        a2 = (relc, fir, frr, buf, tbj, bt, bt2)
        o1 = f1(*a1); _ = float(jnp.sum(o1))
        o2 = f2(*a2); _ = float(jnp.sum(o2))
        res = {"v1": [], "v2": []}
        for _ in range(5):
            for name, fn, aa in (("v1", f1, a1), ("v2", f2, a2)):
                t0 = time.perf_counter()
                for _ in range(4):
                    out = fn(*aa)
                _ = float(jnp.sum(out))
                res[name].append((time.perf_counter() - t0) / 4)
        for name, ts in res.items():
            dt = sorted(ts)[len(ts) // 2]
            print(f"kb={kb} KP={KP} {name}: {S*KP/dt/1e6:6.1f} M out/s "
                  f"({dt*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
