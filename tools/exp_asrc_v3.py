"""Dense gather-select ASRC kernel prototype (v2 design).

Replaces the v1 kernel's per-output sublane-1 loads/rolls with full-density
vreg-local ops, using the two Mosaic dynamic_gather forms measured to work:
  - sublane-gather: 8-row table, any width (per-column row select)
  - lane-gather: any rows, exactly 128 lanes (per-row in-vreg gather)

Window extraction per (stream, 128-output tile):
  seg[1, 1024] -> segshift[8, 640] (static slices; row c = seg[128c:128c+640])
  coarse[128, 640] = onehot(rel >> 7)[128, 8] @ segshift   (tiny MXU matmul)
  win[128, 512]    = 5 vreg-local lane-gathers by rel & 127 + 4 selects
Filter rows per tile (bank transposed: [512 taps, 512 phase-lanes]):
  F1T/F2T [512, 128] = 3 lane-gathers each over the 3 phase lane-blocks
Dot: transpose(win) * lerp(F1T, F2T) summed over tap sublanes.

rel is supplied in BOTH orientations (outputs-in-lanes for bookkeeping,
outputs-in-sublanes for the window stage) so the kernel never transposes
index vectors.
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
TP = 384          # taps padded to a sublane multiple (380 -> 384)
SEGL = 1024
NT = K // KB
B = 8960          # stream buffer length (lane multiple)
NU = TP // 128    # fine-stage lane blocks

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


def tala(x, idx, axis):
    return jnp.take_along_axis(x, idx, axis=axis, mode="promise_in_bounds")


def _extract_windows(seg, rel_col, lane128, lane8):
    """seg [1, SEGL], rel_col [KB, 1] i32 -> win [KB, TP] with row r =
    seg[rel_r : rel_r + TP] (requires rel <= 511)."""
    sw = TP + 128
    segshift = jnp.concatenate(
        [seg[:, 128 * c:128 * c + sw] for c in range(4)]
        + [seg[:, :sw]] * 4, axis=0)                        # [8, TP+128]
    a = jax.lax.shift_right_logical(rel_col, 7)             # [KB, 1]
    onehot = (a == lane8).astype(seg.dtype)                 # [KB, 8]
    coarse = jax.lax.dot_general(
        onehot, segshift, (((1,), (0,)), ((), ())),
        preferred_element_type=seg.dtype,
        precision=jax.lax.Precision.HIGHEST)                # [KB, TP+128]
    b = jnp.bitwise_and(rel_col, 127)                       # [KB, 1]
    idxf = jnp.bitwise_and(b + lane128, 127)                # [KB, 128]
    g = [tala(coarse[:, 128 * u:128 * (u + 1)], idxf, 1)
         for u in range(NU + 1)]
    mask = lane128 < (128 - b)
    win = jnp.concatenate(
        [jnp.where(mask, g[u], g[u + 1]) for u in range(NU)], axis=1)
    return win                                              # [KB, TP]


def _gather_bankT(bankT, idx, m0, m1):
    """bankT [TP, 512] (lanes = phases), pre-built idx/masks -> [TP, KB]."""
    parts = [tala(bankT[:, 128 * u:128 * (u + 1)], idx, 1) for u in range(3)]
    return jnp.where(m0, parts[0], jnp.where(m1, parts[1], parts[2]))


def _v2_kernel(relT_ref, fi_ref, frac_ref, buf_ref, tb_ref, bankT_ref,
               bankT2_ref, out_ref):
    t = pl.program_id(0)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (KB, 128), 1)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (KB, 8), 1)
    for j in range(8):
        start = pl.multiple_of(tb_ref[j, t], 128)
        seg = buf_ref[pl.ds(j, 1), pl.ds(start, SEGL)]
        rel_col = relT_ref[0, 0, :, j:j + 1]                # [KB, 1]
        win = _extract_windows(seg, rel_col, lane128, lane8)
        winT = win.T                                        # [TP, KB]
        fi_row = fi_ref[0, j:j + 1, :]                      # [1, KB]
        c = jax.lax.shift_right_logical(fi_row, 7)
        idx = jnp.broadcast_to(jnp.bitwise_and(fi_row, 127), (TP, KB))
        m0 = jnp.broadcast_to(c == 0, (TP, KB))
        m1 = jnp.broadcast_to(c == 1, (TP, KB))
        # bankT2 holds the fi+1 rows at lane fi, so f2 reuses idx/masks
        f1 = _gather_bankT(bankT_ref[:, :], idx, m0, m1)
        f2 = _gather_bankT(bankT2_ref[:, :], idx, m0, m1)
        fr = frac_ref[0, j:j + 1, :]                        # [1, KB]
        w = f1 * (1.0 - fr) + f2 * fr                       # [TP, KB]
        out_ref[0, j:j + 1, :] = jnp.sum(winT * w, axis=0, keepdims=True)


def main():
    bank = np.zeros((F + 2, TP), np.float32)
    bank[:, :TAPS] = rng.standard_normal((F + 2, TAPS)).astype(np.float32)
    bankT = np.zeros((TP, 512), np.float32)
    bankT[:, :F + 1] = bank[:F + 1].T
    bankT2 = np.zeros((TP, 512), np.float32)
    bankT2[:, :F + 1] = bank[1:F + 2].T
    bankT, bankT2 = jnp.asarray(bankT), jnp.asarray(bankT2)
    buf = jnp.asarray(rng.standard_normal((S, B)).astype(np.float32))
    tb = jnp.asarray((rng.integers(0, (B - SEGL) // 128, (S, NT)) * 128)
                     .astype(np.int32))
    rel = jnp.asarray(rng.integers(0, 512, (NT, S, KB))
                      .astype(np.int32))
    relT = rel.reshape(NT, S // 8, 8, KB).transpose(0, 1, 3, 2)
    fi = jnp.asarray(rng.integers(0, F, (NT, S, KB)).astype(np.int32))
    frac = jnp.asarray(rng.random((NT, S, KB)).astype(np.float32))

    def run(relT, fi, frac, buf, tb, bankT, bankT2):
        with jax.enable_x64(False):
            return pl.pallas_call(
                _v2_kernel, grid=(NT, S // 8),
                in_specs=[
                    pl.BlockSpec((1, 1, KB, 8), lambda t, s: (t, s, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 8, KB), BLK, memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 8, KB), BLK, memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, B), lambda t, s: (s, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, NT), lambda t, s: (s, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec(bankT.shape, lambda t, s: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(bankT.shape, lambda t, s: (0, 0),
                                 memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 8, KB), BLK,
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((NT, S, KB), jnp.float32),
            )(relT, fi, frac, buf, tb, bankT, bankT2)
    run = jax.jit(run)

    o = np.asarray(run(relT, fi, frac, buf, tb, bankT, bankT2))
    bn = np.asarray(buf)
    rn, fin, frn, tbn = map(np.asarray, (rel, fi, frac, tb))
    errs = []
    for (t0, s0, k0) in [(1, 3, 17), (0, 0, 0), (15, 255, 127), (7, 100, 64)]:
        st = tbn[s0, t0] + rn[t0, s0, k0]
        wv = bn[s0, st:st + TP]
        frv = frn[t0, s0, k0]
        fl = (bank[fin[t0, s0, k0]] * (1 - frv)
              + bank[fin[t0, s0, k0] + 1] * frv)
        ref = np.sum(wv * fl)
        errs.append(abs(o[t0, s0, k0] - ref) / max(1e-9, abs(ref)))
    dt = timed(run, relT, fi, frac, buf, tb, bankT, bankT2)
    print(f"v2 dense kernel: {S*K/dt/1e6:.1f} M out/s ({dt*1e3:.2f} ms) "
          f"max_relerr={max(errs):.2e}")


if __name__ == "__main__":
    try:
        main()
    except Exception:
        traceback.print_exc()
