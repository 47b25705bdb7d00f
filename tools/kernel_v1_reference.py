import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
def _dense_windows_v1(seg, rel_col, lane128, lane8, tp: int):
    """seg [1, SEGL], rel_col [KB, 1] i32 -> win [KB, tp], row r =
    seg[rel_r : rel_r + tp] (rel <= SEGL - tp - 1 enforced upstream)."""
    sw = tp + 128
    nshift = (seg.shape[1] - sw) // 128 + 1
    segshift = jnp.concatenate(
        [seg[:, 128 * c:128 * c + sw] for c in range(min(nshift, 8))]
        + [seg[:, :sw]] * max(0, 8 - nshift), axis=0)       # [8, tp+128]
    a = jax.lax.shift_right_logical(rel_col, 7)             # [KB, 1]
    onehot = (a == lane8).astype(seg.dtype)                 # [KB, 8]
    coarse = jax.lax.dot_general(
        onehot, segshift, (((1,), (0,)), ((), ())),
        preferred_element_type=seg.dtype,
        precision=jax.lax.Precision.HIGHEST)                # [KB, tp+128]
    b = jnp.bitwise_and(rel_col, 127)                       # [KB, 1]
    idxf = jnp.bitwise_and(b + lane128, 127)                # [KB, 128]
    nu = tp // 128
    g = [jnp.take_along_axis(coarse[:, 128 * u:128 * (u + 1)], idxf, axis=1,
                             mode="promise_in_bounds") for u in range(nu + 1)]
    mask = lane128 < (128 - b)
    return jnp.concatenate(
        [jnp.where(mask, g[u], g[u + 1]) for u in range(nu)], axis=1)


def _dense_bank_rows_v1(bankT, idx, masks):
    """bankT [tp, NC*128] (lanes = phases) -> [tp, KB] selected rows."""
    tp = bankT.shape[0]
    nc = bankT.shape[1] // 128
    parts = [jnp.take_along_axis(bankT[:, 128 * u:128 * (u + 1)], idx,
                                 axis=1, mode="promise_in_bounds")
             for u in range(nc)]
    out = parts[nc - 1]
    for u in range(nc - 2, -1, -1):
        out = jnp.where(masks[u], parts[u], out)
    return out


def _asrc_dense_kernel_v1(relT_ref, fi_ref, frac_ref, buf_ref, tb_ref,
                       bankT_ref, bankT2_ref, out_ref, *, tp: int,
                       segl: int, kb: int):
    t = pl.program_id(0)
    nc = bankT_ref.shape[1] // 128
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (kb, 128), 1)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (kb, 8), 1)
    for j in range(8):
        start = pl.multiple_of(tb_ref[j, t], 128)
        seg = buf_ref[pl.ds(j, 1), pl.ds(start, segl)]
        rel_col = relT_ref[0, 0, :, j:j + 1]                # [KB, 1]
        win = _dense_windows_v1(seg, rel_col, lane128, lane8, tp)
        winT = win.T                                        # [tp, KB]
        fi_row = fi_ref[0, j:j + 1, :]                      # [1, KB]
        c = jax.lax.shift_right_logical(fi_row, 7)
        # lane-gathers are vreg-local: index blocks must be exactly 128
        # lanes wide, so wider tiles run the filter side in 128-lane halves
        f1h, f2h = [], []
        for h in range(kb // 128):
            sl = slice(128 * h, 128 * (h + 1))
            idx = jnp.broadcast_to(
                jnp.bitwise_and(fi_row[:, sl], 127), (tp, 128))
            masks = [jnp.broadcast_to(c[:, sl] == u, (tp, 128))
                     for u in range(nc - 1)]
            f1h.append(_dense_bank_rows_v1(bankT_ref[:, :], idx, masks))
            f2h.append(_dense_bank_rows_v1(bankT2_ref[:, :], idx, masks))
        f1 = f1h[0] if kb == 128 else jnp.concatenate(f1h, axis=1)
        f2 = f2h[0] if kb == 128 else jnp.concatenate(f2h, axis=1)
        fr = frac_ref[0, j:j + 1, :]                        # [1, KB]
        w = f1 * (1.0 - fr) + f2 * fr                       # [tp, KB]
        out_ref[0, j:j + 1, :] = jnp.sum(winT * w, axis=0, keepdims=True)


