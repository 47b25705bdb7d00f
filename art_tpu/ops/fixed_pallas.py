"""Pallas streaming kernel for the fixed-ratio (reduced) resample body.

The XLA residue-split contraction (parallel/pipeline.residue_window_dots)
reads the window buffer once per residue — qn (typically 4) full HBM passes
over the dot operand, plus separate mask/power passes.  SOL.md's roofline
puts that window side at ~1.9 ms per 2^22-frame chunk against a 1.75 ms MXU
floor.  This kernel streams the window buffer through VMEM ONCE:

  - the window buffer is reshaped to KQ-sample tiles ([ch, nt, KQ] with
    KQ = qn*M — output block i consumes window samples
    [i*M, i*M + KQ), i.e. exactly tiles  i//qn  and  i//qn + 1),
  - the grid walks (channel, tile-group); each program holds ``jb`` tiles
    plus an 8-tile halo (the same array passed under a second BlockSpec —
    only the first halo tile is used, the 8-tile granularity satisfies the
    sublane rule),
  - the qn residue operands are STATIC lane slices of the in-VMEM tiles
    (residue r of local block j is  [tile_j[r*M:], tile_{j+1}[:r*M]]),
    each dotted against the same [KQ, L] phase-anchor matrix on the MXU —
    identical contraction shape, order, and FLOPs as the XLA form,
  - the valid-output mask (outputs beyond K zeroed) is applied in-kernel,
    so no separate mask pass touches HBM.

The arithmetic is the same K=KQ windowed dot per output block as
residue_window_dots, so results sit at the same float32 matmul floor as the
XLA step (parity class of PARITY.md row "apply_filter hot loop"); the
consume/emit accounting (reference resampler.c:494-529) is untouched — this
is only the inner `apply_filter` loop (reference resampler.c:1029-1044)
restated as a single-pass streaming kernel.

f32 only (Mosaic has no f64); the f64 device path keeps the XLA body.

Relation to ops/pallas_kernels.polyphase_apply_pallas (the round-1 attempt,
retained as a baseline): that kernel contracts per-shift K=M blocks
([*, 147] minors pad to 256 lanes — measured slower than XLA); this one
keeps the residue-split K=qn*M contraction that beat the per-shift dots in
XLA, with lane-sliced residue operands so no non-aligned minor ever forms.
"""

from __future__ import annotations

import functools

from .._jaxinit import ensure_jax

jax = ensure_jax()
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HALO_T = 8     # halo block tile count (sublane granularity of the 3D spec)


def _fixed_kernel(K_ref, main_ref, halo_ref, P_ref, *rest, M: int,
                  L: int, qn: int, jb: int, interp: bool, split: bool):
    if interp:
        frac_ref, *out_refs = rest
    else:
        out_refs = rest
    g = pl.program_id(1)
    KQ = qn * M
    F0 = main_ref[0]                                    # [jb, KQ]
    # rows shifted by one tile: local block j's "next tile" (the straddle
    # source for residues r > 0) is F0[j+1], except the last, which is the
    # first halo tile
    nxt = jnp.concatenate([F0[1:], halo_ref[0][:1]], axis=0)
    outs = []
    for r in range(qn):
        if r == 0:
            Vr = F0
        else:
            A = jax.lax.slice(F0, (0, r * M), (jb, KQ))
            B = jax.lax.slice(nxt, (0, 0), (jb, r * M))
            Vr = jnp.concatenate([A, B], axis=1)        # [jb, KQ]
        d = jnp.dot(Vr, P_ref[...],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        if interp:
            # dot-then-lerp of the two stacked phase banks (reference
            # subsample_interpolate, resampler.c:1147-1157)
            f = frac_ref[0]                             # [L]
            d = (jax.lax.slice(d, (0, 0), (jb, L)) * (1.0 - f)
                 + jax.lax.slice(d, (0, L), (jb, 2 * L)) * f)
        if split:
            # plan-B layout: residue r goes to its own output ref; block
            # j's global output block is (g*jb + j)*qn + r, interleaved
            # back in XLA by the caller
            jrows = jax.lax.broadcasted_iota(jnp.int32, (jb, L), 0)
            lanes = jax.lax.broadcasted_iota(jnp.int32, (jb, L), 1)
            blk = (g * jnp.int32(jb) + jrows) * jnp.int32(qn) + jnp.int32(r)
            valid = blk * jnp.int32(L) + lanes < K_ref[0]
            out_refs[r][0] = jnp.where(valid, d, jnp.float32(0.0))
        else:
            outs.append(d)
    if split:
        return
    # output block i = j*qn + r  (same interleave as residue_window_dots)
    o = jnp.stack(outs, axis=1).reshape(jb * qn, L)
    row0 = g * jnp.int32(jb * qn)
    rows = jax.lax.broadcasted_iota(jnp.int32, (jb * qn, L), 0) + row0
    lanes = jax.lax.broadcasted_iota(jnp.int32, (jb * qn, L), 1)
    valid = rows * jnp.int32(L) + lanes < K_ref[0]
    out_refs[0][0] = jnp.where(valid, o, jnp.float32(0.0))


@functools.partial(jax.jit, static_argnames=("M", "L", "nb", "qn",
                                             "hist_len", "jb", "interpret",
                                             "split_out"))
def fixed_step_pallas(hist, x, P, start, K, acc, *, M: int, L: int, nb: int,
                      qn: int, hist_len: int, jb: int = 64,
                      interpret: bool = False, fracv=None,
                      split_out: bool = False):
    """Drop-in replacement for parallel.streams._chunk_body (reduced f32
    mode): same signature semantics, same (new_hist, out [ch, nb*L], acc)
    results at the f32 matmul floor.

    With ``fracv`` (per-phase lerp fractions, [L]) this is the interpolated
    body instead (_chunk_body_interp): P stacks the two adjacent phase
    banks [qn*M, 2L] and the lerp runs in-kernel after each residue dot.

    ``split_out``: Mosaic fallback layout — qn separate output refs (one
    per residue, no in-kernel [jb,qn,L]->[jb*qn,L] stack-reshape), the
    interleave restated as an XLA stack+reshape outside the kernel.
    Identical values either way; keep for the case where the fused
    output reshape fails to lower on the remote compiler."""
    if jb % _HALO_T:
        raise ValueError(f"jb must be a multiple of {_HALO_T} (the halo "
                         f"BlockSpec indexes in {_HALO_T}-tile units)")
    ch = x.shape[0]
    KQ = qn * M
    nb_rs = -(-nb // qn) * qn
    njq = nb_rs // qn
    ngrid = -(-njq // jb)
    njq_pad = ngrid * jb
    nt_pad = njq_pad + _HALO_T
    xlen_pad = nt_pad * KQ
    interp = fracv is not None

    buf = jnp.concatenate([hist, x], axis=1)
    pad = jnp.zeros((ch, xlen_pad), dtype=x.dtype)
    win = jax.lax.dynamic_slice(
        jnp.concatenate([buf, pad], axis=1), (jnp.int32(0), start),
        (ch, xlen_pad))
    win3 = win.reshape(ch, nt_pad, KQ)
    Ksc = jnp.asarray(K, jnp.int32).reshape(1)

    L2 = 2 * L if interp else L
    in_specs = [
        pl.BlockSpec((1, jb, KQ), lambda c, g, s: (c, g, 0)),
        pl.BlockSpec((1, _HALO_T, KQ),
                     lambda c, g, s: (c, (g + 1) * (jb // _HALO_T), 0)),
        pl.BlockSpec((KQ, L2), lambda c, g, s: (0, 0)),
    ]
    args = [Ksc, win3, win3, P]
    if interp:
        in_specs.append(pl.BlockSpec((1, L), lambda c, g, s: (0, 0)))
        args.append(fracv.astype(jnp.float32).reshape(1, L))

    if split_out:
        out_specs = [pl.BlockSpec((1, jb, L), lambda c, g, s: (c, g, 0))
                     for _ in range(qn)]
        out_shape = [jax.ShapeDtypeStruct((ch, njq_pad, L), jnp.float32)
                     for _ in range(qn)]
    else:
        out_specs = pl.BlockSpec((1, jb * qn, L), lambda c, g, s: (c, g, 0))
        out_shape = jax.ShapeDtypeStruct((ch, njq_pad * qn, L), jnp.float32)

    with jax.enable_x64(False):                 # Mosaic cannot lower i64/f64
        out3 = pl.pallas_call(
            functools.partial(_fixed_kernel, M=M, L=L, qn=qn, jb=jb,
                              interp=interp, split=split_out),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(ch, ngrid),
                in_specs=in_specs,
                out_specs=out_specs,
            ),
            out_shape=out_shape,
            interpret=interpret,
        )(*args)

    if split_out:
        # interleave residues back: output block j*qn + r
        out3 = jnp.stack(out3, axis=2).reshape(ch, njq_pad * qn, L)
    out = jax.lax.slice(out3, (0, 0, 0), (ch, nb, L)).reshape(ch, nb * L)
    acc = acc + jnp.sum(out * out)
    new_hist = jax.lax.dynamic_slice(
        buf, (0, buf.shape[1] - hist_len), (ch, hist_len))
    return new_hist, out, acc
