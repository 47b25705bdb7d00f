"""Pallas TPU kernels for the hot irregular ops.

The fixed-ratio path runs as plain XLA matmuls (ops/polyphase.py) — the MXU
already eats those.  What XLA lowers poorly is the *drifting-ratio* (ASRC)
windowed dot: each output needs a `T`-sample window at an arbitrary
per-output offset plus a lerp of two phase-bank rows — a gather that XLA
materializes as an [S, K, T] HBM intermediate (measured ~1000x slower than
this kernel).  Here everything stays in VMEM:

  - each grid program owns 8 stream rows (a full [8, B] ring block is a few
    hundred KB of VMEM) and a block of KB outputs,
  - the phase bank (up to [1025, Tp] floats) sits in VMEM shared across the
    grid,
  - per output index the 8 streams' windows are loaded with lane-aligned
    superspans and rotated into place (Mosaic requires aligned vector
    loads), forming [8, Tp] sublane tiles,
  - both adjacent phase dots are accumulated into VMEM scratch; the
    two-phase interpolation runs as one aligned full-block post-pass against
    a pre-transposed fraction block.

Tap dimension is padded to a lane multiple with zero taps (exact zeros in
the dot); stream/output counts are padded to 8 / the block size upstream.
"""

from __future__ import annotations

import functools

from .._jaxinit import ensure_jax

jax = ensure_jax()
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RS = 8         # stream rows per grid program (one sublane tile)
_RK = 16         # consecutive outputs processed per loop step ([RK*RS, Tp]
#                 tiles amortize the scalar addressing overhead; 16 measured
#                 best on v5e: 29.9 -> 35.3 M out/s vs 4)


def _asrc_kernel(base_ref, fi_ref, frac_t_ref, buf_ref, bank_ref, out_ref,
                 d1_ref, d2_ref, *, kb: int, tp: int):
    c128 = jnp.int32(128)
    one = jnp.int32(1)

    def step(it, carry):
        k0 = it * jnp.int32(_RK)
        wins, f1s, f2s = [], [], []
        for r in range(_RK):
            for j in range(_RS):
                b = base_ref[j, k0 + r]
                fi = fi_ref[j, k0 + r]
                # vector loads need lane-aligned starts: load an aligned
                # superspan, rotate the misalignment away (the wrapped tail
                # lands beyond tp and is sliced off)
                b0 = pl.multiple_of((b // c128) * c128, 128)
                span = buf_ref[pl.ds(j, 1), pl.ds(b0, tp + 128)]
                wins.append(pltpu.roll(span, b0 - b, 1)[:, :tp])
                # two 1-row loads: a single sublane-2 dynamic load fails
                # Mosaic lowering for larger (tiled) bank shapes
                f1s.append(bank_ref[pl.ds(fi, 1), :])
                f2s.append(bank_ref[pl.ds(fi + one, 1), :])
        win = jnp.concatenate(wins, axis=0)        # [RK*RS, Tp], k-major
        d1_ref[pl.ds(k0, _RK), :] = jnp.sum(
            win * jnp.concatenate(f1s, axis=0), axis=1).reshape(_RK, _RS)
        d2_ref[pl.ds(k0, _RK), :] = jnp.sum(
            win * jnp.concatenate(f2s, axis=0), axis=1).reshape(_RK, _RS)
        return carry

    # carry pinned to int32: under jax_enable_x64 a weak-int carry becomes
    # int64, which Mosaic cannot lower
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(kb // _RK), step, jnp.int32(0))
    # two-phase interpolation as one aligned block op
    fr = frac_t_ref[0]
    out_ref[0] = d1_ref[:, :] * (1.0 - fr) + d2_ref[:, :] * fr


@functools.partial(jax.jit, static_argnames=("kb", "interpret"))
def asrc_apply_pallas(buf, bank, base, fi, frac, *, kb: int = 512,
                      interpret: bool = False):
    """Batched ASRC windowed-interp dot.

    buf:  [S, B] stream rows (history ++ chunk), S a multiple of 8, B a lane
          multiple with at least Tp + 128 pad samples past the last window
    bank: [F+1, Tp] phase bank, taps zero-padded to a lane multiple
    base/fi/frac: [S, K] window starts, phase indices, lerp fractions;
          K a multiple of kb
    Returns out [S, K] (callers mask K-validity themselves).
    """
    S, B = buf.shape
    K = base.shape[1]
    tp = bank.shape[1]
    assert S % _RS == 0, f"stream count {S} must be a multiple of {_RS}"
    assert K % kb == 0, f"output count {K} must be a multiple of kb={kb}"
    assert B % 128 == 0, f"buffer length {B} must be a lane multiple"
    assert kb % _RK == 0, f"kb={kb} must be a multiple of _RK={_RK}"

    grid = (S // _RS, K // kb)
    scalar_spec = pl.BlockSpec((_RS, kb), lambda s, k: (s, k),
                               memory_space=pltpu.SMEM)
    # the package enables jax_enable_x64 globally; weak-typed literals inside
    # the kernel would trace as 64-bit, which Mosaic cannot lower — all
    # kernel inputs are explicitly 32-bit, so trace the call with x64 off
    with jax.enable_x64(False):
        return _call(S, B, K, tp, kb, grid, scalar_spec, base, fi, frac,
                     buf, bank, interpret)


def _call(S, B, K, tp, kb, grid, scalar_spec, base, fi, frac, buf, bank,
          interpret):
    # frac and out live as [S//8, K, 8] so the minor dim matches the
    # 8-stream grouping exactly (Mosaic block-shape constraint)
    frac3 = frac.reshape(S // _RS, _RS, K).transpose(0, 2, 1)
    out = pl.pallas_call(
        functools.partial(_asrc_kernel, kb=kb, tp=tp),
        grid=grid,
        in_specs=[
            scalar_spec, scalar_spec,
            pl.BlockSpec((1, kb, _RS), lambda s, k: (s, k, 0),
                         memory_space=pltpu.VMEM),      # frac, transposed
            pl.BlockSpec((_RS, B), lambda s, k: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bank.shape, lambda s, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kb, _RS), lambda s, k: (s, k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S // _RS, K, _RS), buf.dtype),
        scratch_shapes=[pltpu.VMEM((kb, _RS), buf.dtype),
                        pltpu.VMEM((kb, _RS), buf.dtype)],
        interpret=interpret,
    )(base, fi, frac3, buf, bank)
    return out.transpose(0, 2, 1).reshape(S, K)


# --------------------------------------------------------------- polyphase

_TB = 512       # output block-rows per grid program


def _poly_kernel(xa_ref, xb_ref, P_ref, out_ref, *, qn: int):
    """One tile of the fixed-ratio polyphase matmul.

    xa: [ch, TB, M] this tile's stride-M-reshaped inputs; xb: the next tile
    (halo source, first qn rows used); P: [qn, M, L] per-shift block
    matrices; out: [ch, TB, L].  Each shift q contributes one MXU matmul
    X_q[ch, TB, M] @ P[q] — no in-kernel reshapes (Mosaic cannot shape-cast
    non-lane-aligned minors).
    """
    span = jnp.concatenate([xa_ref[:, :, :], xb_ref[:, :qn, :]], axis=1)
    acc = None
    for q in range(qn):
        part = jax.lax.dot_general(
            span[:, q:q + _TB, :], P_ref[q],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=span.dtype,
            precision=jax.lax.Precision.HIGHEST)
        acc = part if acc is None else acc + part
    out_ref[:, :, :] = acc


@functools.partial(jax.jit, static_argnames=("M", "qn", "L", "interpret"))
def polyphase_apply_pallas(win, P, *, M: int, qn: int, L: int,
                           interpret: bool = False):
    """Fixed-ratio steady-state resample of a pre-aligned window buffer.

    win: [ch, nb_pad*M] where nb_pad is a multiple of _TB and the buffer has
    one extra zero tile beyond the data (the halo source for the last tile);
    P: [qn*M, L].  Returns out [ch, nb_pad, L] (flatten + trim upstream).

    NOTE: measured slower than the XLA einsum path (streams._chunk_step) on
    v5e — the M=147 minor pads to 256 lanes (2x load waste) and the
    per-shift matmuls contract over only 147 elements.  Retained as a
    correctness-verified baseline for future layout tuning; production uses
    the einsum.
    """
    ch, wlen = win.shape
    nb_pad = wlen // M - _TB          # last _TB block-rows are the zero tile
    assert nb_pad % _TB == 0
    grid = (nb_pad // _TB,)
    win3 = win.reshape(ch, wlen // M, M)
    P3 = P.reshape(qn, M, L)

    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(_poly_kernel, qn=qn),
            grid=grid,
            in_specs=[
                pl.BlockSpec((ch, _TB, M), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ch, _TB, M), lambda i: (0, i + 1, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(P3.shape, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ch, _TB, L), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ch, nb_pad, L), win.dtype),
            interpret=interpret,
        )(win3, win3, P3)


def pad_bank_for_pallas(bank: np.ndarray) -> np.ndarray:
    """Zero-pad the tap dimension to a lane multiple (128)."""
    f, t = bank.shape
    tp = -(-t // 128) * 128
    out = np.zeros((f, tp), dtype=bank.dtype)
    out[:, :t] = bank
    return out
