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
import math

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


# ------------------------------------------------------- dense ASRC kernel
#
# v2 of the ASRC kernel.  The v1 kernel above is per-output: every output
# pays a sublane-1 span load + roll + two sublane-1 bank-row loads, so it is
# issue-bound at ~1/8 vector density.  This kernel is full-density: all
# per-output irregularity is expressed through the two Mosaic dynamic_gather
# forms (sublane-gather from an 8-row table at any width; lane-gather within
# 128-lane vreg blocks at any height) plus one tiny MXU matmul, so every op
# works on full vregs.  Measured 3.5x the v1 kernel on the same chip/day
# (tools/exp_asrc_v3.py).
#
# Per (8-stream block, 128-output tile), for each stream j:
#   seg       = buf[j, tb : tb + SEGL]          (tb lane-aligned, from SMEM)
#   segshift  = 8 static slices seg[128c : 128c + TP+128]        [8, TP+128]
#   coarse    = onehot(rel >> 7) @ segshift   (MXU, K=8)       [128, TP+128]
#   win       = per-128-lane-block lane-gathers by rel & 127
#               + boundary selects                                 [128, TP]
#   F1/F2     = lane-gathers from the transposed bank (lanes = phases,
#               NC 128-lane blocks, NC-deep select); the fi+1 row comes from
#               a pre-shifted second table so index/masks are shared
#   out[j]    = sublane-sum(win.T * (F1 (1-frac) + F2 frac))
#
# The fractional read positions are the same fl(offset + fl(k/ratio))
# float64 sequence as the host accounting (reference resampler.c:526);
# the f64 prologue, window-base tiling and validity masking are fused into
# the same jit (asrc_step_dense) so a process() call is one dispatch.

_KB = 128       # default outputs per (stream, tile); asrc_step_dense's
#                 kb static arg can raise it (256 needs segl >= tp + 1024)


def _dense_windows(seg, rel_col, lane128, lane8, tp: int):
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


def _dense_bank_rows(bankT, idx, masks):
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


def _asrc_dense_kernel(relc_ref, fir_ref, frr_ref, buf_ref, tb_ref,
                       bankT_ref, bankT2_ref, out_ref, *, tp: int,
                       segl: int, kb: int):
    """All 8 streams of the program batched into single [8*kb, .] tiles:
    one one-hot MXU matmul aligns every window coarsely, one set of
    lane-gathers extracts all windows, one transpose and one dot close the
    tile.  Measured 1.8x the per-stream-looped structure same-process
    (tools/exp_batch8.py) — per-op invocation overhead dominates at these
    tile sizes.  Filter gathers stay chunked per 128 output lanes: Mosaic
    lane-gathers allow a single source vreg along the gather dimension."""
    t = pl.program_id(0)
    r8 = 8 * kb
    sw = tp + 128
    nshift = (segl - sw) // 128 + 1
    nc = bankT_ref.shape[1] // 128

    # per-stream segments -> one [64, sw] shift table (8 rows per stream,
    # unused rows duplicated; the one-hot below never addresses them)
    segs = []
    for j in range(8):
        start = pl.multiple_of(tb_ref[j, t], 128)
        seg = buf_ref[pl.ds(j, 1), pl.ds(start, segl)]
        segs.extend(seg[:, 128 * c:128 * c + sw]
                    for c in range(min(nshift, 8)))
        segs.extend([seg[:, :sw]] * max(0, 8 - nshift))
    segshift = jnp.concatenate(segs, axis=0)               # [64, sw]

    rel = relc_ref[0, 0, :, :]                             # [r8, 1]
    a = jax.lax.shift_right_logical(rel, 7)
    sid = jax.lax.broadcasted_iota(jnp.int32, (r8, 1), 0)
    # stream of row r is r // kb (kb is a power of two)
    colidx = jax.lax.shift_right_logical(
        sid, int(math.log2(kb))) * 8 + a
    lane64 = jax.lax.broadcasted_iota(jnp.int32, (r8, 64), 1)
    onehot = (colidx == lane64).astype(buf_ref.dtype)
    coarse = jax.lax.dot_general(
        onehot, segshift, (((1,), (0,)), ((), ())),
        preferred_element_type=buf_ref.dtype,
        precision=jax.lax.Precision.HIGHEST)               # [r8, sw]

    b = jnp.bitwise_and(rel, 127)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (r8, 128), 1)
    idxf = jnp.bitwise_and(b + lane128, 127)
    nu = tp // 128
    g = [jnp.take_along_axis(coarse[:, 128 * u:128 * (u + 1)], idxf,
                             axis=1, mode="promise_in_bounds")
         for u in range(nu + 1)]
    mask = lane128 < (128 - b)
    win = jnp.concatenate(
        [jnp.where(mask, g[u], g[u + 1]) for u in range(nu)], axis=1)
    winT = win.T                                           # [tp, r8]

    fi = fir_ref[0, 0, :, :]                               # [1, r8]
    c = jax.lax.shift_right_logical(fi, 7)
    f1c, f2c = [], []
    for h in range(r8 // 128):
        sl = slice(128 * h, 128 * (h + 1))
        idx_h = jnp.broadcast_to(jnp.bitwise_and(fi[:, sl], 127),
                                 (tp, 128))
        p1 = [jnp.take_along_axis(bankT_ref[:, 128 * u:128 * (u + 1)],
                                  idx_h, axis=1,
                                  mode="promise_in_bounds")
              for u in range(nc)]
        p2 = [jnp.take_along_axis(bankT2_ref[:, 128 * u:128 * (u + 1)],
                                  idx_h, axis=1,
                                  mode="promise_in_bounds")
              for u in range(nc)]
        o1, o2 = p1[nc - 1], p2[nc - 1]
        for u in range(nc - 2, -1, -1):
            m = jnp.broadcast_to(c[:, sl] == u, (tp, 128))
            o1 = jnp.where(m, p1[u], o1)
            o2 = jnp.where(m, p2[u], o2)
        f1c.append(o1)
        f2c.append(o2)
    f1 = f1c[0] if len(f1c) == 1 else jnp.concatenate(f1c, axis=1)
    f2 = f2c[0] if len(f2c) == 1 else jnp.concatenate(f2c, axis=1)
    fr = frr_ref[0, 0, :, :]                               # [1, r8]
    w = f1 * (1.0 - fr) + f2 * fr                          # [tp, r8]
    out_ref[0, 0, :, :] = jnp.sum(winT * w, axis=0, keepdims=True)


def dense_bank_tables(bank: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Transpose the [F+1, taps] phase bank into the two lane-padded tables
    the dense kernel gathers from: bankT[t, f] = bank[f, t] and
    bankT2[t, f] = bank[f+1, t] (so the fi+1 row shares fi's gather index).
    Taps pad to a 128 multiple, phases to a 128 multiple."""
    fp1, taps = bank.shape
    tp = -(-taps // 128) * 128
    nc = -(-fp1 // 128)
    bankT = np.zeros((tp, nc * 128), dtype=bank.dtype)
    bankT2 = np.zeros((tp, nc * 128), dtype=bank.dtype)
    bankT[:taps, :fp1] = bank.T
    bankT2[:taps, :fp1 - 1] = bank[1:].T
    return bankT, bankT2


# ---- double-single (pairs of f32) position arithmetic.  XLA's emulated
# float64 on TPU costs ~2 ms per 512K positions; these hand-rolled pair
# ops run at native f32 vector rates (~50 flops/element).  The resulting
# positions agree with the host's f64 fl(offset + fl(k/ratio)) sequence to
# ~2^-45 relative (~3e-11 samples at chunk scale) — and a phase perturbed
# by d is value-continuous (a filter-index flip comes with a compensating
# fraction; window flips wrap through the rotated extra filter), so the
# sample-level impact is O(d), far below the f32 matmul floor.  Emission
# counts and validity masks remain exact host-side float64 (Ks).
# FMA contraction only tightens these error terms (fused a*b-p is the
# exact product error), so no rounding barriers are needed.

def _two_sum(a, b):
    s = a + b
    t = s - a
    return s, (a - (s - t)) + (b - t)


def _split_f32(a):
    c = a * 4097.0                       # 2^12 + 1 Dekker split
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split_f32(a)
    bh, bl = _split_f32(b)
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


def split_f64_pairs(x64: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host-side exact split of float64 values into (hi, lo) float32."""
    hi = np.asarray(x64, np.float64).astype(np.float32)
    lo = (np.asarray(x64, np.float64) - hi.astype(np.float64)) \
        .astype(np.float32)
    return hi, lo


def pack_step_scalars(off_hi, off_lo, y_hi, y_lo, Ks, shift):
    """Bundle the per-call scalars into two arrays (scal f32 [4, S], ints
    i32 [2, S]) so a process() call ships TWO small host->device transfers
    instead of six — each transfer pays tunnel dispatch latency."""
    scal = np.stack([off_hi, off_lo, y_hi, y_lo]).astype(np.float32)
    ints = np.stack([np.asarray(Ks, np.int32),
                     np.full(len(Ks), shift, np.int32)])
    return scal, ints


@functools.partial(jax.jit, static_argnames=(
    "num_taps", "num_filters", "k_max", "kp", "hist_len", "tp", "segl",
    "kb", "interpret"))
def asrc_step_dense(hist, x, bankT, bankT2, scal, ints,
                    num_taps: int, num_filters: int, k_max: int, kp: int,
                    hist_len: int, tp: int, segl: int, kb: int = _KB,
                    interpret: bool = False):
    """One fused batched-ASRC chunk on the dense kernel: double-single
    position prologue + window-base tiling + pallas call + validity mask,
    one dispatch.  hist [S, H]; x [S, n]; scal f32 [4, S] = split offsets
    (hi, lo) ++ split reciprocal ratios (hi, lo) (pack_step_scalars);
    ints i32 [2, S] = (Ks, shift).  kp = k_max padded to a _KB multiple.
    Returns (new_hist, out [S, k_max]) with k >= Ks zeroed."""
    S = x.shape[0]
    off_hi, off_lo, y_hi, y_lo = scal[0], scal[1], scal[2], scal[3]
    Ks, shift = ints[0], ints[1][:, None]
    half = num_taps // 2
    buf = jnp.concatenate([hist, x], axis=1)
    blen = buf.shape[1]
    pad = (-(-(blen + segl + 128) // 128) * 128) - blen
    bufp = jnp.concatenate([buf, jnp.zeros((S, pad), dtype=x.dtype)], axis=1)

    f32 = jnp.float32
    k = jnp.arange(kp, dtype=f32)[None, :]            # exact (kp < 2^23)
    # q = k * (1/ratio) in double-single
    qh, qe = _two_prod(k, y_hi[:, None].astype(f32))
    qh, ql = _two_sum(qh, qe + k * y_lo[:, None].astype(f32))
    # pos = offset + q
    ph, pe = _two_sum(off_hi[:, None].astype(f32), qh)
    ph, plo = _two_sum(ph, pe + (off_lo[:, None].astype(f32) + ql))
    ip = jnp.floor(ph)
    r0, r1 = _two_sum(ph - ip, plo)                   # ph - ip is exact
    neg = (r0 < 0).astype(f32)
    ovf = (r0 >= 1).astype(f32)
    ip = ip - neg + ovf
    r0 = r0 + neg - ovf
    # ff = frac * num_filters in double-single
    Ff = f32(num_filters)
    fh, fe = _two_prod(r0, Ff)
    fh, fl_ = _two_sum(fh, fe + r1 * Ff)
    fif = jnp.floor(fh)
    t = (fh - fif) + fl_
    tneg = (t < 0).astype(f32)
    tovf = (t >= 1).astype(f32)
    fif = fif - tneg + tovf
    t = t + tneg - tovf
    fi = jnp.clip(fif.astype(jnp.int32), 0, num_filters - 1)
    # mirror the host decompose guard: an index pinned at the clamp edge
    # keeps the continuous phase via its fraction
    t = jnp.where(fif.astype(jnp.int32) > fi, jnp.asarray(1.0, f32),
                  jnp.where(fif.astype(jnp.int32) < fi,
                            jnp.asarray(0.0, f32), t))
    frac = t.astype(x.dtype)
    base = ip.astype(jnp.int32) - half + 1 + shift

    nt = kp // kb
    kmask = (jnp.arange(kp, dtype=jnp.int32) < k_max)[None, :]
    base = jnp.where(kmask, jnp.clip(base, 0, blen + pad - segl), 0)
    fi = jnp.where(kmask, fi, 0)
    frac = jnp.where(kmask, frac, jnp.asarray(0, x.dtype))

    base_t = base.reshape(S, nt, kb)
    # masked entries carry base 0 and must not drag the tile minimum below
    # the valid windows (a partial final tile would clip rel to garbage)
    kbig = jnp.where(kmask, base, jnp.int32(2**30)).reshape(S, nt, kb)
    tb = jnp.min(kbig, axis=2)
    tb = jnp.clip(tb - (tb % 128), 0, blen + pad - segl)    # lane-aligned
    rel = jnp.clip(base_t - tb[:, :, None], 0, segl - tp - 1)

    # batched layouts: within each 8-stream block, r = j*kb + k
    r8 = 8 * kb
    relc = rel.reshape(S // 8, 8, nt, kb).transpose(2, 0, 1, 3) \
        .reshape(nt, S // 8, r8, 1)
    fi_b = fi.reshape(S // 8, 8, nt, kb).transpose(2, 0, 1, 3) \
        .reshape(nt, S // 8, 1, r8)
    frac_b = frac.reshape(S // 8, 8, nt, kb).transpose(2, 0, 1, 3) \
        .reshape(nt, S // 8, 1, r8)

    blk4 = lambda t, s: (t, s, 0, 0)
    with jax.enable_x64(False):
        out4 = pl.pallas_call(
            functools.partial(_asrc_dense_kernel, tp=tp, segl=segl, kb=kb),
            grid=(nt, S // 8),
            in_specs=[
                pl.BlockSpec((1, 1, r8, 1), blk4, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, r8), blk4, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, r8), blk4, memory_space=pltpu.VMEM),
                pl.BlockSpec((8, bufp.shape[1]), lambda t, s: (s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, nt), lambda t, s: (s, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(bankT.shape, lambda t, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(bankT.shape, lambda t, s: (0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, 1, r8), blk4,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nt, S // 8, 1, r8), x.dtype),
            # batched tiles exceed the 16 MB scoped-vmem compiler default
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(relc, fi_b, frac_b, bufp, tb.astype(jnp.int32), bankT, bankT2)

    out = out4.reshape(nt, S // 8, 8, kb).transpose(1, 2, 0, 3) \
        .reshape(S, kp)[:, :k_max]
    valid = (jnp.arange(k_max, dtype=jnp.int32)[None, :] < Ks[:, None])
    out = out * valid.astype(out.dtype)
    new_hist = buf[:, blen - hist_len:]
    return new_hist, out


# ------------------------------------------------------- Hankel ASRC kernel
#
# v3 of the ASRC kernel, specialized to the ASRC's home regime: per-call
# ratios near 1.0 (BASELINE config 5 drifts +-1%; a real ASRC feedback loop
# drifts +-hundreds of ppm).  There the window base advances by ~1 input
# sample per output, so base_k - k is a small monotone staircase
# carry_k in [0, smax] above a per-tile floor c0.  That kills the three
# most expensive stages of the dense kernel at once (measured same-day by
# tools/exp_asrc_ablate.py: window fine-gathers ~2.9 ms, gather-output
# transpose ~2.6 ms, coarse one-hot matmul, of 7.96 ms per 512K outputs):
#
#   - the window matrix is a Hankel matrix B[t, k] = seg[rel + t + k]
#     built from ONE aligned segment with 8 static row-rotations plus one
#     lane-rotation per 8-row block - full-vreg ops, no gathers, and the
#     result comes out sublane-major so the final dot needs NO transpose,
#   - the per-output carry is applied to the *filter* side: pad the lerped
#     filter block [tp, 8kb] with smax zero rows and select among smax+1
#     sublane-rotated copies (a few full-density passes),
#   - the filter phase gathers are unchanged (they measured only ~1.4 ms).
#
# Calls whose ratios fall outside |1/ratio - 1| <= smax/(kb-1) fall back to
# the dense kernel (engine-side check), which remains the general path.

def _asrc_hankel_kernel(carry_ref, fir_ref, frr_ref, buf_ref, tb_ref,
                        rel_ref, bankT_ref, bankT2_ref, out_ref, *,
                        tp: int, smax: int, segl: int, kb: int):
    t = pl.program_id(0)
    r8 = 8 * kb
    nc = bankT_ref.shape[1] // 128
    tpx = -(-(tp + smax) // 8) * 8       # B rows, 8-aligned; >= tp + smax

    # ---- filter side: same phase gathers as the dense kernel ([tp, r8])
    fi = fir_ref[0, 0, :, :]                               # [1, r8]
    c = jax.lax.shift_right_logical(fi, 7)
    f1c, f2c = [], []
    for h in range(r8 // 128):
        sl = slice(128 * h, 128 * (h + 1))
        idx_h = jnp.broadcast_to(jnp.bitwise_and(fi[:, sl], 127),
                                 (tp, 128))
        p1 = [jnp.take_along_axis(bankT_ref[:, 128 * u:128 * (u + 1)],
                                  idx_h, axis=1,
                                  mode="promise_in_bounds")
              for u in range(nc)]
        p2 = [jnp.take_along_axis(bankT2_ref[:, 128 * u:128 * (u + 1)],
                                  idx_h, axis=1,
                                  mode="promise_in_bounds")
              for u in range(nc)]
        o1, o2 = p1[nc - 1], p2[nc - 1]
        for u in range(nc - 2, -1, -1):
            m = jnp.broadcast_to(c[:, sl] == u, (tp, 128))
            o1 = jnp.where(m, p1[u], o1)
            o2 = jnp.where(m, p2[u], o2)
        f1c.append(o1)
        f2c.append(o2)
    f1 = f1c[0] if len(f1c) == 1 else jnp.concatenate(f1c, axis=1)
    f2 = f2c[0] if len(f2c) == 1 else jnp.concatenate(f2c, axis=1)
    fr = frr_ref[0, 0, :, :]                               # [1, r8]
    w = f1 * (1.0 - fr) + f2 * fr                          # [tp, r8]

    # ---- carry: w2[t] = w[t - carry_k], applied as the BINARY expansion
    # of carry (per-column conditional rolls compose: the total sublane
    # rotation of column k is the sum of its selected bits = carry_k) —
    # ceil(log2(smax+1)) roll+select passes instead of smax, which makes
    # wide-drift tiers (smax 16/32) nearly as cheap as smax=4.  Pure data
    # movement: results identical to the linear form.
    wpad = jnp.concatenate(
        [w, jnp.zeros((tpx - tp, r8), dtype=w.dtype)], axis=0)  # [tpx, r8]
    carry = carry_ref[0, 0, :, :]                          # [1, r8] i32
    w2 = wpad
    bit = 1
    while bit <= smax:
        m = jnp.broadcast_to((carry & bit) != 0, (tpx, r8))
        w2 = jnp.where(m, pltpu.roll(w2, bit, 0), w2)
        bit <<= 1

    # ---- window side: per-stream Hankel bands, accumulated in place
    acc = None
    for j in range(8):
        start = pl.multiple_of(tb_ref[j, t], 128)
        seg = buf_ref[pl.ds(j, 1), pl.ds(start, segl)]     # [1, segl]
        # left-rotations expressed as (width - s) right-rotations (pltpu.roll
        # requires non-negative static shifts)
        C = jnp.concatenate(
            [seg] + [pltpu.roll(seg, segl - s, 1) for s in range(1, 8)],
            axis=0)                                        # [8, segl]
        C2 = pltpu.roll(C, jnp.int32(segl) - rel_ref[j, t], 1)
        parts = []
        for a in range(tpx // 8):
            band = (C2 if a == 0
                    else pltpu.roll(C2, segl - 8 * a, 1))[:, :kb]  # [8, kb]
            wband = w2[8 * a:8 * (a + 1), kb * j:kb * (j + 1)]
            parts.append(jnp.sum(band * wband, axis=0, keepdims=True))
        colsum = parts[0]
        for p in parts[1:]:
            colsum = colsum + p
        acc = colsum if acc is None else jnp.concatenate([acc, colsum],
                                                         axis=1)
    out_ref[0, 0, :, :] = acc


@functools.partial(jax.jit, static_argnames=(
    "num_taps", "num_filters", "k_max", "kp", "hist_len", "tp", "segl",
    "kb", "smax", "interpret"))
def asrc_step_hankel(hist, x, bankT, bankT2, scal, ints,
                     num_taps: int, num_filters: int, k_max: int, kp: int,
                     hist_len: int, tp: int, segl: int, kb: int = 128,
                     smax: int = 4, interpret: bool = False):
    """One fused batched-ASRC chunk on the Hankel kernel (near-1 ratios):
    double-single position prologue + per-tile (floor, rel, carry)
    decomposition + pallas call + validity mask, one dispatch.  Same
    contract as asrc_step_dense; caller must guarantee
    ceil(|1/ratio - 1| * (kb - 1)) <= smax for every stream."""
    S = x.shape[0]
    off_hi, off_lo, y_hi, y_lo = scal[0], scal[1], scal[2], scal[3]
    Ks, shift = ints[0], ints[1][:, None]
    half = num_taps // 2
    buf = jnp.concatenate([hist, x], axis=1)
    blen = buf.shape[1]
    pad = (-(-(blen + segl + 128) // 128) * 128) - blen
    bufp = jnp.concatenate([buf, jnp.zeros((S, pad), dtype=x.dtype)], axis=1)

    f32 = jnp.float32
    k = jnp.arange(kp, dtype=f32)[None, :]            # exact (kp < 2^23)
    qh, qe = _two_prod(k, y_hi[:, None].astype(f32))
    qh, ql = _two_sum(qh, qe + k * y_lo[:, None].astype(f32))
    ph, pe = _two_sum(off_hi[:, None].astype(f32), qh)
    ph, plo = _two_sum(ph, pe + (off_lo[:, None].astype(f32) + ql))
    ip = jnp.floor(ph)
    r0, r1 = _two_sum(ph - ip, plo)
    neg = (r0 < 0).astype(f32)
    ovf = (r0 >= 1).astype(f32)
    ip = ip - neg + ovf
    r0 = r0 + neg - ovf
    Ff = f32(num_filters)
    fh, fe = _two_prod(r0, Ff)
    fh, fl_ = _two_sum(fh, fe + r1 * Ff)
    fif = jnp.floor(fh)
    t = (fh - fif) + fl_
    tneg = (t < 0).astype(f32)
    tovf = (t >= 1).astype(f32)
    fif = fif - tneg + tovf
    t = t + tneg - tovf
    fi = jnp.clip(fif.astype(jnp.int32), 0, num_filters - 1)
    t = jnp.where(fif.astype(jnp.int32) > fi, jnp.asarray(1.0, f32),
                  jnp.where(fif.astype(jnp.int32) < fi,
                            jnp.asarray(0.0, f32), t))
    frac = t.astype(x.dtype)
    base = ip.astype(jnp.int32) - half + 1 + shift

    nt = kp // kb
    kmask = (jnp.arange(kp, dtype=jnp.int32) < k_max)[None, :]
    hib = blen + pad - segl
    base = jnp.clip(base, 0, hib)
    fi = jnp.where(kmask, fi, 0)
    frac = jnp.where(kmask, frac, jnp.asarray(0, x.dtype))

    # per-tile staircase decomposition: d = base - k_local; the tile floor
    # c0 aligns to a lane multiple (tb) + in-segment offset rel in [0,128)
    klocal = jnp.tile(jnp.arange(kb, dtype=jnp.int32), nt)[None, :]
    d = jnp.clip(base - klocal, 0, hib)
    dbig = jnp.where(kmask, d, jnp.int32(2**30)).reshape(S, nt, kb)
    c0 = jnp.min(dbig, axis=2)                        # [S, nt]
    c0 = jnp.clip(c0, 0, hib)
    tb = jnp.clip(c0 - (c0 % 128), 0, hib)
    rel = c0 - tb
    carry = jnp.clip(d.reshape(S, nt, kb) - c0[:, :, None], 0, smax)

    r8 = 8 * kb
    carry_b = carry.reshape(S // 8, 8, nt, kb).transpose(2, 0, 1, 3) \
        .reshape(nt, S // 8, 1, r8)
    fi_b = fi.reshape(S // 8, 8, nt, kb).transpose(2, 0, 1, 3) \
        .reshape(nt, S // 8, 1, r8)
    frac_b = frac.reshape(S // 8, 8, nt, kb).transpose(2, 0, 1, 3) \
        .reshape(nt, S // 8, 1, r8)

    blk4 = lambda t, s: (t, s, 0, 0)
    with jax.enable_x64(False):
        out4 = pl.pallas_call(
            functools.partial(_asrc_hankel_kernel, tp=tp, smax=smax,
                              segl=segl, kb=kb),
            grid=(nt, S // 8),
            in_specs=[
                pl.BlockSpec((1, 1, 1, r8), blk4, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, r8), blk4, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, r8), blk4, memory_space=pltpu.VMEM),
                pl.BlockSpec((8, bufp.shape[1]), lambda t, s: (s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, nt), lambda t, s: (s, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((8, nt), lambda t, s: (s, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(bankT.shape, lambda t, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(bankT.shape, lambda t, s: (0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, 1, r8), blk4,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nt, S // 8, 1, r8), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(carry_b, fi_b, frac_b, bufp, tb.astype(jnp.int32),
          rel.astype(jnp.int32), bankT, bankT2)

    out = out4.reshape(nt, S // 8, 8, kb).transpose(1, 2, 0, 3) \
        .reshape(S, kp)[:, :k_max]
    valid = (jnp.arange(k_max, dtype=jnp.int32)[None, :] < Ks[:, None])
    out = out * valid.astype(out.dtype)
    new_hist = buf[:, blen - hist_len:]
    return new_hist, out


# ---------------------------------------------- double-single Hankel (f64)
#
# The ART64 analog of the ASRC flagship: f64 audio processed as paired-f32
# (hi, lo) planes with double-single arithmetic inside the same Hankel
# structure — Mosaic cannot lower f64, and the XLA f64 gather step measured
# 0.04 M out/s (emulated-f64 gathers).  Error class: every product carries
# its exact f32 error (Dekker two_prod) plus the hi*lo cross terms, and
# both accumulator channels are compensated (two_sum), so the result
# agrees with the host float64 engine to ~2^-43 relative — far below any
# audio requirement and the same class as the position machinery.

def _ds_prod(ah, al, bh, bl):
    """(ah+al)*(bh+bl) as an unnormalized (p, e) pair, al*bl dropped."""
    p, e = _two_prod(ah, bh)
    return p, e + (ah * bl + al * bh)


def _asrc_hankel_ds_kernel(carry_ref, fir_ref, frh_ref, frl_ref, bufh_ref,
                           bufl_ref, tb_ref, rel_ref, bTh_ref, bTl_ref,
                           bT2h_ref, bT2l_ref, outh_ref, outl_ref, *,
                           tp: int, smax: int, segl: int, kb: int,
                           fold_low: bool = False):
    t = pl.program_id(0)
    r8 = 8 * kb
    nc = bTh_ref.shape[1] // 128
    tpx = -(-(tp + smax) // 8) * 8

    # ---- filter side: phase gathers on all four planes
    fi = fir_ref[0, 0, :, :]
    c = jax.lax.shift_right_logical(fi, 7)
    planes = {k: [] for k in range(4)}
    refs = (bTh_ref, bTl_ref, bT2h_ref, bT2l_ref)
    for h in range(r8 // 128):
        sl = slice(128 * h, 128 * (h + 1))
        idx_h = jnp.broadcast_to(jnp.bitwise_and(fi[:, sl], 127),
                                 (tp, 128))
        sel = [jnp.broadcast_to(c[:, sl] == u, (tp, 128))
               for u in range(nc - 1)]
        for k, ref in enumerate(refs):
            p = [jnp.take_along_axis(ref[:, 128 * u:128 * (u + 1)], idx_h,
                                     axis=1, mode="promise_in_bounds")
                 for u in range(nc)]
            o = p[nc - 1]
            for u in range(nc - 2, -1, -1):
                o = jnp.where(sel[u], p[u], o)
            planes[k].append(o)
    f1h, f1l, f2h, f2l = (
        planes[k][0] if len(planes[k]) == 1
        else jnp.concatenate(planes[k], axis=1) for k in range(4))

    # lerp w = f1 + fr*(f2 - f1) in double-single
    frh = frh_ref[0, 0, :, :]
    frl = frl_ref[0, 0, :, :]
    dh, de = _two_sum(f2h, -f1h)
    dl = de + (f2l - f1l)
    mh, me = _ds_prod(dh, dl, frh, frl)
    wh, we = _two_sum(f1h, mh)
    wl = we + (f1l + me)

    # ---- carry: both planes shift together (binary carry expansion —
    # see _asrc_hankel_kernel: log2(smax) roll+select passes, identical
    # data movement)
    zpad = jnp.zeros((tpx - tp, r8), dtype=wh.dtype)
    wh = jnp.concatenate([wh, zpad], axis=0)
    wl = jnp.concatenate([wl, zpad], axis=0)
    carry = carry_ref[0, 0, :, :]
    w2h, w2l = wh, wl
    bit = 1
    while bit <= smax:
        m = jnp.broadcast_to((carry & bit) != 0, (tpx, r8))
        w2h = jnp.where(m, pltpu.roll(w2h, bit, 0), w2h)
        w2l = jnp.where(m, pltpu.roll(w2l, bit, 0), w2l)
        bit <<= 1

    # ---- window Hankel bands on both planes + compensated dot
    acc_h_cols, acc_l_cols = [], []
    for j in range(8):
        start = pl.multiple_of(tb_ref[j, t], 128)
        segh = bufh_ref[pl.ds(j, 1), pl.ds(start, segl)]
        segl_ = bufl_ref[pl.ds(j, 1), pl.ds(start, segl)]
        Ch = jnp.concatenate(
            [segh] + [pltpu.roll(segh, segl - s, 1) for s in range(1, 8)],
            axis=0)
        Cl = jnp.concatenate(
            [segl_] + [pltpu.roll(segl_, segl - s, 1) for s in range(1, 8)],
            axis=0)
        sh = jnp.int32(segl) - rel_ref[j, t]
        C2h = pltpu.roll(Ch, sh, 1)
        C2l = pltpu.roll(Cl, sh, 1)
        ah = al = None
        for a in range(tpx // 8):
            bh = (C2h if a == 0 else pltpu.roll(C2h, segl - 8 * a, 1))[:, :kb]
            bl = (C2l if a == 0 else pltpu.roll(C2l, segl - 8 * a, 1))[:, :kb]
            wbh = w2h[8 * a:8 * (a + 1), kb * j:kb * (j + 1)]
            wbl = w2l[8 * a:8 * (a + 1), kb * j:kb * (j + 1)]
            ph, pe = _ds_prod(bh, bl, wbh, wbl)
            if ah is None:
                ah, al = ph, pe
            elif fold_low:
                # the low channel accumulates plainly: its magnitude is
                # ~2^-24 of the high channel, so dropping its own rounding
                # costs ~2^-48 of the result — accuracy measured identical
                # on-chip, but throughput NEUTRAL (0.994x, exp_ds_fold.py:
                # the kernel is gather/roll-bound, not VPU-add-bound), so
                # the compensated form stays the default
                s_, e1 = _two_sum(ah, ph)
                ah, al = s_, al + (pe + e1)
            else:
                s_, e1 = _two_sum(ah, ph)
                t_, _e2 = _two_sum(al, pe + e1)
                ah, al = s_, t_
        # 8-row tree reduction; high channel stays compensated
        while ah.shape[0] > 1:
            half = ah.shape[0] // 2
            s_, e1 = _two_sum(ah[:half], ah[half:])
            if fold_low:
                ah, al = s_, al[:half] + (al[half:] + e1)
            else:
                t_, _e2 = _two_sum(al[:half], al[half:] + e1)
                ah, al = s_, t_
        acc_h_cols.append(ah)
        acc_l_cols.append(al)
    outh_ref[0, 0, :, :] = jnp.concatenate(acc_h_cols, axis=1)
    outl_ref[0, 0, :, :] = jnp.concatenate(acc_l_cols, axis=1)


@functools.partial(jax.jit, static_argnames=(
    "num_taps", "num_filters", "k_max", "kp", "hist_len", "tp", "segl",
    "kb", "smax", "interpret", "fold_low"))
def asrc_step_hankel_ds(hist, x, bTh, bTl, bT2h, bT2l, scal, ints,
                        num_taps: int, num_filters: int, k_max: int,
                        kp: int, hist_len: int, tp: int, segl: int,
                        kb: int = 128, smax: int = 4,
                        interpret: bool = False, fold_low: bool = False):
    """One fused f64 batched-ASRC chunk on the double-single Hankel kernel.
    hist/x float64; bank tables pre-split into f32 planes
    (dense_bank_tables_ds).  Same contract as asrc_step_hankel; output
    float64 (hi+lo), ~2^-43 relative of the host f64 engine."""
    S = x.shape[0]
    off_hi, off_lo, y_hi, y_lo = scal[0], scal[1], scal[2], scal[3]
    Ks, shift = ints[0], ints[1][:, None]
    half = num_taps // 2
    buf = jnp.concatenate([hist, x], axis=1)
    blen = buf.shape[1]
    pad = (-(-(blen + segl + 128) // 128) * 128) - blen
    bufp = jnp.concatenate([buf, jnp.zeros((S, pad), dtype=buf.dtype)],
                           axis=1)
    bufh = bufp.astype(jnp.float32)
    bufl = (bufp - bufh.astype(jnp.float64)).astype(jnp.float32)

    f32 = jnp.float32
    k = jnp.arange(kp, dtype=f32)[None, :]
    qh, qe = _two_prod(k, y_hi[:, None].astype(f32))
    qh, ql = _two_sum(qh, qe + k * y_lo[:, None].astype(f32))
    ph, pe = _two_sum(off_hi[:, None].astype(f32), qh)
    ph, plo = _two_sum(ph, pe + (off_lo[:, None].astype(f32) + ql))
    ip = jnp.floor(ph)
    r0, r1 = _two_sum(ph - ip, plo)
    neg = (r0 < 0).astype(f32)
    ovf = (r0 >= 1).astype(f32)
    ip = ip - neg + ovf
    # the +-1 wrap must preserve the pair's low bits: a plain r0 +- 1
    # rounds at ulp(1) ~ 6e-8 and silently drops that error — below the
    # f32 kernels' floor but the dominant term at double-single accuracy
    r0, rw = _two_sum(r0, neg - ovf)
    r1 = r1 + rw
    Ff = f32(num_filters)
    fh, fe = _two_prod(r0, Ff)
    fh, fl_ = _two_sum(fh, fe + r1 * Ff)
    fif = jnp.floor(fh)
    th, tl = _two_sum(fh - fif, fl_)
    tneg = (th < 0).astype(f32)
    tovf = (th >= 1).astype(f32)
    fif = fif - tneg + tovf
    th, tw = _two_sum(th, tneg - tovf)
    tl = tl + tw
    fi = jnp.clip(fif.astype(jnp.int32), 0, num_filters - 1)
    pin_hi = fif.astype(jnp.int32) > fi
    pin_lo = fif.astype(jnp.int32) < fi
    th = jnp.where(pin_hi, f32(1.0), jnp.where(pin_lo, f32(0.0), th))
    tl = jnp.where(pin_hi | pin_lo, f32(0.0), tl)
    base = ip.astype(jnp.int32) - half + 1 + shift

    nt = kp // kb
    kmask = (jnp.arange(kp, dtype=jnp.int32) < k_max)[None, :]
    hib = blen + pad - segl
    base = jnp.clip(base, 0, hib)
    fi = jnp.where(kmask, fi, 0)
    th = jnp.where(kmask, th, f32(0.0))
    tl = jnp.where(kmask, tl, f32(0.0))

    klocal = jnp.tile(jnp.arange(kb, dtype=jnp.int32), nt)[None, :]
    d = jnp.clip(base - klocal, 0, hib)
    dbig = jnp.where(kmask, d, jnp.int32(2**30)).reshape(S, nt, kb)
    c0 = jnp.clip(jnp.min(dbig, axis=2), 0, hib)
    tb = jnp.clip(c0 - (c0 % 128), 0, hib)
    rel = c0 - tb
    carry = jnp.clip(d.reshape(S, nt, kb) - c0[:, :, None], 0, smax)

    r8 = 8 * kb
    def b4(v):
        return v.reshape(S // 8, 8, nt, kb).transpose(2, 0, 1, 3) \
            .reshape(nt, S // 8, 1, r8)
    carry_b, fi_b, frh_b, frl_b = b4(carry.reshape(S, kp)), b4(fi), \
        b4(th), b4(tl)

    blk4 = lambda t, s: (t, s, 0, 0)
    vspec = pl.BlockSpec((1, 1, 1, r8), blk4, memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((8, bufh.shape[1]), lambda t, s: (s, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((8, nt), lambda t, s: (s, 0),
                         memory_space=pltpu.SMEM)
    tspec = pl.BlockSpec(bTh.shape, lambda t, s: (0, 0),
                         memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        outh4, outl4 = pl.pallas_call(
            functools.partial(_asrc_hankel_ds_kernel, tp=tp, smax=smax,
                              segl=segl, kb=kb, fold_low=fold_low),
            grid=(nt, S // 8),
            in_specs=[vspec, vspec, vspec, vspec, bspec, bspec, sspec,
                      sspec, tspec, tspec, tspec, tspec],
            out_specs=(vspec, vspec),
            out_shape=(jax.ShapeDtypeStruct((nt, S // 8, 1, r8),
                                            jnp.float32),
                       jax.ShapeDtypeStruct((nt, S // 8, 1, r8),
                                            jnp.float32)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
            interpret=interpret,
        )(carry_b, fi_b, frh_b, frl_b, bufh, bufl, tb.astype(jnp.int32),
          rel.astype(jnp.int32), bTh, bTl, bT2h, bT2l)

    def unb4(v):
        return v.reshape(nt, S // 8, 8, kb).transpose(1, 2, 0, 3) \
            .reshape(S, kp)[:, :k_max]
    out = unb4(outh4).astype(jnp.float64) + unb4(outl4).astype(jnp.float64)
    valid = (jnp.arange(k_max, dtype=jnp.int32)[None, :] < Ks[:, None])
    out = out * valid.astype(out.dtype)
    new_hist = buf[:, blen - hist_len:]
    return new_hist, out


def dense_bank_tables_ds(bank64: np.ndarray):
    """Split a float64 phase bank into the four f32 plane tables the
    double-single Hankel kernel gathers from: (bTh, bTl, bT2h, bT2l)."""
    bt, bt2 = dense_bank_tables(np.asarray(bank64, np.float64))
    bth = bt.astype(np.float32)
    btl = (bt - bth.astype(np.float64)).astype(np.float32)
    bt2h = bt2.astype(np.float32)
    bt2l = (bt2 - bt2h.astype(np.float64)).astype(np.float32)
    return bth, btl, bt2h, bt2l


def hankel_segl(tp: int, kb: int, smax: int) -> int:
    """Segment length the Hankel kernel loads per (stream, tile): covers
    rel (<128) + window spread (kb-1) + carry (smax) + taps (tp) + the
    8-row rotation slack, rounded to a lane multiple."""
    return -(-(127 + kb + smax + tp + 8) // 128) * 128


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
