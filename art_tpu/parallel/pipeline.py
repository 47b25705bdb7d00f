"""The production chunk pipeline, fused and shardable.

One device step = resample (block-Toeplitz MXU matmuls, the production
formulation from parallel/streams.py) -> TPDF dither (closed-form LCG,
device uint32 math) -> noise-shaped quantization (lax.scan with the
reference's float op order) -> little-endian byte packing, with streaming
state (history, LCG states, shaper histories, error feedback) carried as
pure inputs/outputs.  Bit-exactness of the quantization stages matches the
host decimator (tests/test_pipeline.py); the resample stage sits at the f32
matmul floor of the host engine like the rest of the device path.

Multi-chip: ``make_sharded_step`` shard_maps the same math over a
(streams x taps) mesh — streams (channels / concurrent clips / sessions)
are data-parallel with no hot-path collectives; the polyphase contraction
is tensor-parallel over its shift blocks with one psum; clip counts and
output power reduce over the mesh like the reference's summed per-channel
returns (reference decimator.c:114-149, resampler.c:441-484).  The same
step with a 1x1 mesh is the single-device path, so sharded == single-device
is testable directly (the TPU analog of the reference's
threaded == unthreaded guarantee).
"""

from __future__ import annotations

import numpy as np

from .._jaxinit import ensure_jax

jax = ensure_jax()
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import decimate_device as dd


def residue_window_dots(win, P_local, *, M: int, nb_rs: int, qn_pad: int,
                        qn_local: int, q0, precise: bool = False,
                        defer_round: bool = False):
    """Residue-split block-Toeplitz contraction.

    Output block i needs window elements [i*M, i*M + qn_pad*M) of the
    padded window buffer; splitting blocks by residue r = i mod qn_pad
    makes each residue class's windows a CONTIGUOUS stride-(qn_pad*M)
    view — a pure reshape of a static slice, no gather and no operand
    blowup.  The contraction then runs as qn_pad dots of K = qn_pad*M
    over nb_rs/qn_pad rows instead of qn_pad dots of K = M over nb_rs
    rows: identical FLOPs and element reads, but the MXU's K granularity
    (cost steps at ceil(K/256)) is amortized — measured 1.11-1.25x on
    the bench presets (tools/exp_residue_split.py).

    ``win``: [S, (nb_rs + qn_pad) * M] padded window buffer; ``nb_rs``
    must be a multiple of qn_pad.  Each taps-rank contracts rows
    [q0*M, (q0+qn_local)*M) of the full [qn_pad*M, L2] phase matrix
    (``P_local``); the caller psums over the taps axis to complete the
    dot.  Returns [S, nb_rs, L2] (partial sums when qn_local < qn_pad).

    ``precise=True`` (f32 data only) accumulates each dot in float64 and
    rounds ONCE to the data dtype: the MXU's f32 HIGHEST algorithm
    bottoms the round-trip diff RMS at -141.47 dB (~0.8 dB above the C
    reference; K-splits and the X9 dot algorithm measured no better /
    unsupported on this deployment — tools/exp_splitk.py, exp_dotalg.py),
    while f64 accumulation lands -142.69 dB (0.4 dB BETTER than C) at
    ~4x dot cost (tools/exp_f64acc.py) — the within-0.1-dB operating
    point for clients that need it.  Under taps sharding each rank's dot
    is only a PARTIAL K contraction, so rounding it here would add f32
    partials across ranks and defeat the accumulate-in-f64-round-once
    guarantee: such callers pass ``defer_round=True`` to receive the f64
    partials and round AFTER the psum (caught in review).
    """
    S = win.shape[0]
    nr = nb_rs // qn_pad
    KQ = qn_pad * M
    acc_dt = jnp.float64 if precise else win.dtype
    if (qn_pad > 1 and qn_local == qn_pad
            and (precise or win.dtype == jnp.float64)):
        # f64-accumulated: ONE banded-wide dot instead of qn_pad anchor
        # dots.  The emulated-f64 (or f64-ACCUMULATED — same cost) dot is
        # output-tile-bound with strong lane-tile sensitivity (N = L2 <
        # 128 wastes over a third of every output tile); fusing the
        # qn_pad anchors' columns into one [*, qn_pad * L2] dot against a
        # banded phase matrix (anchor r's P rows offset by r*M, zeros
        # elsewhere — zeros add exactly 0 in f64, so the accumulated
        # value is bitwise the per-anchor dot's) trades 1.75x
        # structural-zero flops for 4x fewer output passes: 7.26 ms vs
        # 8.67 same-process on the config-4 strip (tools/exp_ds_concat.py
        # "wide" vs exp_f64orient "cur"); the same lever applies to
        # precise=True (f32 data, f64 accumulate) where the per-anchor
        # form left it on the table (round-4 verdict weak #1).  The
        # overlapped operand is a concat of two pure reshape views.
        L2 = P_local.shape[1]
        KW = KQ + (qn_pad - 1) * M
        Va = jax.lax.slice(win, (0, 0), (S, nr * KQ)).reshape(S, nr, KQ)
        Vb = jax.lax.slice(win, (0, KQ), (S, KQ + nr * KQ)) \
            .reshape(S, nr, KQ)[:, :, :KW - KQ]
        V = jnp.concatenate([Va, Vb], axis=2)             # [S, nr, KW]
        Pb = jnp.zeros((KW, qn_pad * L2), dtype=P_local.dtype)
        for r in range(qn_pad):
            Pb = jax.lax.dynamic_update_slice(Pb, P_local,
                                              (r * M, r * L2))
        d = jax.lax.dot_general(
            V, Pb, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=acc_dt,
            precision=jax.lax.Precision.HIGHEST)
        if precise and not defer_round:
            d = d.astype(win.dtype)
        # [S, nr, qn_pad * L2]: col block r is anchor r = the stack-axis
        # layout of the per-anchor path; i = j*qn_pad + r, pure reshape
        return d.reshape(S, nb_rs, L2)
    outs = []
    for r in range(qn_pad):
        Vr = jax.lax.slice(win, (0, r * M), (S, r * M + nr * KQ)) \
            .reshape(S, nr, KQ)
        if qn_local != qn_pad:
            Vr = jax.lax.dynamic_slice_in_dim(Vr, q0 * M, qn_local * M,
                                              axis=2)
        d = jax.lax.dot_general(
            Vr, P_local, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=acc_dt,
            precision=jax.lax.Precision.HIGHEST)
        outs.append(d.astype(win.dtype) if precise and not defer_round
                    else d)
    # [S, nr, qn_pad, L2] -> [S, nb_rs, L2]; i = j*qn_pad + r, pure reshape
    return jnp.stack(outs, axis=2).reshape(S, nb_rs, -1)


def _window_and_hist(x, hist, start, xlen: int, hist_len: int):
    """Shared chunk prologue/epilogue: history concat -> padded window
    slice at ``start`` (the block-Toeplitz operand view) and the advanced
    history (last hist_len columns of history+input)."""
    S = x.shape[0]
    buf = jnp.concatenate([hist, x], axis=1)
    pad = jnp.zeros((S, xlen), dtype=x.dtype)
    win = jax.lax.dynamic_slice(
        jnp.concatenate([buf, pad], axis=1), (jnp.int32(0), start),
        (S, xlen))
    new_hist = jax.lax.dynamic_slice(
        buf, (0, buf.shape[1] - hist_len), (S, hist_len))
    return win, new_hist


def _mask_outputs(out, K, S: int, nb: int, L: int):
    """Flatten [S, nb, L] output blocks and zero entries beyond K."""
    out = jax.lax.slice(out, (0, 0, 0), (S, nb, L)).reshape(S, nb * L)
    valid = (jnp.arange(nb * L, dtype=jnp.int32) < K).astype(out.dtype)
    return out * valid[None, :]


def _resample_block(x, hist, P_local, start, K, *, M: int, L: int, nb: int,
                    qn_pad: int, qn_local: int, hist_len: int, q0,
                    taps_axis: str | None, precise: bool = False):
    """Block-Toeplitz resample chunk over a local range of shift blocks.

    Each taps-rank holds shift blocks [q0, q0 + qn_local) of the padded
    [qn_pad * M, L] phase matrix; the residue-split contraction
    (residue_window_dots) computes its partial dots and the psum over
    ``taps_axis`` completes them (the single-device caller passes
    taps_axis=None, q0=0, qn_local=qn_pad).
    Returns (out [S, nb*L] masked beyond K, new_hist)."""
    S = x.shape[0]
    nb_rs = -(-nb // qn_pad) * qn_pad
    win, new_hist = _window_and_hist(x, hist, start,
                                     (nb_rs + qn_pad) * M, hist_len)
    defer = precise and taps_axis is not None
    out = residue_window_dots(win, P_local, M=M, nb_rs=nb_rs,
                              qn_pad=qn_pad, qn_local=qn_local, q0=q0,
                              precise=precise, defer_round=defer)
    if taps_axis is not None:
        out = jax.lax.psum(out, taps_axis)
    if defer:
        out = out.astype(x.dtype)
    return _mask_outputs(out, K, S, nb, L), new_hist


def pipeline_chunk(x, hist, P_local, start, K, gens, fb, xh, yh,
                   A, V0, V1, *, M: int, L: int, nb: int, qn_pad: int,
                   qn_local: int, hist_len: int, scaler: float,
                   highclip: int, lowclip: int, dither_type,
                   shaper_a, shaper_b, output_bits: int, output_bytes: int,
                   streams_axis: str | None = None,
                   taps_axis: str | None = None,
                   post_bq=None, bq_state=None, post_bq_tables=None,
                   post_bq_tables32=None, bq_sp_mult: int = 1):
    """One full production chunk: resample -> [biquad post-filter cascade]
    -> dither -> shaped quantize -> pack.  Pure; state flows through.
    ``post_bq``: optional ((a1, b1), (a2, b2)) cascade coefficients (the
    CLI -p post filter, reference art.c:1052-1058) with ``bq_state`` =
    (xh1, yh1, xh2, yh2) each [4, S]; filtered via the masked block-Toeplitz
    IIR (ops/biquad_kernel.assoc_core_masked), per-stream and therefore
    shard-transparent over the streams axis.  Returns
    (packed u8 [nK, S*output_bytes], new_hist, new_gens, fb', xh', yh',
     clips i32, power[, bq_state'])."""
    q0 = jnp.int32(0)
    if taps_axis is not None:
        q0 = jax.lax.axis_index(taps_axis).astype(jnp.int32) * qn_local
    out, new_hist = _resample_block(
        x, hist, P_local, start, K, M=M, L=L, nb=nb, qn_pad=qn_pad,
        qn_local=qn_local, hist_len=hist_len, q0=q0, taps_axis=taps_axis)
    nK = nb * L

    new_bq_state = None
    if post_bq is not None:
        from ..ops.biquad_kernel import assoc_core_masked
        (a1, b1), (a2, b2) = post_bq
        t1, t2 = post_bq_tables if post_bq_tables is not None else (None,
                                                                    None)
        xh1, yh1, xh2, yh2 = bq_state
        # block-IIR lane pad = the GLOBAL stream count padded even (the
        # same constant on every mesh width, so sharded == single-device
        # stays bit-for-bit; see _iir_y)
        sp = -(-(x.shape[0] * bq_sp_mult) // 2) * 2
        t1_32, t2_32 = (post_bq_tables32 if post_bq_tables32 is not None
                        else (None, None))
        y, xh1, yh1 = assoc_core_masked(out.T, a1, b1, xh1, yh1, K,
                                        tables=t1, sp=sp, tables32=t1_32)
        y, xh2, yh2 = assoc_core_masked(y, a2, b2, xh2, yh2, K, tables=t2,
                                        sp=sp, tables32=t2_32)
        out = y.T
        new_bq_state = (xh1, yh1, xh2, yh2)

    dither = None
    new_gens = gens
    if dither_type is not None:
        d, seq = dd.tpdf_dither_dev(gens, A, V0, V1, dither_type, nK)
        new_gens = dd.advance_states(gens, seq, K)
        dither = d.T                                       # [nK, S]

    samples = out.T                                        # [nK, S]
    if shaper_a is not None:
        outv, clipf, fb, xh, yh = dd.quantize_shaped_dev(
            samples, dither, scaler, fb, shaper_a, shaper_b, xh, yh,
            K, highclip, lowclip)
    else:
        outv, clipf = dd.quantize_flat_dev(samples, dither, scaler, fb,
                                           highclip, lowclip)
        kmask = jnp.arange(nK, dtype=jnp.int32)[:, None] < K
        outv = jnp.where(kmask, outv, 0)
        clipf = clipf & kmask

    clips = jnp.sum(clipf).astype(jnp.int32)
    power = jnp.sum(out * out)
    if streams_axis is not None:
        clips = jax.lax.psum(clips, streams_axis)
        power = jax.lax.psum(power, streams_axis)
    packed = dd.pack_bytes_dev(outv, output_bits, output_bytes)
    if post_bq is not None:
        return (packed, new_hist, new_gens, fb, xh, yh, clips, power,
                new_bq_state)
    return packed, new_hist, new_gens, fb, xh, yh, clips, power


def make_sharded_step(mesh: Mesh, *, M: int, L: int, nb: int, qn: int,
                      hist_len: int, scaler: float, highclip: int,
                      lowclip: int, dither_type=-1, shaper_a=None,
                      shaper_b=None, output_bits: int = 16,
                      output_bytes: int = 2, post_bq=None,
                      bq_refine: bool = False):
    """Jitted multi-device production step over a (streams x taps) mesh.

    Global input shapes: x [S, n], hist [S, hist_len], Pmat [qn_pad*M, L]
    (qn padded up to a taps-axis multiple; pad rows are zero), start/K
    scalars, gens u32 [S], fb [S], xh/yh [4, S], A/V0/V1 u32 [5*nb*L].
    With ``post_bq`` (cascade coefficients, see pipeline_chunk) the step
    additionally takes bq_state = (xh1, yh1, xh2, yh2) each f64 [4, S] and
    returns the advanced tuple.
    """
    ntap = mesh.shape["taps"]
    qn_pad = -(-qn // ntap) * ntap
    qn_local = qn_pad // ntap
    post_bq_tables = post_bq_tables32 = None
    if post_bq is not None:
        # the cascade coefficients are host constants at step-build time:
        # precompute the block-IIR tables once here instead of re-running
        # the B-step table scan in-graph on every chunk (iir_tables
        # docstring: 3.9x measured on-chip)
        from ..ops.biquad_kernel import iir_tables
        post_bq_tables = (iir_tables(np.asarray(post_bq[0][1])),
                          iir_tables(np.asarray(post_bq[1][1])))
        if bq_refine:
            post_bq_tables32 = (
                iir_tables(np.asarray(post_bq[0][1]), dtype=np.float32),
                iir_tables(np.asarray(post_bq[1][1]), dtype=np.float32))
    kw = dict(M=M, L=L, nb=nb, qn_pad=qn_pad, qn_local=qn_local,
              hist_len=hist_len, scaler=scaler, highclip=highclip,
              lowclip=lowclip, dither_type=dither_type, shaper_a=shaper_a,
              shaper_b=shaper_b, output_bits=output_bits,
              output_bytes=output_bytes, streams_axis="streams",
              taps_axis="taps", post_bq=post_bq,
              post_bq_tables=post_bq_tables,
              post_bq_tables32=post_bq_tables32,
              bq_sp_mult=mesh.shape["streams"])

    base_in = (P("streams", None), P("streams", None), P("taps", None),
               P(), P(), P("streams"), P("streams"), P(None, "streams"),
               P(None, "streams"), P(), P(), P())
    base_out = (P(None, "streams"), P("streams", None), P("streams"),
                P("streams"), P(None, "streams"), P(None, "streams"),
                P(), P())
    if post_bq is None:
        def step(x, hist, Pmat, start, K, gens, fb, xh, yh, A, V0, V1):
            return pipeline_chunk(x, hist, Pmat, start, K, gens, fb, xh, yh,
                                  A, V0, V1, **kw)
        in_specs, out_specs = base_in, base_out
    else:
        def step(x, hist, Pmat, start, K, gens, fb, xh, yh, A, V0, V1,
                 bq_state):
            return pipeline_chunk(x, hist, Pmat, start, K, gens, fb, xh, yh,
                                  A, V0, V1, bq_state=bq_state, **kw)
        bq_spec = (P(None, "streams"),) * 4
        in_specs = base_in + (bq_spec,)
        out_specs = base_out + (bq_spec,)

    mapped = shard_map(
        step, mesh=mesh,
        in_specs=in_specs, out_specs=out_specs,
        check_rep=False)
    return jax.jit(mapped)


def pad_phase_matrix(Pmat: np.ndarray, M: int, L: int, qn: int,
                     qn_pad: int, dtype) -> np.ndarray:
    """Zero-pad a [<=qn*M, L] phase matrix to [qn_pad*M, L]."""
    out = np.zeros((qn_pad * M, L), dtype=dtype)
    out[:Pmat.shape[0], :] = Pmat
    return out
