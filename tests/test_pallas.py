"""Pallas ASRC kernel correctness (interpreter mode on CPU; the compiled
kernel was additionally validated on TPU v5e: maxdiff 4.8e-7 vs float64
reference)."""

import numpy as np
import pytest
import jax.numpy as jnp

from art_tpu.core.filters import make_filter_bank
from art_tpu.ops.pallas_kernels import asrc_apply_pallas, pad_bank_for_pallas


def test_polyphase_pallas_interpret_matches_reference():
    from art_tpu.ops.pallas_kernels import _TB, polyphase_apply_pallas
    M, qn, L, ch = 147, 4, 160, 2
    nb_pad = _TB * 2
    rng = np.random.default_rng(0)
    wlen = (nb_pad + _TB) * M
    win = np.zeros((ch, wlen), np.float32)
    win[:, :nb_pad * M + qn * M] = rng.standard_normal(
        (ch, nb_pad * M + qn * M)).astype(np.float32)
    P = rng.standard_normal((qn * M, L)).astype(np.float32) * 0.05
    out = np.asarray(polyphase_apply_pallas(
        jnp.asarray(win), jnp.asarray(P), M=M, qn=qn, L=L, interpret=True))
    ref = np.zeros((ch, nb_pad, L), np.float32)
    for j in range(nb_pad):
        ref[:, j] = win[:, j * M:j * M + qn * M] @ P
    np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.parametrize("S,K,T,F", [(8, 256, 48, 64), (16, 512, 156, 320)])
def test_asrc_pallas_interpret_matches_reference(S, K, T, F):
    bank = make_filter_bank(T, F, 1.0, True, np.float32)
    bankp = pad_bank_for_pallas(bank)
    tp = bankp.shape[1]
    B = 2048 + tp + 128
    rng = np.random.default_rng(0)
    buf = rng.standard_normal((S, B)).astype(np.float32)
    base = rng.integers(0, B - tp - 128, (S, K)).astype(np.int32)
    fi = rng.integers(0, F, (S, K)).astype(np.int32)
    frac = rng.random((S, K)).astype(np.float32)

    out = np.asarray(asrc_apply_pallas(
        jnp.asarray(buf), jnp.asarray(bankp), jnp.asarray(base),
        jnp.asarray(fi), jnp.asarray(frac), kb=K, interpret=True))

    ref = np.zeros((S, K), np.float32)
    for s in range(S):
        for k in range(K):
            win = buf[s, base[s, k]:base[s, k] + T].astype(np.float64)
            w = (bank[fi[s, k]].astype(np.float64) * (1 - frac[s, k])
                 + bank[fi[s, k] + 1].astype(np.float64) * frac[s, k])
            ref[s, k] = (win * w).sum()
    np.testing.assert_allclose(out, ref, atol=2e-6)

def test_asrc_dense_engine_matches_per_stream_engines():
    """The dense kernel path of BatchedASRC (interpret mode on CPU; the
    compiled kernel was validated on TPU v5e at 1.3e-7 max relerr) matches
    per-stream host engines in counts, samples and positions."""
    from art_tpu.core.flags import BLACKMAN_HARRIS, SUBSAMPLE_INTERPOLATE
    from art_tpu.engines.resampler import Resampler
    from art_tpu.parallel.asrc import BatchedASRC
    from art_tpu.utils.testsig import NoiseLCG

    S, taps, filters = 8, 48, 64
    rng = np.random.default_rng(1)
    lcg = NoiseLCG()
    b = BatchedASRC(S, taps, filters, kernel="dense")
    b.advance_position(24.0)
    singles = []
    for _ in range(S):
        r = Resampler(1, taps, filters, 0.0,
                      SUBSAMPLE_INTERPOLATE | BLACKMAN_HARRIS,
                      backend="numpy")
        r.advance_position(24.0)
        singles.append(r)
    md = 0.0
    for it in range(4):
        x = lcg.fill(S * 384).reshape(S, 384)
        ratios = 1.0 + rng.uniform(-0.01, 0.01, S)
        if it == 2:
            ratios = rng.uniform(0.3, 2.7, S)   # stress the rel/tb tiling
        out, Ks = b.process(jnp.asarray(x), ratios)
        out = np.asarray(out)
        for s in range(S):
            ho, res = singles[s].process(x[s:s + 1], 384, 2000,
                                         float(ratios[s]))
            assert res.output_generated == Ks[s]
            md = max(md, float(np.abs(ho[0] - out[s, :Ks[s]]).max()))
            assert abs(b.get_position()[s]
                       - singles[s].get_position()) < 1e-9
        assert np.all(out[:, Ks.max():] == 0.0)
    assert md < 1e-6


def test_asrc_dense_falls_back_below_ratio_bound():
    """Per-call ratios below the dense kernel's tiling bound route through
    the xla step with identical state evolution."""
    from art_tpu.parallel.asrc import BatchedASRC
    from art_tpu.utils.testsig import NoiseLCG

    lcg = NoiseLCG()
    a = BatchedASRC(8, 48, 64, kernel="dense")
    b = BatchedASRC(8, 48, 64, kernel="xla")
    a.advance_position(24.0)
    b.advance_position(24.0)
    for ratios in ([0.2] * 8, [1.0] * 8):   # below bound, then above
        x = lcg.fill(8 * 256).reshape(8, 256)
        oa, Ka = a.process(jnp.asarray(x), np.array(ratios))
        ob, Kb = b.process(jnp.asarray(x), np.array(ratios))
        assert np.array_equal(Ka, Kb)
        np.testing.assert_allclose(np.asarray(oa), np.asarray(ob),
                                   atol=2e-6)
        np.testing.assert_allclose(a.offsets, b.offsets, atol=0)


def test_asrc_dense_large_taps_config():
    """Dense kernel generalizes past one tap tile: preset-4-class bank
    (988 taps -> TP 1024, 8 phase lane-blocks) against per-stream hosts."""
    from art_tpu.core.flags import BLACKMAN_HARRIS, SUBSAMPLE_INTERPOLATE
    from art_tpu.engines.resampler import Resampler
    from art_tpu.parallel.asrc import BatchedASRC
    from art_tpu.utils.testsig import NoiseLCG

    S, taps, filters = 8, 988, 988
    lcg = NoiseLCG()
    b = BatchedASRC(S, taps, filters, kernel="dense")
    b.advance_position(taps // 2)
    singles = []
    for _ in range(S):
        r = Resampler(1, taps, filters, 0.0,
                      SUBSAMPLE_INTERPOLATE | BLACKMAN_HARRIS,
                      backend="numpy")
        r.advance_position(taps // 2)
        singles.append(r)
    rng = np.random.default_rng(2)
    md = 0.0
    for _ in range(2):
        x = lcg.fill(S * 1024).reshape(S, 1024)
        ratios = 1.0 + rng.uniform(-0.01, 0.01, S)
        out, Ks = b.process(jnp.asarray(x), ratios)
        out = np.asarray(out)
        for s in range(S):
            ho, res = singles[s].process(x[s:s + 1], 1024, 2000,
                                         float(ratios[s]))
            assert res.output_generated == Ks[s]
            md = max(md, float(np.abs(ho[0] - out[s, :Ks[s]]).max()))
    assert md < 2e-6


@pytest.mark.parametrize("kbv", [256, 512])
def test_asrc_dense_wide_tiles_match_host(kbv):
    """The dense kernel's wide-tile variants (dense_kb=256/512) stay
    sample-exact vs per-stream host engines."""
    from art_tpu.core.flags import BLACKMAN_HARRIS, SUBSAMPLE_INTERPOLATE
    from art_tpu.engines.resampler import Resampler
    from art_tpu.parallel.asrc import BatchedASRC
    from art_tpu.utils.testsig import NoiseLCG

    S, taps, filters = 8, 48, 64
    rng = np.random.default_rng(6)
    lcg = NoiseLCG()
    b = BatchedASRC(S, taps, filters, kernel="dense", dense_kb=kbv)
    b.advance_position(24.0)
    singles = []
    for _ in range(S):
        r = Resampler(1, taps, filters, 0.0,
                      SUBSAMPLE_INTERPOLATE | BLACKMAN_HARRIS,
                      backend="numpy")
        r.advance_position(24.0)
        singles.append(r)
    md = 0.0
    for _ in range(3):
        x = lcg.fill(S * 600).reshape(S, 600)
        ratios = 1.0 + rng.uniform(-0.01, 0.01, S)
        out, Ks = b.process(jnp.asarray(x), ratios)
        out = np.asarray(out)
        for s in range(S):
            ho, res = singles[s].process(x[s:s + 1], 600, 2000,
                                         float(ratios[s]))
            assert res.output_generated == Ks[s]
            md = max(md, float(np.abs(ho[0] - out[s, :Ks[s]]).max()))
    assert md < 1e-6


@pytest.mark.parametrize("taps,filters", [
    (16, 127),    # single phase lane-block, boundary F+2 > 128
    (16, 126),    # F+2 == 128 exactly, nc == 1
    (48, 1),      # degenerate single-filter bank
    (100, 200),   # taps not a multiple of 128 after padding (100 -> 128)
    (156, 320),   # preset-2 shape
])
def test_asrc_dense_fuzz_configs(taps, filters):
    """Dense kernel vs per-stream hosts across bank geometries (phase
    lane-block counts, tap padding, degenerate filter counts)."""
    from art_tpu.core.flags import BLACKMAN_HARRIS, SUBSAMPLE_INTERPOLATE
    from art_tpu.engines.resampler import Resampler
    from art_tpu.parallel.asrc import BatchedASRC
    from art_tpu.utils.testsig import NoiseLCG

    S = 8
    lcg = NoiseLCG()
    rng = np.random.default_rng(taps * 1000 + filters)
    b = BatchedASRC(S, taps, filters, kernel="dense")
    b.advance_position(taps // 2)
    singles = []
    for _ in range(S):
        r = Resampler(1, taps, filters, 0.0,
                      SUBSAMPLE_INTERPOLATE | BLACKMAN_HARRIS,
                      backend="numpy")
        r.advance_position(taps // 2)
        singles.append(r)
    md = 0.0
    for _ in range(2):
        x = lcg.fill(S * 300).reshape(S, 300)
        ratios = rng.uniform(0.6, 1.8, S)
        out, Ks = b.process(jnp.asarray(x), ratios)
        out = np.asarray(out)
        for s in range(S):
            ho, res = singles[s].process(x[s:s + 1], 300, 1200,
                                         float(ratios[s]))
            assert res.output_generated == Ks[s], (taps, filters)
            md = max(md, float(np.abs(ho[0] - out[s, :Ks[s]]).max()))
    assert md < 2e-6, (taps, filters, md)


@pytest.mark.parametrize("taps,filters", [
    (48, 64), (128, 380), (380, 380), (256, 129), (1024, 128),
])
def test_asrc_hankel_fuzz_configs(taps, filters):
    """Hankel kernel vs per-stream hosts across bank geometries, with
    ratios pushed to the staircase bound (|1/r - 1| <= smax/(kb-1)) and
    the fi clamp edges exercised."""
    from art_tpu.core.flags import BLACKMAN_HARRIS, SUBSAMPLE_INTERPOLATE
    from art_tpu.engines.resampler import Resampler
    from art_tpu.parallel.asrc import BatchedASRC
    from art_tpu.utils.testsig import NoiseLCG

    S = 8
    lcg = NoiseLCG()
    rng = np.random.default_rng(taps * 7 + filters)
    b = BatchedASRC(S, taps, filters, kernel="hankel")
    b.advance_position(taps // 2)
    bound = b._hsmax / (b._hkb - 1)
    singles = []
    for _ in range(S):
        r = Resampler(1, taps, filters, 0.0,
                      SUBSAMPLE_INTERPOLATE | BLACKMAN_HARRIS,
                      backend="numpy")
        r.advance_position(taps // 2)
        singles.append(r)
    md = 0.0
    for it in range(3):
        x = lcg.fill(S * 300).reshape(S, 300)
        if it == 0:
            # exactly at the staircase bound on both sides
            q = 1.0 + bound * np.where(np.arange(S) % 2 == 0, 1.0, -1.0)
            ratios = 1.0 / q
        else:
            ratios = 1.0 + rng.uniform(-0.8 * bound, 0.8 * bound, S)
        out, Ks = b.process(jnp.asarray(x), ratios)
        out = np.asarray(out)
        for s in range(S):
            ho, res = singles[s].process(x[s:s + 1], 300, 1200,
                                         float(ratios[s]))
            assert res.output_generated == Ks[s], (taps, filters)
            if Ks[s]:       # 1024-tap banks emit nothing on early chunks
                md = max(md, float(np.abs(ho[0] - out[s, :Ks[s]]).max()))
    assert md < 2e-6, (taps, filters, md)


@pytest.mark.parametrize("src,dst,taps,filters", [
    (44100, 48000, 380, 380),      # headline: M=147, L=160, qn=4
    (96000, 44100, 156, 320),      # config 3: M=320, L=147, qn=2
    (44100, 96000, 380, 380),      # config 2: M=147, L=320
    (44100, 48000, 48, 48),        # config 1: interpolated (48 filters
                                   # cannot reduce), in-kernel phase lerp
])
def test_fixed_pallas_engine_matches_xla_step(src, dst, taps, filters):
    """The single-pass Pallas fixed-ratio body (ops/fixed_pallas) streams
    multiple uneven chunks with identical counts/state and samples at the
    f32 dot-order floor vs the XLA residue-split step (interpret mode on
    CPU; real-Mosaic lowering is covered by tools/tpu_smoke.py)."""
    from art_tpu.core.flags import (BLACKMAN_HARRIS, INCLUDE_LOWPASS,
                                    SUBSAMPLE_INTERPOLATE)
    from art_tpu.parallel.streams import DeviceStreamResampler
    from art_tpu.utils.testsig import NoiseLCG

    IB = SUBSAMPLE_INTERPOLATE | BLACKMAN_HARRIS | INCLUDE_LOWPASS
    a = DeviceStreamResampler(2, taps, filters, src, dst, 0, IB)
    b = DeviceStreamResampler(2, taps, filters, src, dst, 0, IB,
                              pallas_step=True)
    assert b._pallas
    a.advance_position(taps // 2)
    b.advance_position(taps // 2)
    lcg = NoiseLCG()
    ref_scale = None
    for n in [1000, 4096, 37, 2049]:
        x = jnp.asarray(lcg.fill(2 * n).reshape(2, n))
        oa, Ka, aa = a.process(x, n, jnp.zeros((), jnp.float32))
        ob, Kb, ab = b.process(x, n, jnp.zeros((), jnp.float32))
        assert Ka == Kb
        assert a.get_position() == b.get_position()
        oa, ob = np.asarray(oa), np.asarray(ob)
        if Ka:
            scale = max(np.abs(oa).max(), 1e-9)
            assert np.abs(oa[:, :Ka] - ob[:, :Kb]).max() / scale < 3e-6
        # outputs beyond K are zeroed in both bodies
        assert not ob[:, Kb:].any()
    np.testing.assert_array_equal(np.asarray(a.hist), np.asarray(b.hist))


def test_fixed_pallas_scan_matches_sequential():
    """process_scan with the Pallas body == sequential process() with the
    Pallas body, bitwise (same kernel, same per-chunk operands)."""
    from art_tpu.core.flags import (BLACKMAN_HARRIS, INCLUDE_LOWPASS,
                                    SUBSAMPLE_INTERPOLATE)
    from art_tpu.parallel.streams import DeviceStreamResampler
    from art_tpu.utils.testsig import NoiseLCG

    IB = SUBSAMPLE_INTERPOLATE | BLACKMAN_HARRIS | INCLUDE_LOWPASS
    mk = lambda: DeviceStreamResampler(2, 380, 380, 44100, 48000, 0, IB,
                                       pallas_step=True)
    a, b = mk(), mk()
    a.advance_position(190)
    b.advance_position(190)
    lcg = NoiseLCG()
    G, n = 3, 2048
    xs = jnp.asarray(lcg.fill(G * 2 * n).reshape(G, 2, n))
    outs, Ks, acc = b.process_scan(xs, n, jnp.zeros((), jnp.float32))
    outs = np.asarray(outs)
    acc_a = jnp.zeros((), jnp.float32)
    for g in range(G):
        oa, Ka, acc_a = a.process(xs[g], n, acc_a)
        assert Ka == Ks[g]
        np.testing.assert_array_equal(np.asarray(oa),
                                      outs[g][:, :oa.shape[1]])
        assert not outs[g][:, oa.shape[1]:].any()
    assert float(acc_a) == pytest.approx(float(acc), rel=1e-6)


@pytest.mark.parametrize("interp", [False, True])
def test_fixed_pallas_split_out_bitwise(interp):
    """split_out=True (qn separate output refs + XLA interleave — the
    Mosaic fallback layout for the in-kernel stack-reshape) produces
    bit-identical results to the fused-output layout: same dots in the
    same order, only the output plumbing differs."""
    from art_tpu.core.flags import (BLACKMAN_HARRIS, INCLUDE_LOWPASS,
                                    SUBSAMPLE_INTERPOLATE)
    from art_tpu.ops.fixed_pallas import fixed_step_pallas
    from art_tpu.parallel.streams import DeviceStreamResampler
    from art_tpu.utils.testsig import NoiseLCG

    IB = SUBSAMPLE_INTERPOLATE | BLACKMAN_HARRIS | INCLUDE_LOWPASS
    taps, filters = (48, 48) if interp else (380, 380)
    eng = DeviceStreamResampler(2, taps, filters, 44100, 48000, 0, IB)
    eng.advance_position(taps // 2)
    chunk = 4096
    K, start, j0, pos0, plan = eng._plan_compute(chunk)
    nb = -(-K // eng.L)
    if interp:
        P, fracv = eng._interp_matrix(pos0)[:2]
    else:
        P, fracv = eng._matrix(j0), None
    lcg = NoiseLCG()
    x = jnp.asarray(lcg.fill(2 * chunk).reshape(2, chunk))
    hist = jnp.zeros((2, eng.num_samples), jnp.float32)
    acc = jnp.zeros((), jnp.float32)
    kw = dict(M=eng.M, L=eng.L, nb=nb, qn=eng.qn, hist_len=eng.num_samples,
              jb=8, interpret=True, fracv=fracv)
    ha, oa, aa = fixed_step_pallas(hist, x, P, jnp.int32(start),
                                   jnp.int32(K), acc, **kw)
    hb, ob, ab = fixed_step_pallas(hist, x, P, jnp.int32(start),
                                   jnp.int32(K), acc, split_out=True, **kw)
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))
    np.testing.assert_array_equal(np.asarray(ha), np.asarray(hb))
    assert float(aa) == float(ab)
