"""Dot-algorithm A/B for the fixed-ratio contraction: can a wider MXU
pass decomposition close the device round-trip SNR gap (dev/dev -141.47
vs C -142.29 dB) at acceptable cost?

Background (tools/exp_splitk.py, exp_f64acc.py): splitting K did NOT
change the SNR (so the error is not accumulation depth) while f64
accumulation fully closed it (-142.69) at 4.1x — pointing at the f32 ->
bf16xN operand decomposition of precision=HIGHEST as the error source.
jax.lax.DotAlgorithmPreset exposes wider decompositions directly:
  BF16_BF16_F32_X6  (what HIGHEST lowers to on TPU today)
  BF16_BF16_F32_X9  (adds the lo*lo-class passes: near-exact products)
  F32_F32_F32       (native f32 algorithm spec)

Usage: python tools/exp_dotalg.py [reps]
"""
import math
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

import art_tpu.parallel.pipeline as pipeline
from art_tpu.core import flags as F

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
NS = 8
chunk = 147 * 28533
IBL = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS | F.INCLUDE_LOWPASS
IB = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS


def make_dots(alg):
    def dots(win, P_local, *, M, nb_rs, qn_pad, qn_local, q0):
        S = win.shape[0]
        nr = nb_rs // qn_pad
        KQ = qn_pad * M
        outs = []
        for r in range(qn_pad):
            Vr = jax.lax.slice(win, (0, r * M), (S, r * M + nr * KQ)) \
                .reshape(S, nr, KQ)
            outs.append(jax.lax.dot_general(
                Vr, P_local, dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=win.dtype, precision=alg))
        return jnp.stack(outs, axis=2).reshape(S, nb_rs, -1)
    return dots


_orig = pipeline.residue_window_dots


def snr(dots, seconds=20):
    pipeline.residue_window_dots = dots
    import importlib

    import art_tpu.parallel.streams as streams
    importlib.reload(streams)
    from art_tpu.utils.testsig import NoiseLCG, fade_in, fade_out
    ch, taps, src, dst, bufn = 2, 380, 44100, 48000, 4096
    buffers = -(-seconds * src // bufn)
    n = buffers * bufn
    sig = NoiseLCG().fill(n * ch, np.float32).reshape(n, ch)
    fade_in(sig[:bufn])
    fade_out(sig[-bufn:])
    x = jnp.asarray(np.ascontiguousarray(sig.T))
    fwd = streams.DeviceStreamResampler(ch, taps, 380, src, dst, 0, IB)
    fwd.advance_position(taps // 2)
    inv = streams.DeviceStreamResampler(ch, taps, 380, dst, src, 0, IB)
    inv.advance_position(taps // 2)
    o1, k1 = fwd.process(x, n)
    o2, k2 = fwd.flush()
    y = jnp.concatenate([o1[:, :k1], o2[:, :k2]], axis=1)
    i1, j1 = inv.process(y, k1 + k2)
    i2, j2 = inv.flush()
    z = jnp.concatenate([i1[:, :j1], i2[:, :j2]], axis=1)
    m = min(n, j1 + j2)
    diff = z[:, :m] - x[:, :m]
    sumsq = float(jnp.sum(diff.astype(jnp.float64) ** 2))
    return 10.0 * math.log10(sumsq / (m * ch) * 2.0)


ALGS = [
    ("HIGHEST", jax.lax.Precision.HIGHEST),
    ("X9", jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X9),
    ("F32", jax.lax.DotAlgorithmPreset.F32_F32_F32),
    ("X6", jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X6),
]

for name, alg in ALGS:
    try:
        db = snr(make_dots(alg))
        print(f"dev/dev {name:8s}: {db:8.2f} dB", flush=True)
    except Exception as e:
        print(f"dev/dev {name:8s}: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)

# ---- throughput A/B, headline geometry (one jit, NS-step scan)
pipeline.residue_window_dots = _orig
import importlib

import art_tpu.parallel.streams as streams
importlib.reload(streams)
eng = streams.DeviceStreamResampler(2, 380, 380, 44100, 48000, 0, IBL)
eng.advance_position(190)
eng._plan(chunk)
K, start, j0, pos0, plan = eng._plan_compute(chunk)
nb = -(-K // eng.L)
M, L, qn, hist_len = eng.M, eng.L, eng.qn, eng.num_samples
P = eng._matrix(j0)
x1 = jax.random.normal(jax.random.PRNGKey(0), (2, chunk),
                       jnp.float32) * 0.25
h0 = jnp.zeros((2, hist_len), jnp.float32)
a0 = jnp.zeros((), jnp.float32)
nb_rs = -(-nb // qn) * qn
xlen = (nb_rs + qn) * M


def make(dots):
    @jax.jit
    def run(hist, acc):
        def step(carry, _):
            hist, acc = carry
            x = x1 + acc * 1e-30
            buf = jnp.concatenate([hist, x], axis=1)
            pad = jnp.zeros((2, xlen), dtype=x.dtype)
            win = jax.lax.dynamic_slice(
                jnp.concatenate([buf, pad], axis=1),
                (jnp.int32(0), jnp.int32(start)), (2, xlen))
            out = dots(win, P, M=M, nb_rs=nb_rs, qn_pad=qn, qn_local=qn,
                       q0=jnp.int32(0))
            out = jax.lax.slice(out, (0, 0, 0), (2, nb, L)) \
                .reshape(2, nb * L)
            valid = (jnp.arange(nb * L, dtype=jnp.int32)
                     < jnp.int32(K)).astype(out.dtype)
            out = out * valid[None, :]
            acc = acc + jnp.sum(out * out)
            hist = jax.lax.dynamic_slice(
                buf, (0, buf.shape[1] - hist_len), (2, hist_len))
            return (hist, acc), None
        (hist, acc), _ = jax.lax.scan(step, (hist, acc), None, length=NS)
        return hist, acc
    return run


runs = {}
for name, alg in ALGS:
    runs[name] = make(make_dots(alg))
ok = {}
for name, r in runs.items():
    try:
        t0 = time.perf_counter()
        h, a = r(h0, a0)
        float(a)
        print(f"# {name} compile+run {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
        ok[name] = r
    except Exception as e:
        print(f"{name}: compile FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
res = {k: [] for k in ok}
for _ in range(reps):
    for name, r in ok.items():
        t0 = time.perf_counter()
        h, a = r(h0, a0)
        float(a)
        res[name].append(time.perf_counter() - t0)
for name in ok:
    m = sorted(res[name])[len(res[name]) // 2]
    print(f"{name:8s}: {m/NS*1e3:6.2f} ms/chunk  "
          f"({K*NS/m/1e6:7.1f} M out/s)", flush=True)
