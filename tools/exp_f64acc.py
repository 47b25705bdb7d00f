"""Can f64 ACCUMULATION close the device SNR gap affordably?

The round-trip legs decomposition (tools/exp_snr_legs.py) shows each
device leg loses ~0.65 dB vs the host's f64-accumulated dots (dev/dev
-141.47 vs host/host -142.69; the C reference's f32 sequential legs give
-142.29).  Candidate: keep f32 operands but ask for f64 accumulation
(preferred_element_type=float64) in the residue-split contraction.

Measures, same-process interleaved:
  a) throughput: NS-scan of the fixed-ratio body, f32-acc vs f64-acc
     (headline-cost impact),
  b) fidelity: the artest -i -e round trip with f64-acc dots patched in.

Usage: python tools/exp_f64acc.py [reps]
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

HI = jax.lax.Precision.HIGHEST
reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
NS = 8
chunk = 147 * 28533

IBL = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS | F.INCLUDE_LOWPASS
IB = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS


def residue_dots_f64acc(win, P_local, *, M, nb_rs, qn_pad, qn_local, q0):
    """residue_window_dots with float64 accumulation, rounded once back
    to f32 per output."""
    S = win.shape[0]
    nr = nb_rs // qn_pad
    KQ = qn_pad * M
    outs = []
    for r in range(qn_pad):
        Vr = jax.lax.slice(win, (0, r * M), (S, r * M + nr * KQ)) \
            .reshape(S, nr, KQ)
        if qn_local != qn_pad:
            Vr = jax.lax.dynamic_slice_in_dim(Vr, q0 * M, qn_local * M,
                                              axis=2)
        outs.append(jax.lax.dot_general(
            Vr, P_local, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float64,
            precision=HI).astype(win.dtype))
    return jnp.stack(outs, axis=2).reshape(S, nb_rs, -1)


def snr(patch: bool, seconds=20):
    if patch:
        pipeline.residue_window_dots = residue_dots_f64acc
    else:
        pipeline.residue_window_dots = _orig
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


_orig = pipeline.residue_window_dots

# ---- fidelity first (compiles are small-chunk)
db_f32 = snr(False)
print(f"dev/dev f32-acc : {db_f32:8.2f} dB", flush=True)
db_f64 = snr(True)
print(f"dev/dev f64-acc : {db_f64:8.2f} dB", flush=True)

# ---- throughput A/B on the headline body geometry
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


runs = {"f32acc": make(_orig), "f64acc": make(residue_dots_f64acc)}
for name, r in runs.items():
    t0 = time.perf_counter()
    h, a = r(h0, a0)
    float(a)
    print(f"# {name} compile+run {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
res = {k: [] for k in runs}
for _ in range(reps):
    for name, r in runs.items():
        t0 = time.perf_counter()
        h, a = r(h0, a0)
        float(a)
        res[name].append(time.perf_counter() - t0)
for name in runs:
    m = sorted(res[name])[len(res[name]) // 2]
    print(f"{name}: {m/NS*1e3:6.2f} ms/chunk  ({K*NS/m/1e6:7.1f} M out/s)",
          flush=True)
