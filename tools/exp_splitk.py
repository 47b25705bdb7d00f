"""Split-K accumulation for the fixed-ratio contraction: does breaking
each K=qn*M dot into qn K=M partials with a PAIRWISE f32 combine close
the device round-trip SNR gap (dev/dev -141.47 vs C -142.29,
tools/exp_snr_legs.py / exp_f64acc.py), and what does it cost?

The MXU's f32 running-sum accumulation error grows ~linearly in K;
splitting K=588 into 4x147 with a pairwise tree combine cuts it ~2x
(+6 dB on the accumulation-noise floor -> predicted ~-142.35 dB).
f64 accumulation fully closes it (-142.69) but costs 4.1x.

Usage: python tools/exp_splitk.py [reps]
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


def residue_dots_splitk(win, P_local, *, M, nb_rs, qn_pad, qn_local, q0):
    """residue_window_dots with per-residue K=M partial dots combined
    PAIRWISE in f32 (same elements, same products; accumulation broken at
    M boundaries)."""
    S = win.shape[0]
    nr = nb_rs // qn_pad
    KQ = qn_pad * M
    outs = []
    for r in range(qn_pad):
        Vr = jax.lax.slice(win, (0, r * M), (S, r * M + nr * KQ)) \
            .reshape(S, nr, qn_pad, M)
        # batch over the qn K=M slices: [S, nr, qn, M] x [qn, M, L2]
        P3 = P_local.reshape(qn_pad, M, -1)
        parts = jax.lax.dot_general(
            Vr.transpose(2, 0, 1, 3), P3,
            dimension_numbers=(((3,), (1,)), ((0,), (0,))),
            preferred_element_type=win.dtype,
            precision=HI)                        # [qn, S, nr, L2]
        # pairwise tree combine in f32
        while parts.shape[0] > 1:
            h = parts.shape[0] // 2
            parts = parts[:h] + parts[h:2 * h] if parts.shape[0] % 2 == 0 \
                else jnp.concatenate(
                    [parts[:h] + parts[h:2 * h], parts[2 * h:]], axis=0)
        outs.append(parts[0])
    return jnp.stack(outs, axis=2).reshape(S, nb_rs, -1)


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


db_a = snr(_orig)
print(f"dev/dev merged-K : {db_a:8.2f} dB", flush=True)
db_b = snr(residue_dots_splitk)
print(f"dev/dev split-K  : {db_b:8.2f} dB", flush=True)

# ---- throughput A/B, headline geometry
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


runs = {"merged": make(_orig), "splitk": make(residue_dots_splitk)}
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
