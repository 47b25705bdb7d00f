"""Probe: lax.scan over G fixed-ratio chunk steps vs G separate
dispatches (the shipped bench loop).

Motivation: ~2 ms tunnel dispatch latency per chunk step; scanning G
steps into one dispatch amortizes it G-fold for device-resident serving
loops.  Round 1 tried this and lost to XLA layout assignment inside the
scan body; the body has since been rewritten as the residue-split
contraction (pure reshape views), so re-measure.

Usage: python tools/exp_scan_chunks.py [chunk_log2] [G] [reps]
Same-process interleaved timing; correctness cross-checked (scan outputs
== sequential outputs bitwise, same plans).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from art_tpu.core import flags as F
from art_tpu.parallel.streams import DeviceStreamResampler, _chunk_body

IB = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS | F.INCLUDE_LOWPASS

chunk = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 22)
G = int(sys.argv[2]) if len(sys.argv) > 2 else 8
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

eng = DeviceStreamResampler(2, 380, 380, 44100, 48000, 0, IB)
eng.advance_position(190)
eng.prewarm()
M, L, qn, hist_len = eng.M, eng.L, eng.qn, eng.num_samples

key = jax.random.PRNGKey(0)
noise = jax.random.normal(key, (2, chunk), dtype=jnp.float32) * 0.25

# ---- collect the cyclic plan sequence without touching engine state
probe = DeviceStreamResampler(2, 380, 380, 44100, 48000, 0, IB)
probe.advance_position(190)
plans = []
for _ in range(G):
    K, start, j0, _ = probe._plan(chunk)
    plans.append((K, start, j0))
print("plans:", plans)
nb = max(-(-K // L) for K, _, _ in plans)

Ps = jnp.stack([eng._matrix(j0) for _, _, j0 in plans])         # [G,qnM,L]
starts = jnp.asarray([s for _, s, _ in plans], jnp.int32)
Ks = jnp.asarray([k for k, _, _ in plans], jnp.int32)


@jax.jit
def scan_steps(hist, acc):
    def body(carry, xs):
        hist, acc = carry
        P, start, K = xs
        hist, out, acc = _chunk_body(hist, noise, P, start, K, acc,
                                     M, L, nb, qn, hist_len)
        return (hist, acc), jnp.sum(out * out)
    (hist, acc), pw = jax.lax.scan(body, (hist, acc), (Ps, starts, Ks))
    return hist, acc, pw


# ---- correctness: one scan == G sequential engine steps
seq = DeviceStreamResampler(2, 380, 380, 44100, 48000, 0, IB)
seq.advance_position(190)
seq.prewarm()
acc = jnp.zeros((), jnp.float32)
seq_pw = []
for g in range(G):
    out, K, acc = seq.process(noise, chunk, acc)
    seq_pw.append(float(jnp.sum(out * out)))
h2, a2, pw2 = scan_steps(jnp.zeros((2, hist_len), jnp.float32),
                         jnp.zeros((), jnp.float32))
pw2 = np.asarray(pw2)
print("seq powers:", [round(p, 1) for p in seq_pw])
print("scan powers:", [round(float(p), 1) for p in pw2])
assert np.allclose(seq_pw, pw2, rtol=1e-6), "MISMATCH"
print("hist match:", bool(jnp.all(h2 == seq.hist)))

# ---- interleaved same-process timing
outs = sum(k for k, _, _ in plans)


def t_seq():
    acc = jnp.zeros((), jnp.float32)
    e = seq
    for _ in range(G):
        _, _, acc = e.process(noise, chunk, acc)
    float(acc)


def t_scan(state=[None]):
    if state[0] is None:
        state[0] = (jnp.zeros((2, hist_len), jnp.float32),
                    jnp.zeros((), jnp.float32))
    h, a = state[0]
    h, a, _ = scan_steps(h, a)
    state[0] = (h, a)
    float(a)


t_seq(); t_scan()                       # warm both compiles
rs, rc = [], []
for _ in range(reps):
    t0 = time.perf_counter(); t_seq(); rs.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); t_scan(); rc.append(time.perf_counter() - t0)
ms = sorted(rs)[len(rs) // 2]
mc = sorted(rc)[len(rc) // 2]
print(f"sequential: {ms*1e3:.1f} ms  ({outs/ms/1e6:.1f} M out/s)")
print(f"scan:       {mc*1e3:.1f} ms  ({outs/mc/1e6:.1f} M out/s)")
print(f"scan/seq speedup: {ms/mc:.3f}x")
print("seq times:", [f"{t*1e3:.0f}" for t in rs])
print("scan times:", [f"{t*1e3:.0f}" for t in rc])

# ---- bench-shaped A/B: R groups of G chunks per timed region, ONE
# scalar fetch at the end (exactly the headline bench's structure), so
# the per-region fetch latency stops diluting the dispatch saving.
R = 5
xs = jnp.broadcast_to(noise[None], (G, 2, chunk))
xs = xs + jnp.zeros_like(xs)            # materialize once


def bench_seq():
    acc = jnp.zeros((), jnp.float32)
    for _ in range(R * G):
        _, _, acc = seq.process(noise, chunk, acc)
    float(acc)


def bench_scan():
    acc = jnp.zeros((), jnp.float32)
    for _ in range(R):
        _, _, acc = seq.process_scan(xs, chunk, acc)
    float(acc)


bench_seq(); bench_scan()
rs, rc = [], []
for _ in range(reps):
    t0 = time.perf_counter(); bench_seq(); rs.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); bench_scan(); rc.append(time.perf_counter() - t0)
ms = sorted(rs)[len(rs) // 2]
mc = sorted(rc)[len(rc) // 2]
tot = outs * R
print(f"bench-shape sequential: {ms*1e3:.1f} ms ({tot/ms/1e6:.1f} M out/s)")
print(f"bench-shape scan:       {mc*1e3:.1f} ms ({tot/mc/1e6:.1f} M out/s)")
print(f"bench-shape speedup: {ms/mc:.3f}x")
