"""A/B the single-pass Pallas fixed-ratio body (ops/fixed_pallas) against
the shipped XLA residue-split body, same-process interleaved, measured as
ONE scan dispatch of NS steps per timed call (the clean methodology from
exp_winbuild.py — per-dispatch tunnel overhead cannot confound).

Two output regimes, matching SOL.md's decomposition:
  - "fused": outputs reduced in-graph (scan emits per-step sums) — the
    resample->consumer deployment shape,
  - "stack": outputs stacked and returned (the bench / process_scan shape,
    +1 output-materialization HBM pass for the XLA body; the Pallas body
    writes its masked outputs exactly once either way).

Usage: python tools/exp_fixed_pallas.py [reps] [jb ...] [--interp]
  --interp uses the preset-1 interpolated config (mono 48x48, the
  config-1 class: stacked banks + phase lerp) instead of the reduced
  headline config.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import os

import jax

if os.environ.get("ART_CPU"):  # axon ignores JAX_PLATFORMS; use the config
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from art_tpu.core import flags as F
from art_tpu.ops.fixed_pallas import fixed_step_pallas
from art_tpu.parallel.streams import (DeviceStreamResampler, _chunk_body,
                                      _chunk_body_interp)

IB = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS | F.INCLUDE_LOWPASS
args = [a for a in sys.argv[1:] if a != "--interp"]
MODE_INTERP = "--interp" in sys.argv
reps = int(args[0]) if args else 5
jbs = [int(a) for a in args[1:]] or [64]
chunk = int(os.environ.get("CHUNK", 1 << 22))
NS = int(os.environ.get("NS", 32))
INTERP = jax.default_backend() != "tpu"

if MODE_INTERP:
    eng = DeviceStreamResampler(1, 48, 48, 44100, 48000, 0,
                                F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS)
else:
    eng = DeviceStreamResampler(2, 380, 380, 44100, 48000, 0, IB)
ch = eng.num_channels
eng.advance_position(eng.num_taps // 2)
K, start, j0, pos0, plan = eng._plan_compute(chunk)
nb = -(-K // eng.L)
M, L, qn, hist_len = eng.M, eng.L, eng.qn, eng.num_samples
if MODE_INTERP:
    P, fracv = eng._interp_matrix(pos0)[:2]
else:
    P, fracv = eng._matrix(j0), None
x = jax.random.normal(jax.random.PRNGKey(1), (ch, chunk), jnp.float32) * 0.25


def scan_of(body, stack: bool):
    @jax.jit
    def run(hist, acc):
        def step(carry, _):
            hist, acc = carry
            hist, out, acc = body(hist, x, P, jnp.int32(start),
                                  jnp.int32(K), acc)
            return (hist, acc), (out if stack else jnp.sum(out))
        (hist, acc), s = jax.lax.scan(step, (hist, acc), None, length=NS)
        return hist, acc, (jnp.sum(s[-1]) if stack else s)
    return run


def body_ship(hist, x, P, start, K, acc):
    if MODE_INTERP:
        return _chunk_body_interp(hist, x, P, fracv, start, K, acc, M, L,
                                  nb, qn, hist_len)
    return _chunk_body(hist, x, P, start, K, acc, M, L, nb, qn, hist_len)


SPLIT = bool(int(os.environ.get("SPLIT_OUT", "0")))


def body_pl(jb):
    def f(hist, x, P, start, K, acc):
        return fixed_step_pallas(hist, x, P, start, K, acc, M=M, L=L,
                                 nb=nb, qn=qn, hist_len=hist_len, jb=jb,
                                 fracv=fracv, interpret=INTERP,
                                 split_out=SPLIT)
    return f


h0 = jnp.zeros((ch, hist_len), jnp.float32)
a0 = jnp.zeros((), jnp.float32)

runs = {}
for stack in (False, True):
    tag = "stack" if stack else "fused"
    runs[f"ship/{tag}"] = scan_of(body_ship, stack)
    for jb in jbs:
        runs[f"pl{jb}/{tag}"] = scan_of(body_pl(jb), stack)

# correctness: accs agree to f32 sum-order noise
accs = {}
for name, r in runs.items():
    h, a, s = r(h0, a0)
    accs[name] = float(a)
base = accs["ship/fused"]
for name, a in accs.items():
    rel = abs(a - base) / abs(base)
    assert rel < 1e-5, (name, a, base)
print("accs agree:", {k: round(v, 1) for k, v in accs.items()},
      file=sys.stderr)


def timed(r):
    h, a, s = r(h0, a0)
    float(a)


res = {k: [] for k in runs}
for _ in range(reps):
    for name, r in runs.items():
        t0 = time.perf_counter()
        timed(r)
        res[name].append(time.perf_counter() - t0)
for name in runs:
    m = sorted(res[name])[len(res[name]) // 2]
    print(f"{name:14s}: {m/NS*1e3:5.2f} ms/chunk ({NS*K/m/1e6:6.1f} M out/s)")
