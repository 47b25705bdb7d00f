"""A/B the fixed-ratio chunk body's WINDOW side, measured per-chunk
inside ONE scan dispatch (32 steps) so tunnel dispatch/fetch overhead
cannot confound (the flaw in exp_fixed_ablate's multi-dispatch timing):

  a) shipped body: bufp = concat(hist, x) ++ pad; win =
     dynamic_slice(bufp, start, xlen) MATERIALIZED; residue dots on
     reshape views of win
  b) direct-slice body: bufp = one concat(hist, x, pad); each residue
     dot slices dynamic_slice(bufp, start + r*M, nr*KQ) directly — no
     win materialization
  c) = b but with start pre-added into a shifted buffer via one aligned
     static slice (start folded into the scan carry layout) — skipped if
     not expressible cheaply

Values must match bitwise (same elements, same dot shapes).
Usage: python tools/exp_winbuild.py [reps]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from art_tpu.core import flags as F
from art_tpu.parallel.streams import DeviceStreamResampler, _chunk_body

HI = jax.lax.Precision.HIGHEST
IB = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS | F.INCLUDE_LOWPASS
reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
chunk = 1 << 22
NS = 32

eng = DeviceStreamResampler(2, 380, 380, 44100, 48000, 0, IB)
eng.advance_position(190)
K, start, j0, pos0, plan = eng._plan_compute(chunk)
nb = -(-K // eng.L)
M, L, qn, hist_len = eng.M, eng.L, eng.qn, eng.num_samples
P = eng._matrix(j0)
nb_rs = -(-nb // qn) * qn
nr = nb_rs // qn
KQ = qn * M
xlen = (nb_rs + qn) * M
S = 2
x = jax.random.normal(jax.random.PRNGKey(1), (S, chunk), jnp.float32) * 0.25


def body_direct(hist, x, P, start, K, acc):
    """Variant b: no materialized win; per-residue direct dynamic slices."""
    pad = jnp.zeros((S, xlen), dtype=x.dtype)
    bufp = jnp.concatenate([hist, x, pad], axis=1)
    outs = []
    for r in range(qn):
        Vr = jax.lax.dynamic_slice(
            bufp, (jnp.int32(0), start + r * M), (S, nr * KQ)) \
            .reshape(S, nr, KQ)
        outs.append(jax.lax.dot_general(
            Vr, P, (((2,), (0,)), ((), ())),
            preferred_element_type=x.dtype, precision=HI))
    out = jnp.stack(outs, axis=2).reshape(S, nb_rs, L)
    out = jax.lax.slice(out, (0, 0, 0), (S, nb, L)).reshape(S, nb * L)
    valid = (jnp.arange(nb * L, dtype=jnp.int32) < K).astype(out.dtype)
    out = out * valid[None, :]
    acc = acc + jnp.sum(out * out)
    new_hist = jax.lax.dynamic_slice(
        bufp, (0, hist_len + chunk - hist_len), (S, hist_len))
    return new_hist, out, acc


def scan_of(body):
    @jax.jit
    def run(hist, acc):
        def step(carry, _):
            hist, acc = carry
            hist, out, acc = body(hist, x, P, jnp.int32(start),
                                  jnp.int32(K), acc)
            return (hist, acc), jnp.sum(out)
        (hist, acc), s = jax.lax.scan(step, (hist, acc), None, length=NS)
        return hist, acc, s
    return run


def body_ship(hist, x, P, start, K, acc):
    return _chunk_body(hist, x, P, start, K, acc, M, L, nb, qn, hist_len)


run_a = scan_of(body_ship)
run_b = scan_of(body_direct)

h0 = jnp.zeros((S, hist_len), jnp.float32)
a0 = jnp.zeros((), jnp.float32)
ha, aa, sa = run_a(h0, a0)
hb, ab, sb = run_b(h0, a0)
print("bitwise hist:", bool(jnp.all(ha == hb)),
      " per-step sums equal:", bool(jnp.all(sa == sb)))


def timed(run):
    h, a, s = run(h0, a0)
    float(a)


for r in (run_a, run_b):
    timed(r)
res = {"ship": [], "direct": []}
for _ in range(reps):
    for name, r in (("ship", run_a), ("direct", run_b)):
        t0 = time.perf_counter(); timed(r)
        res[name].append(time.perf_counter() - t0)
for name in ("ship", "direct"):
    m = sorted(res[name])[len(res[name]) // 2]
    print(f"{name:6s}: {m*1e3:7.1f} ms total, {m/NS*1e3:5.2f} ms/chunk "
          f"({NS*K/m/1e6:6.1f} M out/s)")


# ---- same-process: does RETURNING the stacked outputs (what a consumer
# outside the dispatch needs) cost the 2-3 ms/chunk gap seen between this
# harness (outputs reduced in-graph) and process_scan (outputs stacked)?
@jax.jit
def run_stack(hist, acc):
    def step(carry, _):
        hist, acc = carry
        hist, out, acc = body_ship(hist, x, P, jnp.int32(start),
                                   jnp.int32(K), acc)
        return (hist, acc), out                    # [NS, S, nb*L] stacked
    (hist, acc), outs = jax.lax.scan(step, (hist, acc), None, length=NS)
    return hist, acc, outs


def timed_stack():
    h, a, outs = run_stack(h0, a0)
    float(a)


timed_stack()
res2 = {"reduce": [], "stack": []}
for _ in range(reps):
    for name, f in (("reduce", lambda: timed(run_a)),
                    ("stack", timed_stack)):
        t0 = time.perf_counter(); f()
        res2[name].append(time.perf_counter() - t0)
for name in ("reduce", "stack"):
    m = sorted(res2[name])[len(res2[name]) // 2]
    print(f"{name:6s}: {m*1e3:7.1f} ms total, {m/NS*1e3:5.2f} ms/chunk "
          f"({NS*K/m/1e6:6.1f} M out/s)")
