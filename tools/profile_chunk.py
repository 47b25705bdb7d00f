"""Device-side timing breakdown of the fixed-ratio chunk step (real TPU).

Variants:
  full   : production _chunk_step (window build + einsum + mask + acc + hist)
  einsum : matmul only, X pre-materialized on device
  shifts : per-shift decomposition sum_q W2[:,q:q+nb] @ P3[q] (no X blowup)
  build  : window build only (no matmul)
"""
import time, sys
import jax, jax.numpy as jnp
import numpy as np

from art_tpu.core import flags as F
from art_tpu.parallel.streams import DeviceStreamResampler, _chunk_step

IB = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS | F.INCLUDE_LOWPASS
chunk = 1 << 22
eng = DeviceStreamResampler(2, 380, 380, 44100, 48000, 0, IB)
eng.advance_position(190)
eng.prewarm()
M, L = 147, 160
nb = (chunk + eng.num_samples) // M   # approx
# pull actual params from a dry process call
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (2, chunk), dtype=jnp.float32) * 0.25
acc = jnp.zeros((), jnp.float32)
out, K, acc = eng.process(x, chunk, acc)   # warms the real step
print("K per chunk:", K, file=sys.stderr)

# grab the P matrix the engine used
P = None
for attr in ("_mats", "_matrices", "mats"):
    d = getattr(eng, attr, None)
    if d: P = list(d.values())[0]; break
if P is None:
    import art_tpu.parallel.streams as st
    print([a for a in dir(eng) if not a.startswith("__")], file=sys.stderr)
    sys.exit(1)
P = jnp.asarray(P)
S_, L_ = P.shape
qn = S_ // M
print("P shape", P.shape, "qn", qn, file=sys.stderr)

nb = 28800   # block rows, close to production
ch = 2

def timeit(f, *args, n=8):
    r = f(*args); jax.block_until_ready(r)
    # tunnel: block_until_ready unreliable; force a scalar fetch
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    s = float(jnp.sum(r[0] if isinstance(r, tuple) else r))
    dt = (time.perf_counter() - t0) / n
    return dt, s

# pre-built X for einsum-only
W2 = jax.random.normal(key, (ch, nb + qn, M), dtype=jnp.float32)
X = jnp.reshape(jnp.stack([W2[:, q:q + nb] for q in range(qn)], axis=2),
                (ch, nb, qn * M))
X = jax.block_until_ready(X)

@jax.jit
def einsum_only(X, P):
    # explicit precision: the default (single-pass bf16) hits a pathological
    # slow path for unaligned contractions on this device
    return jnp.einsum("cns,sl->cnl", X, P, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)

@jax.jit
def shifts(W2, P):
    P3 = P.reshape(qn, M, L)
    out = None
    for q in range(qn):
        part = jax.lax.dot_general(W2[:, q:q + nb], P3[q],
                                   (((2,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
        out = part if out is None else out + part
    return out

@jax.jit
def build_only(W2):
    X = jnp.reshape(jnp.stack([W2[:, q:q + nb] for q in range(qn)], axis=2),
                    (ch, nb, qn * M))
    return jnp.sum(X[:, ::997, ::131])   # touch it so it materializes

out_frames = nb * L
for name, fn, args in [("einsum", einsum_only, (X, P)),
                       ("shifts", shifts, (W2, P)),
                       ("build", build_only, (W2,))]:
    dt, s = timeit(fn, *args)
    print(f"{name:8s} {dt*1e3:8.2f} ms  -> {out_frames/dt/1e6:8.0f} Mout/s")

# full production step timing for the same size
t0 = time.perf_counter()
nrep = 8
for _ in range(nrep):
    out, K, acc = eng.process(x, chunk, acc)
_ = float(acc)
dt = (time.perf_counter() - t0) / nrep
print(f"{'full':8s} {dt*1e3:8.2f} ms  -> {K/dt/1e6:8.0f} Mout/s")
