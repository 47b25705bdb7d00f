"""Measure this chip's practical ceilings, as anchors for the
speed-of-light analysis (SOL.md):

  - MXU f32 (Precision.HIGHEST) sustained GEMM rate at large square
    shapes (the ceiling the resample contractions compete against)
  - same at K=588 / K=640 strip shapes (the actual contraction K)
  - HBM streaming rate (big elementwise add, read+write)
  - VPU elementwise f32 rate (fused multiply-add chain on resident data)

Each timed region runs many iterations device-side (lax.scan or repeated
application on device-resident data) and syncs with one scalar fetch, so
tunnel latency is amortized.  Median of 5.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

HI = jax.lax.Precision.HIGHEST
reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def med_time(fn, *args):
    fn(*args)                                      # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(*args)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


key = jax.random.PRNGKey(0)

# ---- MXU f32 HIGHEST: square GEMM
N = 4096
A = jax.random.normal(key, (N, N), jnp.float32)
B = jax.random.normal(key, (N, N), jnp.float32)


@jax.jit
def gemm_loop(A, B):
    def body(c, _):
        c = jnp.dot(c, B, precision=HI) * 1e-3     # rescale, keep finite
        return c, ()
    c, _ = jax.lax.scan(body, A, None, length=16)
    return jnp.sum(c * 1e-20)


t = med_time(lambda: float(gemm_loop(A, B)))
fl = 16 * 2 * N**3
print(f"MXU f32 HIGHEST {N}x{N}x{N}: {fl/t/1e12:.2f} TFLOP/s")

# ---- MXU f32 at the contraction strip shape [rows, K] @ [K, L]
for Kc, L in ((588, 160), (640, 147), (1176, 160)):
    rows = 1 << 17
    V = jax.random.normal(key, (rows, Kc), jnp.float32)
    P = jax.random.normal(key, (Kc, L), jnp.float32)

    @jax.jit
    def strip(V, P):
        # P is made carry-dependent (cheap: P is ~370 KB) so XLA cannot
        # hoist the loop-invariant dot out of the scan — without this the
        # anchor over-reports ~8x (one dot timed as eight)
        def body(c, _):
            d = jnp.dot(V, P + c * 1e-30, precision=HI)
            return jnp.sum(d) * jnp.float32(1e-30), ()
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=8)
        return c

    t = med_time(lambda V=V, P=P: float(strip(V, P)))
    fl = 8 * 2 * rows * Kc * L
    print(f"MXU f32 strip [{rows},{Kc}]@[{Kc},{L}]: {fl/t/1e12:.2f} TFLOP/s")

# ---- HBM stream: big add (2 reads + 1 write per element), 2-D tiling
R, C = 1 << 13, 1 << 14                            # 512 MB per operand
X = jax.random.normal(key, (R, C), jnp.float32)
Y = jax.random.normal(key, (R, C), jnp.float32)


@jax.jit
def hbm(X, Y):
    # the [R, C] scan carry forces a materialized read(c)+read(X)+write(c)
    # pass per step — a strided sample at the end cannot fuse it away
    def body(c, _):
        return c + X, ()
    c, _ = jax.lax.scan(body, Y, None, length=4)
    return jnp.sum(c[::64, ::1024])


t = med_time(lambda: float(hbm(X, Y)))
byt = 4 * 3 * 4 * R * C
print(f"HBM stream (add, 3x4B/elt): {byt/t/1e9:.0f} GB/s")

# ---- VPU: 8-way independent fma chains (ILP-exposed), fused
V = jax.random.normal(key, (256, 1 << 13), jnp.float32)


@jax.jit
def vpu(V):
    def body(c, _):
        cs = [c * jnp.float32(1.0 + 1e-7 * i) for i in range(8)]
        for _ in range(32):                         # unrolled -> one fusion
            cs = [ci * jnp.float32(1.0000001) + jnp.float32(1e-9)
                  for ci in cs]
        acc = cs[0]
        for ci in cs[1:]:
            acc = acc + ci
        return acc * jnp.float32(0.125), ()
    c, _ = jax.lax.scan(body, V, None, length=32)
    return jnp.sum(c * 1e-9)


t = med_time(lambda: float(vpu(V)))
ops = 32 * (8 * 32 * 2 + 16) * V.size
print(f"VPU f32 independent fma chains (fused): {ops/t/1e9:.1f} GOP/s")
