"""A/B: block-IIR biquad — tables (T, G) built in-graph per call (a
256-step lax.scan) vs precomputed once and passed as device constants.
Also sweeps the block size B.  Same-process interleaved on-chip."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import art_tpu  # noqa: F401  (enables x64 BEFORE any jnp call)
import jax
import jax.numpy as jnp

HI = jax.lax.Precision.HIGHEST


def build_tables(b, B):
    A = np.zeros((4, 4))
    A[0] = [-b[1], -b[2], -b[3], -b[4]]
    A[1, 0] = A[2, 1] = A[3, 2] = 1.0
    G = np.zeros((B, 4))
    r = A[0].copy()
    for t in range(B):
        G[t] = r
        r = r @ A
    h = np.concatenate([[1.0], G[:B - 1, 0]])
    d = np.arange(B)[:, None] - np.arange(B)[None, :]
    T = np.where(d >= 0, h[np.clip(d, 0, B - 1)], 0.0)
    return (jnp.asarray(T), jnp.asarray(G),
            jnp.asarray(T[B - 4:][::-1].copy()),
            jnp.asarray(G[B - 4:][::-1].copy()))


def iir_tab(f, T, G, Wv, AB, yh, B):
    n, S = f.shape
    nb = n // B
    fb = f.reshape(nb, B, S)
    v = jnp.einsum("ij,kjs->kis", Wv, fb, precision=HI)

    def sstep(s, vk):
        return AB @ s + vk, s
    _, sks = jax.lax.scan(sstep, yh, v)
    y = (jnp.einsum("ij,kjs->kis", T, fb, precision=HI)
         + jnp.einsum("tj,kjs->kts", G, sks, precision=HI))
    return y.reshape(n, S)


def run(B, n=1 << 17, S=6, reps=5):
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((n, S)))
    yh = jnp.zeros((4, S), jnp.float64)
    b = np.array([1.0, -1.8, 0.9, 0.0, 0.0])  # near-resonant lowpass class
    T, G, Wv, AB = build_tables(b, B)

    from art_tpu.ops import biquad_kernel as bk
    bk._IIR_BLOCK = B
    ingraph = jax.jit(lambda ff: bk._iir_y(ff, jnp.asarray(b), yh))
    tab = jax.jit(lambda ff: iir_tab(ff, T, G, Wv, AB, yh, B))

    ya = ingraph(f)
    yb = tab(f)
    md = float(jnp.max(jnp.abs(ya - yb)))
    print(f"B={B}: ingraph-vs-tab maxdiff {md:.2e}", flush=True)

    def timed(fn):
        t0 = time.perf_counter()
        for _ in range(8):
            y = fn(f)
        _ = float(jnp.sum(y[:8]))
        return (time.perf_counter() - t0) / 8

    timed(ingraph); timed(tab)
    tsA, tsB = [], []
    for _ in range(reps):
        tsA.append(timed(ingraph))
        tsB.append(timed(tab))
    mA, mB = sorted(tsA)[reps // 2], sorted(tsB)[reps // 2]
    print(f"B={B}: ingraph {n/mA/1e6:.1f} M/s ({mA*1e3:.2f} ms)  "
          f"tables {n/mB/1e6:.1f} M/s ({mB*1e3:.2f} ms)  "
          f"ratio {mA/mB:.2f}x", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    for B in (256, 512, 1024):
        run(B)
