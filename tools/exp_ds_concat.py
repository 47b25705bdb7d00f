"""ds-concat f64 matmul probe (config-4 both stages).

Model fitted from exp_f64mm / exp_f64orient / exp_config4_stages: the
emulated-f64 dot costs ~1.73 us per [8,128] OUTPUT tile (the
double-double correction) + ~0.089 us per K-step — output-tile-bound at
the chain's strip shapes (bq [256,256]@[256,16392]: 4128 tiles -> 7.8 ms
predicted = measured; rs 4 anchor dots: 4920 tiles -> 10.7 predicted,
10.9 measured).  Candidate escapes, all exact-product f32 pairs:

  f64      baseline emulated dot
  acc64    f32 hi-planes only, f64 accumulation (accuracy throwaway;
           isolates the f64-accumulate per-tile cost)
  dscat    ONE dot, K tripled: [Ahi|Ahi|Alo] @ [Bhi;Blo;Bhi], f32
           operands, f64 accumulation.  Every f32*f32 product is exact
           in f64, so the result is the ds sum (a_lo*b_lo dropped,
           ~2^-48 relative) with ONE output-correction pass.
  wide     rs only: 4 anchors fused into one dot via the overlapping
           [*, K+3M] operand (materialized) and a banded [K+3M, 4L]
           phase matrix -- N-tile utilization 57% -> 92% at 1.75x flops.

Prints ms + relerr vs the f64 dot for each, bq shape then rs shape.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

HI = jax.lax.Precision.HIGHEST
reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
NS = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def split(x):
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def mk(fn):
    @jax.jit
    def run(a0):
        def step(acc, _):
            return acc + fn(acc), None
        acc, _ = jax.lax.scan(step, a0, None, length=NS)
        return acc
    return run


def probe(name, A, B, wideAB=None):
    """A [M,K] f64, B [K,N] f64."""
    M, K = A.shape
    N = B.shape[1]
    Ah, Al = split(A)
    Bh, Bl = split(B)
    Acat = jnp.concatenate([Ah, Ah, Al], axis=1)          # [M, 3K]
    Bcat = jnp.concatenate([Bh, Bl, Bh], axis=0)          # [3K, N]

    def f_f64(acc):
        Y = jnp.dot(A + acc * 1e-300, B, precision=HI)
        return jnp.sum(Y[::64, ::16] ** 2)

    def f_acc64(acc):
        Y = jnp.dot(Ah + acc.astype(jnp.float32) * 1e-30, Bh,
                    precision=HI, preferred_element_type=jnp.float64)
        return jnp.sum(Y[::64, ::16] ** 2)

    def f_dscat(acc):
        Y = jnp.dot(Acat + acc.astype(jnp.float32) * 1e-30, Bcat,
                    precision=HI, preferred_element_type=jnp.float64)
        return jnp.sum(Y[::64, ::16] ** 2)

    fns = {"f64": f_f64, "acc64": f_acc64, "dscat": f_dscat}
    if wideAB is not None:
        Aw, Bw = wideAB
        def f_wide(acc):
            Y = jnp.dot(Aw + acc * 1e-300, Bw, precision=HI)
            return jnp.sum(Y[::64, ::16] ** 2)
        fns["wide"] = f_wide

    # accuracy (single dots, no scan)
    Yref = np.asarray(jnp.dot(A, B, precision=HI))
    sc = np.abs(Yref).max()
    Yds = np.asarray(jnp.dot(Acat, Bcat, precision=HI,
                             preferred_element_type=jnp.float64))
    print(f"# {name}: dscat relerr {np.abs(Yds - Yref).max() / sc:.2e}",
          flush=True)

    runs = {k: mk(f) for k, f in fns.items()}
    a0 = jnp.zeros((), jnp.float64)
    for k, r in runs.items():
        t0 = time.perf_counter()
        float(r(a0))
        print(f"# {name}/{k} compile+run {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
    res = {k: [] for k in runs}
    for _ in range(reps):
        for k, r in runs.items():
            t0 = time.perf_counter()
            float(r(a0))
            res[k].append(time.perf_counter() - t0)
    gf = 2 * M * K * N / 1e9
    for k in runs:
        m = sorted(res[k])[len(res[k]) // 2] / NS
        print(f"{name:3s} {k:6s}: {m*1e3:7.2f} ms   "
              f"{gf/m/1e9:7.1f} GF/s-equiv", flush=True)


rng = np.random.default_rng(0)

# ---- bq shape: T [256,256] lower-tri, F2 [256, 2049*8]
B_ = 256
nbSp = 2049 * 8
T = np.tril(rng.standard_normal((B_, B_)) * np.exp(
    -np.maximum(np.arange(B_)[:, None] - np.arange(B_)[None, :], 0) / 40.0))
F = rng.standard_normal((B_, nbSp))
probe("bq", jnp.asarray(T), jnp.asarray(F))

# ---- bq shape at Sp=6 lanes
probe("bq6", jnp.asarray(T), jnp.asarray(F[:, :2049 * 6]))

# ---- rs shape: 4 anchor dots [S*nr, K]@[K, L] vs fused wide
S, nr, M_, L, qn = 6, 820, 160, 147, 4
K = qn * M_
Wn = rng.standard_normal((S * nr, K + (qn - 1) * M_))
P = rng.standard_normal((K, L))
# anchors share Wn's columns shifted by r*M
A0 = jnp.asarray(Wn[:, :K])
Pj = jnp.asarray(P)
# wide: operand [S*nr, K+3M], banded [K+3M, 4L]
Pw = np.zeros((K + (qn - 1) * M_, qn * L))
for r in range(qn):
    Pw[r * M_: r * M_ + K, r * L:(r + 1) * L] = P
probe("rs", A0, Pj, wideAB=(jnp.asarray(Wn), jnp.asarray(Pw)))
