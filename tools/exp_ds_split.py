"""In-graph f64->(hi,lo) split cost + ds-concat dots with live splits.

exp_ds_concat pre-splits both operands outside the timed region; real
integration must split the DATA operand in-graph every chunk (the
filter/Toeplitz tables are host constants, split once).  CLAUDE.md's
"pointwise f64 ~2 ms per 512K elements" figure came from a division
prologue — converts may be much cheaper (bandwidth class).  Variants
(bq shape [256,256]@[256,16392], then rs shape):

  f64        emulated f64 dot (baseline)
  dscat      pre-split both (the exp_ds_concat upper bound)
  dslive     A pre-split constant, B split IN-GRAPH per iteration
  split      the in-graph split alone (consumed by f32 sums)

Usage: exp_ds_split.py [reps] [NS]
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


def probe(name, A, B, data_side="B"):
    """data_side: which operand is per-chunk data (split in-graph in
    dslive); the other is a host-constant table (pre-split)."""
    M, K = A.shape
    N = B.shape[1]
    Ah, Al = split(A)
    Bh, Bl = split(B)
    Acat = jnp.concatenate([Ah, Ah, Al], axis=1)
    Bcat0 = jnp.concatenate([Bh, Bl, Bh], axis=0)

    def f_f64(acc):
        Y = jnp.dot(A + acc * 1e-300, B, precision=HI)
        return jnp.sum(Y[::64, ::16] ** 2)

    def f_dscat(acc):
        Y = jnp.dot(Acat + acc.astype(jnp.float32) * 1e-30, Bcat0,
                    precision=HI, preferred_element_type=jnp.float64)
        return jnp.sum(Y[::64, ::16] ** 2)

    if data_side == "B":
        def f_dslive(acc):
            bh, bl = split(B + acc * 1e-300)
            Bcat = jnp.concatenate([bh, bl, bh], axis=0)
            Y = jnp.dot(Acat, Bcat, precision=HI,
                        preferred_element_type=jnp.float64)
            return jnp.sum(Y[::64, ::16] ** 2)

        def f_split(acc):
            bh, bl = split(B + acc * 1e-300)
            return (jnp.sum(bh[::64, ::64]) + jnp.sum(bl[::64, ::64])) \
                .astype(jnp.float64)
    else:
        def f_dslive(acc):
            ah, al = split(A + acc * 1e-300)
            Acat2 = jnp.concatenate([ah, ah, al], axis=1)
            Y = jnp.dot(Acat2, Bcat0, precision=HI,
                        preferred_element_type=jnp.float64)
            return jnp.sum(Y[::64, ::16] ** 2)

        def f_split(acc):
            ah, al = split(A + acc * 1e-300)
            return (jnp.sum(ah[::64, ::64]) + jnp.sum(al[::64, ::64])) \
                .astype(jnp.float64)

    fns = {"f64": f_f64, "dscat": f_dscat, "dslive": f_dslive,
           "split": f_split}
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
B_ = 256
nbSp = 2049 * 8
T = np.tril(rng.standard_normal((B_, B_)))
F = rng.standard_normal((B_, nbSp))
probe("bq", jnp.asarray(T), jnp.asarray(F))

S, nr, M_, L, qn = 6, 820, 160, 147, 4
K = qn * M_
A0 = jnp.asarray(rng.standard_normal((qn * S * nr, K)))
P = jnp.asarray(rng.standard_normal((K, L)))
probe("rs", A0, P, data_side="A")
