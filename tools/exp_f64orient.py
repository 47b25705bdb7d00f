"""f64 residue-dot orientation probe (config-4 resample stage).

exp_f64mm measured the emulated-f64 matmul at ~240 GF/s on the rs strip
[3276, 640] @ [640, 147] vs 1.33 TF/s at [2048^3] — the weak dimension
is the 147-column output (1.15 lane tiles).  Orientation/batching
candidates for the same contraction:

  cur    qn separate [S*nr, 640] @ [640, 147] dots (the shipped shape)
  stack  ONE [qn*S*nr, 640] @ [640, 147] dot (batch the residues)
  tr     transposed: [147, 640] @ [640, qn*S*nr] (output N is large)
  wide   [S*nr, 640] @ [640, 588] (4 anchors' columns fused -> wide N;
         upper-bound probe: would need a 4-anchor output interleave)

Usage: python tools/exp_f64orient.py [reps] [NS]
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

S, nr, K, L, qn = 6, 820, 640, 147, 4
rng = np.random.default_rng(0)
V = jnp.asarray(rng.standard_normal((qn, S * nr, K)))
P = jnp.asarray(rng.standard_normal((K, L)))
P4 = jnp.asarray(rng.standard_normal((K, 4 * L)))
Vf = V.reshape(qn * S * nr, K)
Vt = Vf.T


def mk(fn):
    @jax.jit
    def run(a0):
        def step(acc, _):
            return acc + fn(acc), None
        acc, _ = jax.lax.scan(step, a0, None, length=NS)
        return acc
    return run


def f_cur(acc):
    t = 0.0
    for r in range(qn):
        Y = jnp.dot(V[r] + acc * 1e-300, P, precision=HI)
        t = t + jnp.sum(Y[::64, ::16] ** 2)
    return t


def f_stack(acc):
    Y = jnp.dot(Vf + acc * 1e-300, P, precision=HI)
    return jnp.sum(Y[::64, ::16] ** 2)


def f_tr(acc):
    Y = jnp.dot(P.T, Vt + acc * 1e-300, precision=HI)
    return jnp.sum(Y[::16, ::64] ** 2)


def f_wide(acc):
    Y = jnp.dot(V[0] + acc * 1e-300, P4, precision=HI)
    return jnp.sum(Y[::64, ::16] ** 2)


FNS = {"cur": f_cur, "stack": f_stack, "tr": f_tr, "wide": f_wide}
gf = {"cur": 2 * qn * S * nr * K * L, "stack": 2 * qn * S * nr * K * L,
      "tr": 2 * qn * S * nr * K * L, "wide": 2 * S * nr * K * 4 * L}
runs = {k: mk(f) for k, f in FNS.items()}
a0 = jnp.zeros((), jnp.float64)
for k, r in runs.items():
    t0 = time.perf_counter()
    float(r(a0))
    print(f"# {k} compile+run {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
res = {k: [] for k in runs}
for _ in range(reps):
    for k, r in runs.items():
        t0 = time.perf_counter()
        float(r(a0))
        res[k].append(time.perf_counter() - t0)
for k in runs:
    m = sorted(res[k])[len(res[k]) // 2] / NS
    print(f"{k:6s}: {m*1e3:7.2f} ms  {gf[k]/1e9/m:7.1f} GF/s", flush=True)
