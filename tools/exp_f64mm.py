"""f64 matmul emulation cost on TPU: precision flag x shape sweep.

The config-4 chain's floor is emulated-f64 matmuls measured ~30x below
f32 (TODO.md) — yet CLAUDE.md records "~4x slower than f32" at large
square shapes.  Everything in the f64 path passes
precision=jax.lax.Precision.HIGHEST (the f32-mandated barrier against
single-pass bf16) — but for f64 operands the emulation strategy may key
off that flag and multiply passes.  Measure (ms, GF/s, and relative
error vs numpy f64) for DEFAULT vs HIGHEST over the shapes the biquad
and the f64 residue dots actually run:

  bq   : [256, 256]  @ [256, 16384]   (T @ F2, per section)
  rs   : [3276, 640] @ [640, 147]     (residue dot class, 2^19 chunk)
  sq   : [2048, 2048] @ [2048, 2048]  (the large-square reference point)
  f32sq: same square in f32 HIGHEST   (the comparison anchor)

Method: one jit per variant, NS-iteration lax.scan with carry-coupled
operand, scalar fetch (CLAUDE.md measurement discipline).

Usage: python tools/exp_f64mm.py [reps] [NS]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
NS = int(sys.argv[2]) if len(sys.argv) > 2 else 16

DEF = jax.lax.Precision.DEFAULT
HI = jax.lax.Precision.HIGHEST

CASES = [
    ("bq", (256, 256, 16384), jnp.float64),
    ("rs", (3276, 640, 147), jnp.float64),
    ("sq", (2048, 2048, 2048), jnp.float64),
    ("f32sq", (2048, 2048, 2048), jnp.float32),
]

rng = np.random.default_rng(0)
for name, (m, k, n), dt in CASES:
    A = rng.standard_normal((m, k))
    Bm = rng.standard_normal((k, n))
    truth = A @ Bm
    Aj = jnp.asarray(A, dt)
    Bj = jnp.asarray(Bm, dt)
    gf = 2 * m * k * n / 1e9
    for pname, prec in (("DEF", DEF), ("HI", HI)):
        @jax.jit
        def run(a0, A=Aj, B=Bj, prec=prec):
            def step(acc, _):
                Y = jnp.dot(A + acc * 1e-300, B, precision=prec)
                return acc + jnp.sum(Y[::64, ::64] ** 2), None
            acc, _ = jax.lax.scan(step, a0, None, length=NS)
            return acc
        # accuracy probe outside the timed scan
        Y1 = jax.jit(lambda A, B, prec=prec: jnp.dot(A, B,
                                                     precision=prec))(Aj, Bj)
        rel = float(jnp.max(jnp.abs(Y1 - truth))
                    / np.max(np.abs(truth)))
        a0 = jnp.zeros((), dt)
        t0 = time.perf_counter()
        float(run(a0))
        print(f"# {name}/{pname} compile+run {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(a0))
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[len(ts) // 2] / NS
        print(f"{name:6s} {pname:3s}: {med*1e3:8.3f} ms  "
              f"{gf/med:8.1f} GF/s  relerr={rel:.2e}", flush=True)
