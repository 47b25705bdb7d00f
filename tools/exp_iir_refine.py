"""Mixed-precision iterative refinement for the f64 block-IIR solve.

The emulated-f64 Toeplitz dot is output-tile-bound (~1.7 us per [8,128]
output tile, tools/exp_ds_concat.py) and there is no MXU escape for an
f64-ACCUMULATED output (acc64 == f64 cost).  But the IIR solve is a
linear system: solve it on the fast f32 MXU, form the residual of the
TRUE f64 recurrence pointwise (5 taps), solve the residual in f32, add.
Error ~2^-24 * gain per pass => ~2^-48 * gain^2 refined — f64 class for
the moderate-Q ART -p lowpass biquads.  The f64 work drops from one
[B,B+4] @ [B+4, nb*Sp] emulated dot (~4.7 ms/section on config-4) to
~3 pointwise passes over n*Sp elements.

Variants (combined order-4 section, config-4 geometry n=524320 S=6),
all through the SHIPPED library entry points:
  f64      exact solve (_iir_y, f64 tables)
  f32      one f32 solve alone (cost floor; accuracy ~2^-24 * gain)
  refine   _iir_y_refined passes=1 (~1e-12 class)
  refine2  _iir_y_refined passes=2, the shipped default (~exact class)

Accuracy vs a sequential numpy f64 oracle at n=32768, incl. streaming
carries over 8 chunks.

Usage: exp_iir_refine.py [reps] [NS]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from art_tpu.engines.biquad import Biquad, biquad_lowpass
from art_tpu.ops.biquad_kernel import _iir_y, _iir_y_refined, iir_tables

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
NS = int(sys.argv[2]) if len(sys.argv) > 2 else 16

coeffs = biquad_lowpass(0.45 * 44100 / 48000)
b1 = Biquad.init(coeffs, 1.0, 6, np.float64)
# combined order-4 section like the shipped config-4 chain
ac = np.convolve(b1.a[:3], b1.a[:3])
bc = np.convolve(np.concatenate([[1.0], b1.b[1:3]]),
                 np.concatenate([[1.0], b1.b[1:3]]))
bc[0] = 0.0
bj = jnp.asarray(bc)
t64 = iir_tables(bc)
t32 = iir_tables(bc, dtype=np.float32)

n, S, sp = 160 * 3277, 6, 6


# ---- correctness vs sequential oracle ---------------------------------
no = 32768
rng = np.random.default_rng(7)
fo = rng.standard_normal((no, S)) * 0.25
yh0 = rng.standard_normal((4, S)) * 0.1
yo = np.zeros((no + 4, S))
yo[:4] = yh0[::-1]
for t in range(no):
    yo[4 + t] = (fo[t] - bc[1] * yo[3 + t] - bc[2] * yo[2 + t]
                 - bc[3] * yo[1 + t] - bc[4] * yo[t])
oracle = yo[4:]
sc = np.max(np.abs(oracle))
fj, yhj = jnp.asarray(fo), jnp.asarray(yh0)
for name, fn in (("f64", lambda: _iir_y(fj, bj, yhj, t64, sp)),
                 ("f32", lambda: _iir_y(fj.astype(jnp.float32), bj,
                                        yhj.astype(jnp.float32), t32,
                                        sp).astype(jnp.float64)),
                 ("refine", lambda: _iir_y_refined(fj, bj, yhj, t32,
                                                   sp, passes=1)),
                 ("refine2", lambda: _iir_y_refined(fj, bj, yhj, t32,
                                                    sp))):
    err = float(jnp.max(jnp.abs(fn() - oracle))) / sc
    print(f"# acc {name:7s} max relerr vs oracle {err:.2e}", flush=True)

# streaming error accumulation: 8 chunks with carried state vs the same
# sequential oracle (does the refined carry degrade over chunks?)
nc, cs = 8, no // 8
for pname, passes in (("refine", 1), ("refine2", 2)):
    yh = yhj
    worst = 0.0
    for c in range(nc):
        fcj = jnp.asarray(fo[c * cs:(c + 1) * cs])
        y = _iir_y_refined(fcj, bj, yh, t32, sp, passes)
        err = float(jnp.max(jnp.abs(
            y - oracle[c * cs:(c + 1) * cs]))) / sc
        worst = max(worst, err)
        yh = y[-4:][::-1]
    print(f"# acc {pname:7s} streaming 8-chunk worst relerr {worst:.2e}",
          flush=True)

# ---- on-chip timing ----------------------------------------------------
x1 = jax.random.normal(jax.random.PRNGKey(3), (n, S), jnp.float64) * 0.25
z4 = jnp.zeros((4, S), jnp.float64)


def make(run):
    # CONSUME THE FULL OUTPUT in the carry (power accumulator): a carry
    # of y[-4:] alone lets XLA dead-code the big Toeplitz dot down to
    # the last block (the first version of this harness did exactly
    # that and reported a 3x win the shipped chain then contradicted)
    @jax.jit
    def go(yh):
        def body(c, _):
            acc, st = c
            y = run(x1 + acc * 1e-300, st)
            return (acc + jnp.sum(y), y[-4:][::-1] * 1.0), None
        (acc, _), _ = jax.lax.scan(body, (jnp.zeros((), jnp.float64), yh),
                                   None, length=NS)
        return acc
    return go


variants = {
    "f64": lambda f, yh: _iir_y(f, bj, yh, t64, sp),
    "f32": lambda f, yh: _iir_y(f.astype(jnp.float32), bj,
                                yh.astype(jnp.float32), t32,
                                sp).astype(jnp.float64),
    # the SHIPPED lane-dense implementations (F2-layout residuals)
    "refine": lambda f, yh: _iir_y_refined(f, bj, yh, t32, sp, passes=1),
    "refine2": lambda f, yh: _iir_y_refined(f, bj, yh, t32, sp),
}
jits = {}
for name, run in variants.items():
    t0 = time.time()
    jits[name] = make(run)
    float(jits[name](z4))
    print(f"# {name} compile+run {time.time()-t0:.1f}s", flush=True)

best = {name: float("inf") for name in variants}
for rep in range(reps):
    for name, go in jits.items():
        t0 = time.perf_counter()
        float(go(z4))
        dt = (time.perf_counter() - t0) / NS
        best[name] = min(best[name], dt)
for name in variants:
    print(f"{name:7s}: {best[name]*1e3:8.2f} ms/section-chunk", flush=True)
