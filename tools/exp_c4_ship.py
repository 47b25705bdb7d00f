"""Shipped config-4 device chain (the bench.py 4b shape), interleaved A/B.

DeviceBiquadCascade(combined=True) pre-filter -> f64 DeviceStreamResampler,
6 channels, M-multiple ~2^19 chunks, one scalar fetch per timed run.
Variants (SAME-PROCESS, alternating timed batches per CLAUDE.md):
  exact    emulated-f64 block-IIR solve (TG-fused dot, sp=6 lanes)
  refine   mixed-precision iterative refinement (_iir_y_refined: f32 MXU
           solves + f64 pointwise residuals; section-level 3.06x,
           tools/exp_iir_refine.py)
Both chains share the banded-wide f64 residue contraction; each variant
keeps its own engine/cascade state so the timed streams are independent.

Usage: python tools/exp_c4_ship.py [reps] [nch]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from art_tpu.core import flags as F
from art_tpu.engines.biquad import Biquad, biquad_lowpass
from art_tpu.ops.biquad_kernel import DeviceBiquadCascade
from art_tpu.parallel.streams import DeviceStreamResampler as DSR

args = [a for a in sys.argv[1:] if not a.startswith("--")]
reps = int(args[0]) if len(args) > 0 else 5
nch = int(args[1]) if len(args) > 1 else 8

IB = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS
coeffs = biquad_lowpass(0.45 * 44100 / 48000)


def build(refine):
    eng = DSR(6, 380, 380, 48000, 44100, 0, IB | F.INCLUDE_LOWPASS,
              dtype=np.float64)
    eng.advance_position(190)
    eng.prewarm()
    casc = DeviceBiquadCascade(Biquad.init(coeffs, 1.0, 1, np.float64),
                               Biquad.init(coeffs, 1.0, 1, np.float64),
                               combined=True, refine=refine)
    casc.push_from(Biquad.init(coeffs, 1.0, 6, np.float64),
                   Biquad.init(coeffs, 1.0, 6, np.float64))
    return eng, casc


variants = {"exact": build(False), "refine": build(True)}
chunk = variants["exact"][0].M * (((1 << 19) // variants["exact"][0].M) + 1)
x = jax.random.normal(jax.random.PRNGKey(4), (6, chunk),
                      dtype=jnp.float64) * 0.25


def run(eng, casc):
    produced = 0
    acc = jnp.zeros((), jnp.float64)
    for _ in range(nch):
        y = casc.process(x, chunk)
        out, K, acc = eng.process(y, chunk, acc)
        produced += K
    float(acc)
    return produced


produced = None
for name, (eng, casc) in variants.items():
    t0 = time.perf_counter()
    produced = run(eng, casc)
    print(f"# {name} compile+run {time.perf_counter()-t0:.1f}s  "
          f"chunk={chunk} produced={produced}", file=sys.stderr, flush=True)

times = {name: [] for name in variants}
for _ in range(reps):
    for name, (eng, casc) in variants.items():
        t0 = time.perf_counter()
        run(eng, casc)
        times[name].append(time.perf_counter() - t0)
for name, ts in times.items():
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:7s}: {med/nch*1e3:7.2f} ms/chunk   "
          f"{produced/med/1e6:7.2f} M out/s   (vs 1.35 M baseline = "
          f"{produced/med/1e6/1.35:.1f}x)", flush=True)
