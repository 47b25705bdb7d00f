"""Shipped config-4 device chain (the bench.py 4b shape), standalone.

DeviceBiquadCascade(combined=True) pre-filter -> f64 DeviceStreamResampler,
6 channels, M-multiple ~2^19 chunks, one scalar fetch per timed run.
Measures the shipped code as-is (block-IIR TG-fused dot + sp=6 lanes +
banded-wide residue contraction when present).

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

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
nch = int(sys.argv[2]) if len(sys.argv) > 2 else 8

IB = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS
coeffs = biquad_lowpass(0.45 * 44100 / 48000)
eng = DSR(6, 380, 380, 48000, 44100, 0, IB | F.INCLUDE_LOWPASS,
          dtype=np.float64)
eng.advance_position(190)
eng.prewarm()
chunk = eng.M * (((1 << 19) // eng.M) + 1)
casc = DeviceBiquadCascade(Biquad.init(coeffs, 1.0, 1, np.float64),
                           Biquad.init(coeffs, 1.0, 1, np.float64),
                           combined=True)
casc.push_from(Biquad.init(coeffs, 1.0, 6, np.float64),
               Biquad.init(coeffs, 1.0, 6, np.float64))
x = jax.random.normal(jax.random.PRNGKey(4), (6, chunk),
                      dtype=jnp.float64) * 0.25


def run():
    produced = 0
    acc = jnp.zeros((), jnp.float64)
    for _ in range(nch):
        y = casc.process(x, chunk)
        out, K, acc = eng.process(y, chunk, acc)
        produced += K
    float(acc)
    return produced


t0 = time.perf_counter()
produced = run()
print(f"# compile+run {time.perf_counter()-t0:.1f}s  chunk={chunk} "
      f"produced={produced}", file=sys.stderr, flush=True)
times = []
for _ in range(reps):
    t0 = time.perf_counter()
    run()
    times.append(time.perf_counter() - t0)
med = sorted(times)[len(times) // 2]
print(f"chain: {med/nch*1e3:7.2f} ms/chunk   "
      f"{produced/med/1e6:7.2f} M out/s   (vs 1.35 M baseline = "
      f"{produced/med/1e6/1.35:.1f}x)", flush=True)
