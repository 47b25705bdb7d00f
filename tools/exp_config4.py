"""Decompose the config-4 (5.1ch 48k->44.1k f64 -p) device chain: which
stage binds — the f64 biquad cascade (block-Toeplitz IIR) or the f64
resample contraction — and how much does chunk size buy?

Variants, same-process interleaved, ONE scalar fetch per timed call:
  chain/<n> : cascade -> resampler (the bench 4b shape)
  bq/<n>    : cascade only
  rs/<n>    : resampler only

Usage: python tools/exp_config4.py [reps] [log2n ...]
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
from art_tpu.parallel.streams import DeviceStreamResampler

IB = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS | F.INCLUDE_LOWPASS
reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
log2ns = [int(a) for a in sys.argv[2:]] or [17, 19, 21]

coeffs = biquad_lowpass(0.45 * 44100 / 48000)
results = []
for ln in log2ns:
    n = 1 << ln
    ncalls = max(1, (1 << 22) // n)      # ~constant total work per run
    x = jax.random.normal(jax.random.PRNGKey(4), (6, n),
                          dtype=jnp.float64) * 0.25

    eng = DeviceStreamResampler(6, 380, 380, 48000, 44100, 0, IB,
                                dtype=np.float64)
    eng.advance_position(190)
    eng.prewarm()
    casc = DeviceBiquadCascade(Biquad.init(coeffs, 1.0, 1, np.float64),
                               Biquad.init(coeffs, 1.0, 1, np.float64))
    casc.push_from(Biquad.init(coeffs, 1.0, 6, np.float64),
                   Biquad.init(coeffs, 1.0, 6, np.float64))

    def run_chain():
        produced = 0
        acc = jnp.zeros((), jnp.float64)
        for _ in range(ncalls):
            y = casc.process(x, n)
            out, K, acc = eng.process(y, n, acc)
            produced += K
        float(acc)
        return produced

    def run_bq():
        acc = jnp.zeros((), jnp.float64)
        for _ in range(ncalls):
            y = casc.process(x, n)
            acc = acc + jnp.sum(y[:, -1])
        float(acc)
        return ncalls * n

    def run_rs():
        produced = 0
        acc = jnp.zeros((), jnp.float64)
        for _ in range(ncalls):
            out, K, acc = eng.process(x, n, acc)
            produced += K
        float(acc)
        return produced

    runs = {"chain": run_chain, "bq": run_bq, "rs": run_rs}
    prod = {k: r() for k, r in runs.items()}    # warm/compile
    res = {k: [] for k in runs}
    for _ in range(reps):
        for k, r in runs.items():
            t0 = time.perf_counter()
            r()
            res[k].append(time.perf_counter() - t0)
    for k in runs:
        m = sorted(res[k])[len(res[k]) // 2]
        unit = "out-frames" if k != "bq" else "in-frames"
        print(f"n=2^{ln} {k:5s}: {m*1e3:7.1f} ms  "
              f"({prod[k]/m/1e6:6.2f} M {unit}/s)")
