"""On-chip validation of the shipped precise='int8' engine mode.

(a) Round-trip fidelity (the artest -i -e metric on bit-identical noise,
    bench._measure_roundtrip_snr) with both legs in int8 mode — the
    joint-north-star fidelity half.  Expect ~-142.6 dB (the f64acc mode
    measured -142.69; C reference -142.29; within-band means
    >= -142.19 or better than C).
(b) Same-process interleaved A/B of the headline process_flat loop:
    default f32 vs precise='int8' vs precise=True — the throughput half.
    Expected from tools/exp_ozaki.py: int8 ~1.15x the default's dot cost
    (~0.87x throughput), f64acc ~4-7x.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import bench
from art_tpu.core import flags as F
from art_tpu.parallel.streams import DeviceStreamResampler

IBL = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS | F.INCLUDE_LOWPASS


def throughput_ab(reps=5, G=8, nloops=2):
    chunk = bench._mult_chunk(1 << 22, 147)
    key = jax.random.PRNGKey(0)
    xs_flat = jax.random.normal(key, (2, G * chunk), dtype=jnp.float32) \
        * 0.25
    first = xs_flat[:, :chunk]
    engines = {}
    for name, precise in (("default", False), ("int8", "int8"),
                          ("f64acc", True)):
        eng = DeviceStreamResampler(2, 380, 380, 44100, 48000, 0, IBL,
                                    precise=precise)
        eng.advance_position(190)
        eng.prewarm()
        eng.process(first, chunk)
        engines[name] = eng

    def run(eng, n=nloops):
        produced = 0
        acc = jnp.zeros((), jnp.float32)
        for _ in range(n):
            Ks, acc = eng.process_flat(xs_flat, chunk, acc)
            produced += int(Ks.sum())
        float(acc)
        return produced

    for eng in engines.values():        # compile
        run(eng, 1)
    times = {n: [] for n in engines}
    produced = {n: 0 for n in engines}
    for _ in range(reps):
        for n, eng in engines.items():
            t0 = time.perf_counter()
            produced[n] = run(eng)
            times[n].append(time.perf_counter() - t0)
    t0m = sorted(times["default"])[reps // 2]
    for n in engines:
        tm = sorted(times[n])[reps // 2]
        rate = produced[n] / tm / 1e6
        print(f"rate {n:8s} {rate:8.1f} M out/s   vs_default "
              f"{t0m / tm:.3f}")


def main():
    print("# throughput A/B (same-process, interleaved)")
    throughput_ab()
    print("# round-trip fidelity (60 s artest noise, both legs)")
    for mode in ("int8", False, True):
        db = bench._measure_roundtrip_snr(60, precise=mode)
        print(f"roundtrip precise={mode!r}: {db:.2f} dB  "
              f"(C ref {bench.REF_DIFF_RMS_DB})")


if __name__ == "__main__":
    main()
