"""Small-config serving aggregate sweep (same-process, on-chip).

BENCH_ALL's preset-1 64-stream serving record under-reported 64x:
`Ks.sum()` counts per-STREAM frames (the engine's rows are independent
mono streams), so the aggregate is rows * Ks.  Corrected, the first
on-chip record reads 49.7 * 64 = 3181 M out/s = 99.4x one C stream --
at the documented ~2-3 G samples/s chip saturation class and just
under the 100x serving bar.  This sweep measures rows x chunk
interleaved to pick the shipped operating point:

  rows  in {32, 64, 128}
  chunk target in {1<<19, 1<<21}

Each variant: the _bench_device_fixed methodology (flat groups, G=8,
stats form, power-accumulator sync), interleaved round-robin batches
so the hour drift cancels; reports aggregate M out/s = rows * frames.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from art_tpu.core import flags as F

IB = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS


def build(rows, chunk_target, G=8):
    from art_tpu.parallel.streams import DeviceStreamResampler
    eng = DeviceStreamResampler(rows, 48, 48, 44100, 48000, 0, IB)
    eng.advance_position(24)
    eng.prewarm()
    chunk = max(1, round(chunk_target / eng.M)) * eng.M
    noise = jax.random.normal(jax.random.PRNGKey(0), (G, rows, chunk),
                              dtype=jnp.float32) * 0.25
    flat = noise.transpose(1, 0, 2).reshape(rows, G * chunk)
    eng.process(noise[0], chunk)

    def run(nch=16):
        produced = 0
        acc = jnp.zeros((), jnp.float32)
        for _ in range(nch // G):
            Ks, acc = eng.process_flat(flat, chunk, acc)
            produced += int(Ks.sum()) * rows
        float(acc)
        return produced

    run()                                  # compile + warm
    return run


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    variants = [(r, ct) for r in (32, 64, 128) for ct in (1 << 19, 1 << 21)]
    runs = {}
    for r, ct in variants:
        runs[(r, ct)] = build(r, ct)
        print(f"# built rows={r} chunk~2^{ct.bit_length()-1}", flush=True)
    times = {v: [] for v in variants}
    prods = {}
    for rep in range(reps):
        for v in variants:
            t0 = time.perf_counter()
            prods[v] = runs[v]()
            times[v].append(time.perf_counter() - t0)
        print(f"# rep {rep} done", flush=True)
    for v in variants:
        dt = sorted(times[v])[len(times[v]) // 2]
        rate = prods[v] / dt / 1e6
        print(f"rows={v[0]:4d} chunk~2^{v[1].bit_length()-1} "
              f"{rate:8.1f} M out/s  = {rate / 32.0:6.1f}x one C stream")


if __name__ == "__main__":
    main()
