"""Delivery-form A/B on the flat-group steady state (same-process,
interleaved — CLAUDE.md tunnel discipline).

Times the engine-level flat-group dispatches that differ only in WHAT
leaves the graph:

  stats    process_flat        — outputs consumed in-graph by the power
                                 accumulator (the headline form)
  out      process_flat_out    — f32 audio [ch, G*K] materialized to HBM
                                 (the f32 DELIVERED record)
  packed   process_flat_packed — fused ditherless quantize+pack, u16
                                 dense containers [ch, G*K] (the int16
                                 PCM DELIVERED record; HALF the f32
                                 bytes).  Before the lane-dense container
                                 fix this materialized a [ch, K, 2] u8
                                 minor dim -> 128-lane padding (~64x the
                                 output traffic); the short-run bench saw
                                 237 vs 463 Mframes/s for f32 delivery.

Per-variant sync is the variant's natural one (power scalar / last
sample / clip counter).

Usage: exp_delivery.py [--small] [reps]
  --small: tiny chunks on CPU (structure smoke, no timing value)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from art_tpu.core import flags as F

IBL = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS | F.INCLUDE_LOWPASS


def main():
    small = "--small" in sys.argv
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = int(argv[0]) if argv else 5
    if small:
        jax.config.update("jax_platforms", "cpu")
    from art_tpu.parallel.streams import DeviceStreamResampler

    G = 8
    chunk = 147 * (40 if small else 28533)
    inner = 1 if small else 4          # group dispatches per timed rep
    key = jax.random.PRNGKey(0)
    xs_flat = jax.random.normal(key, (2, G * chunk), dtype=jnp.float32) \
        * 0.25

    def make_engine():
        eng = DeviceStreamResampler(2, 380, 380, 44100, 48000, 0, IBL)
        eng.advance_position(190)
        eng.prewarm()
        eng.process(xs_flat[:, :chunk], chunk)   # absorb non-periodic chunk
        return eng

    engs = {n: make_engine() for n in ("stats", "out", "packed")}

    def run_stats(n_groups):
        eng = engs["stats"]
        acc = jnp.zeros((), jnp.float32)
        produced = 0
        for _ in range(n_groups):
            Ks, acc = eng.process_flat(xs_flat, chunk, acc)
            produced += int(Ks.sum())
        float(acc)
        return produced

    def run_out(n_groups):
        eng = engs["out"]
        produced, last = 0, None
        for _ in range(n_groups):
            out, Ks = eng.process_flat_out(xs_flat, chunk)
            produced += int(Ks.sum())
            last = out
        float(last[0, -1])
        return produced

    def run_packed(n_groups):
        eng = engs["packed"]
        clips = jnp.zeros((), jnp.int32)
        produced = 0
        for _ in range(n_groups):
            packed, Ks, clips = eng.process_flat_packed(
                xs_flat, chunk, clips, scaler=32768.0, highclip=32767,
                lowclip=-32768)
            produced += int(Ks.sum())
        int(clips)
        return produced

    runners = {"stats": run_stats, "out": run_out, "packed": run_packed}

    for name, run in runners.items():
        produced = run(inner)          # compile + warm
        print(f"# {name:7s} warm ok, produced {produced}")

    times = {n: [] for n in runners}
    for _ in range(reps):
        for name, run in runners.items():
            t0 = time.perf_counter()
            produced = run(inner)
            times[name].append(time.perf_counter() - t0)
    tm0 = sorted(times["stats"])[reps // 2]
    frames = produced
    for name in runners:
        tm = sorted(times[name])[reps // 2]
        print(f"time {name:7s} {tm:7.3f} s  {frames / tm / 1e6:7.1f} "
              f"Mframes/s  vs_stats {tm / tm0:.3f}")


if __name__ == "__main__":
    main()
