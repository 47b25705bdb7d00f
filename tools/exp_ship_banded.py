"""Ship-level A/B of the banded f32 contraction (same-process, on-chip).

After pipeline.residue_window_dots switched every full contraction to
the banded-wide dot (tools/exp_delivery4.py: 0.677x stats-form floor,
delivery forms ~0.70-0.72x) and _group_chunk_out flattens at nb_rs,
this measures the SHIPPED engine entry points interleaved:

  flat_f32     process_flat, default f32 engine (stats form)
  flat_int8    process_flat, precise='int8' engine (the headline mode)
  out_f32      process_flat_out (f32 audio delivered)
  packed_f32   process_flat_packed (int16 PCM delivered)

Rates are Mframes/s of output; the shipped pre-change reference points
(same hour class, exp_delivery4) are stats 875 / delivered 700.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from art_tpu.core import flags as F

IBL = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS | F.INCLUDE_LOWPASS


def main():
    from art_tpu.parallel.streams import DeviceStreamResampler

    G = 8
    chunk = 147 * 28533
    inner = 4
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    key = jax.random.PRNGKey(0)
    xs_flat = jax.random.normal(key, (2, G * chunk), dtype=jnp.float32) \
        * 0.25

    def mk(precise=False):
        eng = DeviceStreamResampler(2, 380, 380, 44100, 48000, 0, IBL,
                                    precise=precise)
        eng.advance_position(190)
        eng.prewarm()
        eng.process(xs_flat[:, :chunk], chunk)
        return eng

    engs = {"flat_f32": mk(), "flat_int8": mk("int8"), "out_f32": mk(),
            "packed_f32": mk()}

    def run(name, ngroups):
        eng = engs[name]
        if name.startswith("flat"):
            acc = jnp.zeros((), jnp.float32)
            K = None
            for _ in range(ngroups):
                K, acc = eng.process_flat(xs_flat, chunk, acc)
            float(acc)
            return int(np.sum(K))
        if name == "out_f32":
            out = None
            for _ in range(ngroups):
                out, Ks = eng.process_flat_out(xs_flat, chunk)
            float(out[0, -1])
            return int(np.sum(Ks))
        clips = jnp.zeros((), jnp.int32)
        packed = None
        for _ in range(ngroups):
            packed, Ks, clips = eng.process_flat_packed(
                xs_flat, chunk, clips, scaler=32768.0, highclip=32767,
                lowclip=-32768)
        int(clips)
        return int(np.sum(Ks))

    produced = {}
    for name in engs:
        produced[name] = run(name, 1)
    times = {n_: [] for n_ in engs}
    for _ in range(reps):
        for name in engs:
            t0 = time.perf_counter()
            run(name, inner)
            times[name].append(time.perf_counter() - t0)
    for name in engs:
        tm = sorted(times[name])[reps // 2]
        frames = inner * produced[name]
        print(f"{name:11s} {tm:7.3f} s  {frames / tm / 1e6:7.1f} Mframes/s"
              f"  ({frames / tm / 1e6 / 7.88:.1f}x C)")


if __name__ == "__main__":
    main()
