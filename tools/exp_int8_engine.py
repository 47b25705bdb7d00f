"""Pin down where the int8 mode loses inside the REAL engine step.

tools/exp_int8_body.py: the dot structure in isolation costs 1.085x
(3-dots) to 1.234x (shipped) of the f32 body.  exp_int8_ship.py: the
full process_flat engine loop measured 2.6x slower.  This compiles the
ACTUAL _chunk_group_static jit at the bench geometry for default /
int8 / int8-variant modes, prints XLA cost_analysis bytes-accessed, and
times the dispatches same-process.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from art_tpu.core import flags as F
from art_tpu.parallel import streams as st

IBL = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS | F.INCLUDE_LOWPASS


def main():
    G = 8
    chunk = 147 * 28533                      # the bench chunk
    key = jax.random.PRNGKey(0)
    xs_flat = jax.random.normal(key, (2, G * chunk), dtype=jnp.float32) \
        * 0.25
    first = xs_flat[:, :chunk]

    runs = {}
    for name, precise in (("default", False), ("int8", "int8")):
        eng = st.DeviceStreamResampler(2, 380, 380, 44100, 48000, 0, IBL,
                                       precise=precise)
        eng.advance_position(190)
        eng.process(first, chunk)            # absorb non-periodic chunk
        G_, K0, start0, nb, Pm, fracv, state0 = eng._flat_plan(xs_flat,
                                                               chunk)
        # roll the plan state back so we can dispatch repeatedly
        eng.output_offset, eng.input_index = state0
        args = (eng.hist, xs_flat, Pm, jnp.zeros((), jnp.float32))
        kw = dict(start=int(start0), K=int(K0), G=G, n=chunk, M=eng.M,
                  L=eng.L, nb=nb, qn=eng.qn, hist_len=eng.num_samples,
                  precise=eng._precise)
        lowered = st._chunk_group_static.lower(*args, **kw)
        comp = lowered.compile()
        ca = comp.cost_analysis()
        print(f"# {name:8s} bytes accessed "
              f"{ca.get('bytes accessed', float('nan')) / 2**30:8.2f} GiB"
              f"  flops {ca.get('flops', float('nan')) / 1e9:9.1f} G")
        runs[name] = (comp, args)

    for n, (comp, args) in runs.items():     # warm
        h, acc = comp(*args)
        float(acc)
    reps = 5
    times = {n: [] for n in runs}
    for _ in range(reps):
        for n, (comp, args) in runs.items():
            t0 = time.perf_counter()
            h, acc = comp(*args)
            float(acc)
            times[n].append(time.perf_counter() - t0)
    t0m = sorted(times["default"])[reps // 2]
    for n in runs:
        tm = sorted(times[n])[reps // 2]
        print(f"time {n:8s} {tm * 1e3:8.1f} ms/group ({tm * 1e3 / G:6.2f} "
              f"ms/chunk)  vs_default {tm / t0m:.3f}")


if __name__ == "__main__":
    main()
