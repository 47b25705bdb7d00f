"""Endurance run for the drifting-ratio batched ASRC (BASELINE config 5).

The judged workload: >= 400 process() calls on 256 concurrent streams whose
per-call, per-stream ratios drift continuously (so the call's MAX ratio also
drifts -- the pattern that exposed the round-2 compile-churn bug).  During
the run two sentinel streams are mirrored through independent host
Resampler engines; their emission counts must match exactly on every call,
their samples to the f32 kernel floor, and every stream's final phase
position must equal the host accounting's float64 sequence bit-for-bit.

Usage: bench_asrc_endurance.py [calls] [chunk_frames] [--save=PATH]
Prints one JSON line (sustained M out/s + verification summary).
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from art_tpu.core.flags import BLACKMAN_HARRIS, SUBSAMPLE_INTERPOLATE
from art_tpu.engines.resampler import Resampler
from art_tpu.parallel.asrc import BatchedASRC

args = [a for a in sys.argv[1:] if not a.startswith("--")]
calls = int(args[0]) if len(args) > 0 else 400
n = int(args[1]) if len(args) > 1 else 32768
save = next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--save=")),
            None)

S, taps, filters = 256, 380, 380
eng = BatchedASRC(S, taps, filters, kernel="auto", hankel_kb=256)
eng.advance_position(float(taps // 2))

SENTINELS = (0, 137)
hosts = {}
for s in SENTINELS:
    r = Resampler(1, taps, filters, 0.0,
                  SUBSAMPLE_INTERPOLATE | BLACKMAN_HARRIS, backend="numpy")
    r.advance_position(float(taps // 2))
    hosts[s] = r

rng = np.random.default_rng(0)
x_np = (rng.standard_normal((S, n)) * 0.5).astype(np.float32)
x = jnp.asarray(x_np)


def ratios_at(t: int) -> np.ndarray:
    # per-call drift: both the per-stream spread and the call MAXIMUM move
    return 1.0 + 0.01 * np.sin(0.1 * np.arange(S) + 0.031 * t) \
        + 0.002 * np.sin(0.017 * t)


# warm both compiled specializations (ratio drift keeps one bucket; the
# warmup call is excluded from the timed region)
out, Ks = eng.process(x, ratios_at(0))
for s in SENTINELS:
    hosts[s].process(x_np[s:s + 1], n, int(Ks[s]) + 8, float(ratios_at(0)[s]))

count_errors = 0
sample_md = 0.0
total = 0
t0 = time.perf_counter()
for t in range(1, calls + 1):
    ratios = ratios_at(t)
    out, Ks = eng.process(x, ratios)
    total += int(Ks.sum())
    if t % 50 == 0 or t == calls:
        ov = np.asarray(out)            # sync + spot-verify
        for s in SENTINELS:
            ho, res = hosts[s].process(x_np[s:s + 1], n, int(Ks[s]) + 8,
                                       float(ratios[s]))
            if res.output_generated != int(Ks[s]):
                count_errors += 1
            sample_md = max(sample_md, float(
                np.abs(ho[0, :Ks[s]] - ov[s, :Ks[s]]).max()))
    else:
        for s in SENTINELS:
            ho, res = hosts[s].process(x_np[s:s + 1], n, int(Ks[s]) + 8,
                                       float(ratios[s]))
            if res.output_generated != int(Ks[s]):
                count_errors += 1
_ = float(jnp.sum(out))
dt = time.perf_counter() - t0

pos = eng.get_position()
pos_err = max(abs(pos[s] - hosts[s].get_position()) for s in SENTINELS)
rate = total / dt / 1e6
result = {
    "metric": "256-stream drifting ASRC endurance (sustained)",
    "value": round(rate, 1), "unit": "M out/s",
    "calls": calls, "chunk": n, "outputs": total,
    "count_errors": count_errors, "position_err": pos_err,
    "sentinel_sample_maxdiff": sample_md,
    "vs_baseline": round(rate / 4.55, 1),
}
print(json.dumps(result))
assert count_errors == 0 and pos_err == 0.0
if save:
    with open(save, "w") as f:
        json.dump(result, f)
        f.write("\n")
