"""Round-5 north-star experiment: cheaper within-0.1-dB dot schemes.

The joint north-star needs ONE operating point at >=100x (>=788 Mframes/s)
AND within 0.1 dB of the C reference's round-trip floor (-142.29 dB).  The
f32 HIGHEST MXU dot bottoms at -141.44 (0.85 dB out); f64 accumulation
lands -142.69 (better than C) at ~4x dot cost (SOL.md).  Both legs of the
round trip add the dot's noise, so the requirement translates to: a dot
scheme whose relative error RMS is <= ~0.6x the HIGHEST dot's, at <= ~1.18x
its cost (the throughput margin of the 934.5 record over 788).

This tool measures, ON-CHIP and same-process, the relative error (vs the
f64-accumulated oracle) and the cost (scan-of-32 anchor, carry-coupled
against hoisting — CLAUDE.md micro-anchor discipline) of candidate schemes
on the exact headline contraction shape [R, 588] @ [588, 160]:

  highest     the shipped default (one f32 HIGHEST dot)
  f64acc      the precise mode (f64-accumulated, rounded once) — oracle/cost ref
  split2_f32  K split in 2, partials added in f32 (exp_splitk redo: expect no gain)
  split2_ds   K split in 2, partials two_sum-combined, rounded once
  split5_ds   K split at 128 (5 pieces), ds-combined (each piece is one
              MXU K-pass if the per-pass-rounding model of the f32
              accumulator is right)
  split5_f64  same splits, partials summed in f64 pointwise (accuracy
              ceiling of the splitting idea; cost is known-prohibitive)

Error model being tested: if the MXU rounds its f32 accumulator once per
K-pass (128 deep), splitting at 128 should cut the noise ~2x and ds
recombination keeps it; if per-element rounding dominates, splits change
nothing (and only an integer-exact scheme can win).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

HI = jax.lax.Precision.HIGHEST


def two_sum(a, b):
    """Knuth branch-free exact addition: fl(a+b) and its exact error."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def ds_sum(parts):
    """Sum a list of f32 arrays with a double-single accumulator; round
    once at the end (error ~2^-48 class on real TPU hardware where f32
    adds are IEEE — CLAUDE.md: ds is exact on-chip, unreliable on CPU)."""
    hi = parts[0]
    lo = jnp.zeros_like(hi)
    for p in parts[1:]:
        hi, e = two_sum(hi, p)
        lo = lo + e
    return hi + lo


def splits_of(K, piece):
    cuts = list(range(0, K, piece)) + [K]
    return [(cuts[i], cuts[i + 1]) for i in range(len(cuts) - 1)]


def make_schemes(K):
    def dot(v, p, acc_dt=None):
        return jax.lax.dot_general(
            v, p, (((1,), (0,)), ((), ())), precision=HI,
            preferred_element_type=acc_dt)

    def split(v, p, piece, combine):
        parts = [dot(v[:, a:b], p[a:b]) for a, b in splits_of(K, piece)]
        return combine(parts)

    return {
        "highest": lambda v, p: dot(v, p),
        "f64acc": lambda v, p: dot(v, p, jnp.float64).astype(jnp.float32),
        "split2_f32": lambda v, p: split(v, p, (K + 1) // 2,
                                         lambda ps: sum(ps[1:], ps[0])),
        "split2_ds": lambda v, p: split(v, p, (K + 1) // 2, ds_sum),
        "split5_ds": lambda v, p: split(v, p, 128, ds_sum),
        "split5_f64": lambda v, p: split(
            v, p, 128,
            lambda ps: sum([q.astype(jnp.float64) for q in ps[1:]],
                           ps[0].astype(jnp.float64)).astype(jnp.float32)),
    }


def main():
    R, K, N = 14268, 588, 160
    rng = np.random.default_rng(7)
    # realistic operands: audio-class window rows, the real phase bank
    from art_tpu.core import flags as F
    from art_tpu.parallel.streams import DeviceStreamResampler
    IBL = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS | F.INCLUDE_LOWPASS
    eng = DeviceStreamResampler(2, 380, 380, 44100, 48000, 0, IBL)
    P_np = np.asarray(eng._matrix(0), np.float32)          # [588, 160]
    V_np = (rng.standard_normal((R, K)) * 0.25).astype(np.float32)
    V = jnp.asarray(V_np)
    P = jnp.asarray(P_np)

    schemes = make_schemes(K)

    # ---- accuracy: error vs the f64-accumulated oracle, one scalar fetch
    @jax.jit
    def errs(v, p):
        oracle = jax.lax.dot_general(
            v, p, (((1,), (0,)), ((), ())), precision=HI,
            preferred_element_type=jnp.float64)
        osq = jnp.sum(oracle * oracle)
        out = {}
        for name, fn in schemes.items():
            d = fn(v, p).astype(jnp.float64) - oracle
            out[name] = jnp.sum(d * d)
        return osq, out

    osq, esq = errs(V, P)
    osq = float(osq)
    print(f"# oracle RMS {np.sqrt(osq / (R * N)):.6e}")
    e0 = None
    for name in schemes:
        rel = float(esq[name]) ** 0.5 / osq ** 0.5
        if name == "highest":
            e0 = rel
        ratio = rel / e0 if e0 else float("nan")
        print(f"acc {name:12s} rel_err_rms {rel:.3e}  vs_highest {ratio:.3f}")

    # ---- cost: scan-of-32 anchor per scheme, interleaved, full-output
    # consumption in the carry (CLAUDE.md anchor discipline)
    def make_anchor(fn):
        @jax.jit
        def anchor(v, p):
            def body(c, _):
                out = fn(v + c * jnp.float32(1e-30), p)
                return c + jnp.sum(out * out) * jnp.float32(1e-30), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=32)
            return c
        return anchor

    anchors = {n: make_anchor(fn) for n, fn in schemes.items()
               if n != "split5_f64"}
    for n, a in anchors.items():        # compile
        float(a(V, P))
    reps = 3
    times = {n: [] for n in anchors}
    for _ in range(reps):
        for n, a in anchors.items():    # interleaved same-process
            t0 = time.perf_counter()
            float(a(V, P))
            times[n].append(time.perf_counter() - t0)
    t0m = sorted(times["highest"])[reps // 2]
    for n in anchors:
        tm = sorted(times[n])[reps // 2]
        print(f"cost {n:12s} {tm * 1e3 / 32:7.3f} ms/iter  "
              f"vs_highest {tm / t0m:.3f}")


if __name__ == "__main__":
    main()
