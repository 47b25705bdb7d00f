"""Ozaki-style fixed-point resample dot: accuracy + cost probe.

exp_fid_schemes.py established that the f32 MXU dot's noise lives INSIDE
the accumulator (K-splits with exact partial combination change nothing:
0.94-0.98x), so the only escape to the single-rounding floor (0.30x, =
the f64acc accuracy at 7.7x cost) is an EXACT accumulator — the MXU's
int8 x int8 -> int32 path (probed exact on this deployment).

Scheme (XLA formulation):
  vi = round(v * 2^19) as int32 (|v| < 1), split into 3 signed base-128
  digits d0..d2; Vr = v - vi*2^-19 exact in f32 (|Vr| <= 2^-20).
  P (static): pi = round(P * 2^sp) with sp chosen so |pi| < 2^27, split
  into 4 digits e0..e3; the dropped tail |Pr| <= 2^-sp/2 enters as a
  bounded ~0.15x-of-highest noise term (kept out of the hot path).
  Weight groups w = i+j (w <= 3; w >= 4 terms are <= 2^-28 relative):
    ONE int8 dot [R, 3K] @ [3K, 4N] -> int32 [R, 4N], where col block w
    stacks (Pd_w; Pd_{w-1}; Pd_{w-2}) so row-block i x col-block w
    contributes d_i @ e_{w-i} — each block sum <= 3*K*64^2 < 2^24, so
    int32 accumulation AND the int32->f32 convert are exact.
  Residual: t2 = Vr @ P, one DEFAULT (single bf16 pass) f32 dot — its
  relative noise lands at 2^-20 x dot-noise, far below budget.
  Combine: out = ds(blk0*2^-14 + blk1*2^-21 + blk2*2^-28 + blk3*2^-35
  + t2), rounded once (two_sum chain — exact on TPU hardware).

Targets (from the round-5 north-star arithmetic): relative error <=
0.65x the HIGHEST dot's 8.48e-8, at <= 1.18x its cost.  Expected: ~0.34x
error; cost hinges on the int8 MXU rate (r8) and the XLA epilogue
traffic (4N int32 grid re-read) — if XLA-cost lands >1.18x, the same
scheme moves into a Pallas kernel where the epilogue fuses.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

HI = jax.lax.Precision.HIGHEST


def two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def ds_sum(parts):
    hi = parts[0]
    lo = jnp.zeros_like(hi)
    for p in parts[1:]:
        hi, e = two_sum(hi, p)
        lo = lo + e
    return hi + lo


def split_digits_i32(vi, ndig):
    """Signed base-128 digits of an int32 array, most significant first:
    vi = sum_i d_i * 128^(ndig-1-i), each d_i in [-64, 63] except the
    leading digit which absorbs the range."""
    digs = []
    rem = vi
    for i in range(ndig - 1, 0, -1):
        # biased split: low7 in [-64, 63], exact integer identity
        low = ((rem + 64) & 127) - 64
        digs.append(low)
        rem = (rem - low) >> 7
    digs.append(rem)
    return digs[::-1]                      # most significant first


def make_ozaki(P_np, K, N, sv=19, ndv=3, ndp=5, resid_precision="default"):
    """Build the XLA ozaki dot closure for a static phase matrix P."""
    # ---- static P digit planes (host, exact integer math)
    maxp = float(np.abs(P_np).max())
    lim = 1 << (7 * ndp - 1)                 # leading digit fits int8
    sp = int(np.floor(np.log2((lim - 1) / maxp)))
    while np.abs(np.rint(P_np.astype(np.float64)
                         * (1 << sp))).max() >= lim:
        sp -= 1
    pi = np.rint(P_np.astype(np.float64) * (1 << sp)).astype(np.int64)
    assert np.abs(pi).max() < lim
    eds = []
    rem = pi
    for i in range(ndp - 1, 0, -1):
        low = ((rem + 64) & 127) - 64
        eds.append(low)
        rem = (rem - low) >> 7
    eds.append(rem)
    eds = eds[::-1]
    assert np.abs(eds[0]).max() <= 127
    # exact P residual (dropped from the hot path; bounded below)
    Pm = (pi.astype(np.float64) / (1 << sp))
    Pr = P_np.astype(np.float64) - Pm
    # stacked [ndv*K, (ndv+...) ... col block w rows: (e_w; e_{w-1}; ...)
    nw = ndv + ndp - 1
    # numpy structure validation: dropping group w=4 costs 6.1x highest
    # (its digit products carry ~2^-21-relative deterministic content);
    # keeping w <= 4 with ndp=5 lands the arithmetic error at 0.05x with
    # the P tail dropped (|Pr| <= 2^-36-class, coherent bound included)
    nw_keep = min(nw, 5)
    Pstack = np.zeros((ndv * K, nw_keep * N), np.int8)
    for w in range(nw_keep):
        for i in range(ndv):
            j = w - i
            if 0 <= j < ndp:
                Pstack[i * K:(i + 1) * K, w * N:(w + 1) * N] = eds[j]
    Pst = jnp.asarray(Pstack)
    P32 = jnp.asarray(P_np.astype(np.float32))
    scale_v = np.float32(2.0 ** -sv)
    # digit i significance: 128^(ndv-1-i) * 2^-sv; digit j of P:
    # 128^(ndp-1-j) * 2^-sp; group w weight:
    wts = [np.float32(2.0 ** (7 * (ndv - 1) + 7 * (ndp - 1) - 7 * w
                              - sv - sp)) for w in range(nw_keep)]
    rp = (jax.lax.Precision.DEFAULT if resid_precision == "default"
          else HI)

    def ozaki(v):
        R = v.shape[0]
        vi = jnp.rint(v * np.float32(1 << sv)).astype(jnp.int32)
        digs = split_digits_i32(vi, ndv)
        vm = vi.astype(jnp.float32) * scale_v
        vr = v - vm
        Vst = jnp.concatenate([d.astype(jnp.int8) for d in digs], axis=1)
        blk = jax.lax.dot_general(Vst, Pst, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        parts = [blk[:, w * N:(w + 1) * N].astype(jnp.float32) * wts[w]
                 for w in range(nw_keep)]
        t2 = jax.lax.dot_general(vr, P32, (((1,), (0,)), ((), ())),
                                 precision=rp)
        return ds_sum(parts + [t2])

    return ozaki, Pr


def main():
    R, K, N = 14268, 588, 160
    rng = np.random.default_rng(7)
    from art_tpu.core import flags as F
    from art_tpu.parallel.streams import DeviceStreamResampler
    IBL = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS | F.INCLUDE_LOWPASS
    eng = DeviceStreamResampler(2, 380, 380, 44100, 48000, 0, IBL)
    P_np = np.asarray(eng._matrix(0), np.float32)
    V_np = (rng.standard_normal((R, K)) * 0.25).astype(np.float32)
    V = jnp.asarray(V_np)
    P = jnp.asarray(P_np)

    ozaki, Pr = make_ozaki(P_np, K, N)
    ozaki_hi, _ = make_ozaki(P_np, K, N, resid_precision="high")
    print(f"# |Pr|max {np.abs(Pr).max():.3e} (dropped-tail bound)")

    def highest(v):
        return jax.lax.dot_general(v, P, (((1,), (0,)), ((), ())),
                                   precision=HI)

    schemes = {"highest": highest, "ozaki": ozaki, "ozaki_rhi": ozaki_hi}

    @jax.jit
    def errs(v):
        oracle = jax.lax.dot_general(v, P, (((1,), (0,)), ((), ())),
                                     precision=HI,
                                     preferred_element_type=jnp.float64)
        osq = jnp.sum(oracle * oracle)
        return osq, {n: jnp.sum((f(v).astype(jnp.float64) - oracle) ** 2)
                     for n, f in schemes.items()}

    osq, esq = errs(V)
    osq = float(osq)
    e0 = None
    for n in schemes:
        rel = float(esq[n]) ** 0.5 / osq ** 0.5
        if n == "highest":
            e0 = rel
        print(f"acc {n:10s} rel_err_rms {rel:.3e}  vs_highest {rel / e0:.3f}")

    # ---- cost anchors: raw int8 dot rate + full schemes, scan-of-32
    Vst_shape = (R, 3 * K)
    V8 = jnp.asarray(rng.integers(-64, 64, Vst_shape, dtype=np.int8))
    P8 = jnp.asarray(rng.integers(-64, 64, (3 * K, 5 * N), dtype=np.int8))

    def int8_raw(v8):
        return jax.lax.dot_general(v8, P8, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    def make_anchor(fn, arg):
        if arg.dtype == jnp.int8:
            @jax.jit
            def anchor(v):
                def body(c, _):
                    out = fn(v + (c & 1).astype(jnp.int8))
                    return (c + (jnp.sum(out) & jnp.int32(1))
                            .astype(jnp.int32), None)
                c, _ = jax.lax.scan(body, jnp.int32(0), None, length=32)
                return c
        else:
            @jax.jit
            def anchor(v):
                def body(c, _):
                    out = fn(v + c * jnp.float32(1e-30))
                    return c + jnp.sum(out * out) * jnp.float32(1e-30), None
                c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=32)
                return c
        return anchor

    anchors = {
        "highest": (make_anchor(highest, V), V),
        "int8_raw": (make_anchor(int8_raw, V8), V8),
        "ozaki": (make_anchor(ozaki, V), V),
        "ozaki_rhi": (make_anchor(ozaki_hi, V), V),
    }
    for n, (a, arg) in anchors.items():
        float(a(arg))                      # compile
    reps = 3
    times = {n: [] for n in anchors}
    for _ in range(reps):
        for n, (a, arg) in anchors.items():
            t0 = time.perf_counter()
            float(a(arg))
            times[n].append(time.perf_counter() - t0)
    t0m = sorted(times["highest"])[reps // 2]
    for n in anchors:
        tm = sorted(times[n])[reps // 2]
        print(f"cost {n:10s} {tm * 1e3 / 32:7.3f} ms/iter  "
              f"vs_highest {tm / t0m:.3f}")


if __name__ == "__main__":
    main()
