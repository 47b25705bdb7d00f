"""On-TPU Mosaic smoke: compile + run every shipped Pallas kernel at one
production geometry each and check against a host-side oracle.

The pytest suite runs the Pallas kernels in interpret mode on CPU (fast,
deterministic), which cannot catch a remote-Mosaic lowering regression (the
HTTP-500 class documented in CLAUDE.md).  This target is the on-hardware
regression gate: run it before each round's snapshot and commit the JSON
artifact (MOSAIC_SMOKE_r<N>.json).

Usage: tpu_smoke.py [--save=PATH]   (exits nonzero on any failure)
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

results = {"backend": jax.default_backend(), "kernels": {}}
save = next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--save=")),
            None)
ok_all = True


def record(name, fn):
    global ok_all
    t0 = time.perf_counter()
    try:
        detail = fn()
        results["kernels"][name] = {"ok": True,
                                    "secs": round(time.perf_counter() - t0, 1),
                                    **(detail or {})}
    except Exception as e:
        ok_all = False
        results["kernels"][name] = {"ok": False, "error": repr(e)[:500]}
    print(name, results["kernels"][name], file=sys.stderr)


def _asrc_inputs(n=2048, S=256, taps=380, F=380, drift=0.01):
    from art_tpu.core.filters import make_filter_bank
    from art_tpu.ops.pallas_kernels import (dense_bank_tables,
                                            pack_step_scalars,
                                            split_f64_pairs)
    rng = np.random.default_rng(0)
    half = taps // 2
    hist_len = taps * 16
    bank = make_filter_bank(taps, F, 1.0, True, np.float32)
    bt, bt2 = dense_bank_tables(bank)
    hist = jnp.asarray(rng.standard_normal((S, hist_len)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((S, n)).astype(np.float32))
    ratios = 1.0 / (1.0 + drift * np.sin(np.arange(S) * 0.1 + 0.3))
    offsets = np.full(S, float(half), np.float64) + \
        np.random.default_rng(1).random(S)
    input_index = taps
    k_max = int(np.ceil((n + 2) * ratios.max())) + 2
    bound = float(input_index + n - half)
    ks = np.arange(k_max, dtype=np.float64)
    Ks = ((offsets[:, None] + ks[None, :] / ratios[:, None])
          < bound).sum(axis=1).astype(np.int32)
    oh, ol = split_f64_pairs(offsets)
    yh, yl = split_f64_pairs(1.0 / ratios)
    scal, ints = pack_step_scalars(oh, ol, yh, yl, Ks,
                                   hist_len - input_index)
    return (dict(hist=hist, x=x, bt=jnp.asarray(bt), bt2=jnp.asarray(bt2),
                 scal=jnp.asarray(scal), ints=jnp.asarray(ints),
                 offsets=offsets, ratios=ratios, Ks=Ks, k_max=k_max,
                 bank=bank, taps=taps, F=F, hist_len=hist_len, tp=bt.shape[0],
                 n=n, S=S, input_index=input_index))


A = _asrc_inputs()

# host oracle: the XLA gather step (itself float-exact vs the host engine)
from art_tpu.parallel.asrc import _asrc_step  # noqa: E402

kmax_o = A["k_max"]
oracle_hist, oracle_out = _asrc_step(
    A["hist"], A["x"], jnp.asarray(A["bank"]), jnp.asarray(A["offsets"]),
    jnp.asarray(A["ratios"]), jnp.asarray(A["Ks"]),
    jnp.int32(A["hist_len"] - A["input_index"]),
    A["taps"], A["F"], kmax_o, A["hist_len"])
oracle = np.asarray(oracle_out)
scale = float(np.abs(oracle).max())


def check(out, kp):
    got = np.asarray(out)[:, :kmax_o]
    md = float(np.abs(got - oracle[:, :got.shape[1]]).max())
    assert md <= 3e-6 * scale, f"maxdiff {md} vs scale {scale}"
    return {"maxdiff": md}


def smoke_hankel():
    from art_tpu.ops.pallas_kernels import asrc_step_hankel, hankel_segl
    kb, smax = 256, 4
    kp = -(-kmax_o // kb) * kb
    h, out = asrc_step_hankel(
        A["hist"], A["x"], A["bt"], A["bt2"], A["scal"], A["ints"],
        A["taps"], A["F"], kp, kp, A["hist_len"], A["tp"],
        hankel_segl(A["tp"], kb, smax), kb, smax, False)
    return check(out, kp)


def smoke_hankel_wide():
    """Wide-drift Hankel tier (smax=64, binary carry select — the
    BatchedASRC auto default): ratios at ~20% drift, beyond the narrow
    tier's bound, vs its own XLA oracle."""
    from art_tpu.ops.pallas_kernels import asrc_step_hankel, hankel_segl
    from art_tpu.parallel.asrc import _asrc_step
    W = _asrc_inputs(drift=0.20)
    kb, smax = 256, 64
    kmx = W["k_max"]
    kp = -(-kmx // kb) * kb
    ow_hist, ow_out = _asrc_step(
        W["hist"], W["x"], jnp.asarray(W["bank"]),
        jnp.asarray(W["offsets"]), jnp.asarray(W["ratios"]),
        jnp.asarray(W["Ks"]), jnp.int32(W["hist_len"] - W["input_index"]),
        W["taps"], W["F"], kmx, W["hist_len"])
    ow = np.asarray(ow_out)
    h, out = asrc_step_hankel(
        W["hist"], W["x"], W["bt"], W["bt2"], W["scal"], W["ints"],
        W["taps"], W["F"], kp, kp, W["hist_len"], W["tp"],
        hankel_segl(W["tp"], kb, smax), kb, smax, False)
    got = np.asarray(out)[:, :kmx]
    sc = float(np.abs(ow).max())
    md = float(np.abs(got - ow[:, :got.shape[1]]).max())
    assert md <= 3e-6 * sc, f"maxdiff {md} vs scale {sc}"
    return {"maxdiff": md}


def smoke_dense():
    from art_tpu.ops.pallas_kernels import asrc_step_dense
    kb = 512
    kp = -(-kmax_o // kb) * kb
    h, out = asrc_step_dense(
        A["hist"], A["x"], A["bt"], A["bt2"], A["scal"], A["ints"],
        A["taps"], A["F"], kp, kp, A["hist_len"], A["tp"],
        A["tp"] + 1024, kb, False)
    return check(out, kp)


def smoke_v1():
    from art_tpu.parallel.asrc import BatchedASRC
    eng = BatchedASRC(A["S"], A["taps"], A["F"], kernel="pallas")
    eng.offsets = A["offsets"].copy()
    out, Ks = eng.process(A["x"][:, :512], A["ratios"])
    assert np.array_equal(np.asarray(Ks) >= 0, np.ones(A["S"], bool))
    return {"outputs": int(np.asarray(Ks).sum())}


def smoke_polyphase():
    from art_tpu.ops.pallas_kernels import polyphase_apply_pallas
    rng = np.random.default_rng(2)
    ch, M, L = 2, 147, 160
    qn = 4
    nb_pad = 512
    wlen = (nb_pad + 512) * M
    win = jnp.asarray(rng.standard_normal((ch, wlen)).astype(np.float32))
    P = rng.standard_normal((qn * M, L)).astype(np.float32) * 0.05
    out = polyphase_apply_pallas(win, jnp.asarray(P), M=M, qn=qn, L=L)
    got = np.asarray(out)
    # oracle: block-Toeplitz einsum on the first tile
    W = np.asarray(win).reshape(ch, wlen // M, M)
    P3 = P.reshape(qn, M, L)
    ref = sum(np.einsum("cbm,ml->cbl", W[:, q:q + 64], P3[q])
              for q in range(qn))
    md = float(np.abs(got[:, :64] - ref).max())
    assert md < 1e-4, md
    return {"maxdiff": md}


def smoke_hankel_ds():
    # f64 flagship path: double-single paired-f32 planes.  MUST run on
    # real Mosaic: XLA:CPU (pallas interpret) reassociates the error-free
    # transforms unpredictably; the hardware lowering keeps them exact.
    from art_tpu.core.filters import make_filter_bank
    from art_tpu.ops.pallas_kernels import (asrc_step_hankel_ds,
                                            dense_bank_tables_ds,
                                            hankel_segl)
    from art_tpu.parallel.asrc import _asrc_step
    if jax.default_backend() != "tpu":
        return {"skipped": "needs real Mosaic"}
    taps, F, S, n = 380, 380, 64, 1024
    hist_len = taps * 16
    half = taps // 2
    rng = np.random.default_rng(3)
    bank = make_filter_bank(taps, F, 1.0, True, np.float64)
    tabs = [jnp.asarray(t) for t in dense_bank_tables_ds(bank)]
    tp = tabs[0].shape[0]
    kb, smax = 128, 4
    segl = hankel_segl(tp, kb, smax)
    hist = jnp.asarray(rng.standard_normal((S, hist_len)))
    x = jnp.asarray(rng.standard_normal((S, n)))
    ratios = 1.0 + 0.01 * np.sin(np.arange(S) * 0.3)
    offsets = np.full(S, float(half)) + rng.random(S)
    k_max = -(-(int(np.ceil((n + 2) * ratios.max())) + 2) // kb) * kb
    bound = float(taps + n - half)
    ks = np.arange(k_max, dtype=np.float64)
    Ks = ((offsets[:, None] + ks[None, :] / ratios[:, None])
          < bound).sum(axis=1).astype(np.int32)
    from art_tpu.ops.pallas_kernels import pack_step_scalars
    oh2, ol2 = split_f64_pairs(offsets)
    yh2, yl2 = split_f64_pairs(1.0 / ratios)
    scal, ints = pack_step_scalars(oh2, ol2, yh2, yl2, Ks, hist_len - taps)
    _, out = asrc_step_hankel_ds(hist, x, *tabs, jnp.asarray(scal),
                                 jnp.asarray(ints), taps, F, k_max, k_max,
                                 hist_len, tp, segl, kb, smax, False)
    _, oref = _asrc_step(hist[:8], x[:8], jnp.asarray(bank),
                         jnp.asarray(offsets[:8]), jnp.asarray(ratios[:8]),
                         jnp.asarray(Ks[:8]), jnp.int32(hist_len - taps),
                         taps, F, k_max, hist_len)
    md = float(np.abs(np.asarray(oref) - np.asarray(out)[:8]).max())
    sc = float(np.abs(np.asarray(oref)).max())
    assert md <= 1e-9 * sc, (md, sc)
    return {"maxdiff_rel": md / sc}


def smoke_fixed_stream():
    """Single-pass streaming fixed-ratio body vs the XLA residue-split
    step at the headline geometry (preset-3 44.1k->48k stereo)."""
    from art_tpu.ops.fixed_pallas import fixed_step_pallas
    from art_tpu.parallel.streams import _chunk_step
    rng = np.random.default_rng(5)
    M, L, qn, taps = 147, 160, 4, 380
    hist_len = 16 * taps
    ch, nb = 2, 1200
    n_in = nb * M
    P = jnp.asarray(rng.standard_normal((qn * M, L)).astype(np.float32)
                    * 0.05)
    hist = jnp.asarray(rng.standard_normal((ch, hist_len)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((ch, n_in)).astype(np.float32))
    start, K = jnp.int32(hist_len - taps + 3), jnp.int32(nb * L - 37)
    acc = jnp.zeros((), jnp.float32)
    h1, o1, a1 = _chunk_step(hist, x, P, start, K, acc, M, L, nb, qn,
                             hist_len)
    h2, o2, a2 = fixed_step_pallas(hist, x, P, start, K, acc, M=M, L=L,
                                   nb=nb, qn=qn, hist_len=hist_len,
                                   interpret=jax.default_backend() != "tpu")
    o1, o2 = np.asarray(o1), np.asarray(o2)
    sc = float(np.abs(o1).max())
    md = float(np.abs(o1 - o2).max())
    assert np.array_equal(np.asarray(h1), np.asarray(h2))
    assert md < 3e-6 * sc, (md, sc)

    # interpolated variant (config-1 class): stacked banks + in-kernel lerp
    from art_tpu.parallel.streams import _chunk_step_interp
    L2 = 2 * L
    P2 = jnp.asarray(rng.standard_normal((qn * M, L2)).astype(np.float32)
                     * 0.05)
    fracv = jnp.asarray(rng.random(L).astype(np.float32))
    h3, o3, a3 = _chunk_step_interp(hist, x, P2, fracv, start, K, acc,
                                    M, L, nb, qn, hist_len)
    h4, o4, a4 = fixed_step_pallas(hist, x, P2, start, K, acc, M=M, L=L,
                                   nb=nb, qn=qn, hist_len=hist_len,
                                   fracv=fracv,
                                   interpret=jax.default_backend() != "tpu")
    o3, o4 = np.asarray(o3), np.asarray(o4)
    sci = float(np.abs(o3).max())
    mdi = float(np.abs(o3 - o4).max())
    assert mdi < 3e-6 * sci, (mdi, sci)

    # split-out fallback layout (qn output refs + XLA interleave) must
    # lower too and match the fused layout bitwise
    h5, o5, a5 = fixed_step_pallas(hist, x, P, start, K, acc, M=M, L=L,
                                   nb=nb, qn=qn, hist_len=hist_len,
                                   split_out=True,
                                   interpret=jax.default_backend() != "tpu")
    assert np.array_equal(o2, np.asarray(o5))
    return {"maxdiff_rel": md / sc, "interp_maxdiff_rel": mdi / sci}


from art_tpu.ops.pallas_kernels import split_f64_pairs  # noqa: E402

record("fixed_stream_step", smoke_fixed_stream)
record("asrc_step_hankel", smoke_hankel)
record("asrc_step_hankel_wide_smax64", smoke_hankel_wide)
record("asrc_step_hankel_ds_f64", smoke_hankel_ds)
record("asrc_step_dense", smoke_dense)
record("asrc_v1_kernel", smoke_v1)
record("polyphase", smoke_polyphase)

results["ok"] = ok_all
print(json.dumps(results))
if save:
    with open(save, "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
sys.exit(0 if ok_all else 1)
