"""Pallas ASRC kernel correctness (interpreter mode on CPU; the compiled
kernel was additionally validated on TPU v5e: maxdiff 4.8e-7 vs float64
reference)."""

import numpy as np
import pytest
import jax.numpy as jnp

from art_tpu.core.filters import make_filter_bank
from art_tpu.ops.pallas_kernels import asrc_apply_pallas, pad_bank_for_pallas


def test_polyphase_pallas_interpret_matches_reference():
    from art_tpu.ops.pallas_kernels import _TB, polyphase_apply_pallas
    M, qn, L, ch = 147, 4, 160, 2
    nb_pad = _TB * 2
    rng = np.random.default_rng(0)
    wlen = (nb_pad + _TB) * M
    win = np.zeros((ch, wlen), np.float32)
    win[:, :nb_pad * M + qn * M] = rng.standard_normal(
        (ch, nb_pad * M + qn * M)).astype(np.float32)
    P = rng.standard_normal((qn * M, L)).astype(np.float32) * 0.05
    out = np.asarray(polyphase_apply_pallas(
        jnp.asarray(win), jnp.asarray(P), M=M, qn=qn, L=L, interpret=True))
    ref = np.zeros((ch, nb_pad, L), np.float32)
    for j in range(nb_pad):
        ref[:, j] = win[:, j * M:j * M + qn * M] @ P
    np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.parametrize("S,K,T,F", [(8, 256, 48, 64), (16, 512, 156, 320)])
def test_asrc_pallas_interpret_matches_reference(S, K, T, F):
    bank = make_filter_bank(T, F, 1.0, True, np.float32)
    bankp = pad_bank_for_pallas(bank)
    tp = bankp.shape[1]
    B = 2048 + tp + 128
    rng = np.random.default_rng(0)
    buf = rng.standard_normal((S, B)).astype(np.float32)
    base = rng.integers(0, B - tp - 128, (S, K)).astype(np.int32)
    fi = rng.integers(0, F, (S, K)).astype(np.int32)
    frac = rng.random((S, K)).astype(np.float32)

    out = np.asarray(asrc_apply_pallas(
        jnp.asarray(buf), jnp.asarray(bankp), jnp.asarray(base),
        jnp.asarray(fi), jnp.asarray(frac), kb=K, interpret=True))

    ref = np.zeros((S, K), np.float32)
    for s in range(S):
        for k in range(K):
            win = buf[s, base[s, k]:base[s, k] + T].astype(np.float64)
            w = (bank[fi[s, k]].astype(np.float64) * (1 - frac[s, k])
                 + bank[fi[s, k] + 1].astype(np.float64) * frac[s, k])
            ref[s, k] = (win * w).sum()
    np.testing.assert_allclose(out, ref, atol=2e-6)
