"""Measure the pallas ASRC kernel throughput on the real chip."""
import sys, time
import numpy as np, jax, jax.numpy as jnp
from art_tpu.ops.pallas_kernels import asrc_apply_pallas, pad_bank_for_pallas
from art_tpu.core.filters import make_filter_bank

S, K, kb = 256, 2048, 512
taps, filters = 380, 380
bank = pad_bank_for_pallas(
    make_filter_bank(taps, filters, 1.0, True).astype(np.float32))
B = 8192 + bank.shape[1] + 128
rng = np.random.default_rng(0)
buf = jnp.asarray(rng.standard_normal((S, B)).astype(np.float32))
base = jnp.asarray(rng.integers(0, 7000, (S, K)).astype(np.int32))
fi = jnp.asarray(rng.integers(0, filters - 1, (S, K)).astype(np.int32))
frac = jnp.asarray(rng.random((S, K)).astype(np.float32))

out = asrc_apply_pallas(buf, bank, base, fi, frac, kb=kb)
_ = float(jnp.sum(out))
t0 = time.perf_counter()
n = 20
for _ in range(n):
    out = asrc_apply_pallas(buf, bank, base, fi, frac, kb=kb)
_ = float(jnp.sum(out))
dt = (time.perf_counter() - t0) / n
print(f"{S*K/dt/1e6:.1f} M out/s   ({dt*1e3:.2f} ms per {S}x{K})")
