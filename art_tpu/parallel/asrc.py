"""Batched asynchronous sample-rate conversion (ASRC).

BASELINE config 5: hundreds of concurrent streams, each with a continuously
drifting ratio near 1.0 and an exactly recoverable phase position (the
feedback signal of an ASRC loop, reference resampler.c:937-968).  The
reference runs one context per stream; here all streams advance in one fused
device step:

  - per-call scalar accounting is vectorized over streams on the host
    (ratio is a runtime value per stream per call — never baked into the
    compiled kernel),
  - read positions are generated on device from (offset[s], ratio[s]) in
    float64 (the phase recurrence is exact to the same precision as the
    reference's double bookkeeping), decomposed into window base + phase
    index + interpolation fraction,
  - the two-phase-interpolated windowed dot runs batched over
    [streams, outputs] (see ops/resample_kernel for the single-stream form).

All streams consume the same chunk length per call, so the history write
index is shared; only the fractional offsets differ per stream.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from ..core.filters import make_filter_bank
from ..core.flags import HISTORY_MULTIPLE, validate_taps_filters


@functools.partial(jax.jit, static_argnames=("num_taps", "num_filters",
                                             "k_max", "hist_len"))
def _asrc_step(hist, x, bank, offsets, inv_ratios, Ks, shift, num_taps: int,
               num_filters: int, k_max: int, hist_len: int):
    """One batched ASRC chunk.  hist [S, H]; x [S, n]; offsets f64 [S];
    inv_ratios f64 [S] (1/ratio); Ks i32 [S]; shift maps linear history
    coordinates onto the device buffer (hist_len - valid_index).  Returns
    (new_hist, out [S, k_max] with k >= Ks zeroed)."""
    S = x.shape[0]
    half = num_taps // 2
    buf = jnp.concatenate([hist, x], axis=1)

    k = jnp.arange(k_max, dtype=jnp.float64)
    pos = offsets[:, None] + k[None, :] * inv_ratios[:, None]   # [S, K] f64
    ipos = jnp.floor(pos)
    ff = (pos - ipos) * num_filters
    fi = jnp.floor(ff).astype(jnp.int32)
    fi = jnp.minimum(fi, num_filters - 1)
    frac = (ff - fi).astype(bank.dtype)
    base = ipos.astype(jnp.int32) - half + 1 + shift

    taps_iota = jnp.arange(num_taps, dtype=jnp.int32)
    idx = base[:, :, None] + taps_iota[None, None, :]           # [S, K, T]
    win = jnp.take_along_axis(buf[:, None, :],
                              jnp.clip(idx, 0, buf.shape[1] - 1),
                              axis=2)                           # [S, K, T]
    w = (jnp.take(bank, fi, axis=0) * (1.0 - frac)[:, :, None]
         + jnp.take(bank, fi + 1, axis=0) * frac[:, :, None])
    out = jnp.sum(win * w, axis=2)
    valid = (jnp.arange(k_max, dtype=jnp.int32)[None, :] < Ks[:, None])
    out = out * valid.astype(out.dtype)
    new_hist = buf[:, buf.shape[1] - hist_len:]
    return new_hist, out


class BatchedASRC:
    """S independent drifting-ratio resampler streams, device-resident."""

    def __init__(self, num_streams: int, num_taps: int, num_filters: int,
                 *, dtype=np.float32, blackman_harris: bool = True):
        validate_taps_filters(num_taps, num_filters)
        self.dtype = np.dtype(dtype)
        self.S = num_streams
        self.num_taps = num_taps
        self.num_filters = num_filters
        self.num_samples = num_taps * HISTORY_MULTIPLE
        self.bank = make_filter_bank(num_taps, num_filters, 1.0,
                                     blackman_harris, self.dtype.type)
        self._bank_dev = jnp.asarray(self.bank)
        self.offsets = np.full(num_streams, float(num_taps // 2),
                               dtype=np.float64)
        self.input_index = num_taps
        self.hist = jnp.zeros((num_streams, self.num_samples),
                              dtype=self.dtype)

    def advance_position(self, delta) -> None:
        self.offsets += np.asarray(delta, dtype=np.float64)

    def get_position(self) -> np.ndarray:
        """Exact per-stream phase (reference resampler.c:965-968)."""
        return self.offsets + (self.num_taps / 2.0) - self.input_index

    def process(self, x, ratios, k_max: int | None = None):
        """x: device [S, n]; ratios: [S] per-call drifting ratios.

        Consumes all n inputs on every stream; emits K_s <= k_max outputs per
        stream (outputs beyond K_s zeroed).  Returns (out [S, k_max],
        Ks int [S])."""
        n = x.shape[1]
        half = self.num_taps // 2
        ratios = np.asarray(ratios, dtype=np.float64)
        if k_max is None:
            k_max = int(np.ceil((n + 2) * ratios.max())) + 2

        # vectorized consume/emit accounting (same float ops per stream as
        # core.accounting.plan_process with full consumption)
        bound = float(self.input_index + n - half)
        ks = np.arange(k_max, dtype=np.float64)
        pos_host = self.offsets[:, None] + ks[None, :] / ratios[:, None]
        Ks = (pos_host < bound).sum(axis=1).astype(np.int32)
        if int(Ks.max(initial=0)) >= k_max:
            raise ValueError("k_max too small for requested chunk")

        new_hist, out = _asrc_step(
            self.hist, x, self._bank_dev, jnp.asarray(self.offsets),
            jnp.asarray(1.0 / ratios), jnp.asarray(Ks),
            jnp.int32(self.num_samples - self.input_index), self.num_taps,
            self.num_filters, k_max, self.num_samples)
        self.hist = new_hist

        # advance per-stream offsets with the shared history shift
        consumed_total = self.input_index + n
        new_index = min(self.num_samples, consumed_total)
        shift = consumed_total - new_index
        self.offsets = (self.offsets - shift) + Ks / ratios
        self.input_index = new_index
        return out, Ks
