"""Device biquad filtering via parallel (associative) scan.

An order-N IIR section y_n = sum_i a_i x_{n-i} - sum_j b_j y_{n-j} splits
into a feed-forward FIR part f_n (a parallel convolution) and the linear
recurrence s_n = A s_{n-1} + [f_n, 0, 0, 0] with A the 4x4 companion matrix
of the feedback taps.  Constant-coefficient linear recurrences compose
associatively over (matrix, offset) pairs, so the whole time axis runs as a
`lax.associative_scan` — O(log n) depth instead of the host engine's O(n)
loop.  Channels ride along as a batch axis on the offset vectors.

This is the high-throughput device path; it reassociates float math, so for
bit-parity with the reference use engines.biquad / the native runtime.  The
scan runs in float64 internally to keep the reassociation error below the
float32 quantization floor even for near-unstable shapers.
"""

from __future__ import annotations

import numpy as np
from .._jaxinit import ensure_jax

jax = ensure_jax()
import jax.numpy as jnp


def biquad_apply_buffer_assoc(biquad, buffer: np.ndarray) -> np.ndarray:
    """Filter [n] or [n, channels] through a Biquad state (engines.biquad)
    using the device associative scan.  Mutates the biquad history like
    apply_buffer and returns the filtered buffer."""
    buf = np.asarray(buffer)
    squeeze = buf.ndim == 1
    if squeeze:
        buf = buf[:, None]
    n, ch = buf.shape
    dt = buf.dtype

    a = np.asarray(biquad.a, dtype=np.float64)
    b = np.asarray(biquad.b, dtype=np.float64)
    xh = np.asarray(biquad.xh, dtype=np.float64)      # [4, ch] newest-first
    yh = np.asarray(biquad.yh, dtype=np.float64)

    y = _assoc_run(jnp.asarray(buf.astype(np.float64)), jnp.asarray(a),
                   jnp.asarray(b), jnp.asarray(xh), jnp.asarray(yh))
    y = np.asarray(y)

    # update histories (newest-first) like the sequential paths
    joined_x = np.concatenate([xh[::-1].T, buf.astype(np.float64).T], axis=1)
    joined_y = np.concatenate([yh[::-1].T, y.T], axis=1)
    biquad.xh = np.ascontiguousarray(
        joined_x[:, -4:][:, ::-1].T).astype(biquad.xh.dtype)
    biquad.yh = np.ascontiguousarray(
        joined_y[:, -4:][:, ::-1].T).astype(biquad.yh.dtype)
    out = y.astype(dt)
    return out[:, 0] if squeeze else out


def assoc_core_masked(x, a, b, xh, yh, K):
    """Pure masked associative-scan biquad for the fused device pipeline.

    x [n, S] (rows at k >= K ignored); a/b [5]; xh/yh [4, S] newest-first.
    Steps beyond K contribute identity transitions, so the filter state
    advances by exactly K samples on ragged chunks.  Runs in float64
    internally (see module docstring); returns (y [n, S] in x.dtype, zeroed
    beyond K, and the newest-first xh'/yh' after K samples)."""
    n, S = x.shape
    dt = x.dtype
    active = (jnp.arange(n, dtype=jnp.int32) < K)[:, None]
    xm = jnp.where(active, x, 0).astype(jnp.float64)
    a = jnp.asarray(a, jnp.float64)
    b = jnp.asarray(b, jnp.float64)
    xh = jnp.asarray(xh, jnp.float64)
    yh = jnp.asarray(yh, jnp.float64)

    xpad = jnp.concatenate([xh[::-1], xm], axis=0)
    f = (a[0] * xpad[4:] + a[1] * xpad[3:-1] + a[2] * xpad[2:-2]
         + a[3] * xpad[1:-3] + a[4] * xpad[:-4])
    f = jnp.where(active, f, 0.0)

    A = jnp.array([[0.0, 0.0, 0.0, 0.0],
                   [1.0, 0.0, 0.0, 0.0],
                   [0.0, 1.0, 0.0, 0.0],
                   [0.0, 0.0, 1.0, 0.0]], dtype=jnp.float64)
    A = A.at[0].set(jnp.stack([-b[1], -b[2], -b[3], -b[4]]))
    eye = jnp.eye(4, dtype=jnp.float64)
    Ms = jnp.where(active[:, :, None], A[None], eye[None])   # [n, 4, 4]
    vs = jnp.zeros((n, S, 4), dtype=jnp.float64).at[:, :, 0].set(f)

    def combine(left, right):
        Ml, vl = left
        Mr, vr = right
        return (jnp.einsum("nij,njk->nik", Mr, Ml),
                jnp.einsum("nij,ncj->nci", Mr, vl) + vr)

    Mtot, vtot = jax.lax.associative_scan(combine, (Ms, vs), axis=0)
    y = jnp.einsum("nij,cj->nci", Mtot, yh.T)[:, :, 0] + vtot[:, :, 0]
    y = jnp.where(active, y, 0.0)

    # state after exactly K samples: the last 4 valid x / y values
    # (carry-in history covers K < 4)
    jx = jnp.concatenate([xh[::-1], xm], axis=0)       # oldest..newest
    jy = jnp.concatenate([yh[::-1], y], axis=0)
    xh_n = jax.lax.dynamic_slice(jx, (K, jnp.int32(0)), (4, S))[::-1]
    yh_n = jax.lax.dynamic_slice(jy, (K, jnp.int32(0)), (4, S))[::-1]
    return y.astype(dt), xh_n, yh_n


@jax.jit
def _cascade2_step(x, a1, b1, xh1, yh1, a2, b2, xh2, yh2, K):
    """Two cascaded masked-scan sections in one dispatch (the ART CLI's
    pre/post filter is always a 2-section cascade, reference
    art.c:847-876)."""
    y1, xh1n, yh1n = assoc_core_masked(x, a1, b1, xh1, yh1, K)
    y2, xh2n, yh2n = assoc_core_masked(y1, a2, b2, xh2, yh2, K)
    return y2, xh1n, yh1n, xh2n, yh2n


class DeviceBiquadCascade:
    """Two cascaded biquad sections applied device-side via the masked
    associative scan, with streaming filter state carried device-resident
    and exact state interchange with the host ``engines.biquad.Biquad``
    pair (the CLI's -p post filter between the device resample and
    decimate stages; reference art.c:1052-1058).

    Parity class: the scan computes in float64 and rounds each output once
    to the data dtype, while the host path rounds every intermediate at
    dtype — outputs agree at the dtype rounding floor (documented in
    PARITY.md), counts exactly."""

    def __init__(self, bq1, bq2):
        self._coef = tuple(
            jnp.asarray(np.asarray(v, np.float64))
            for v in (bq1.a, bq1.b, bq2.a, bq2.b))
        self._state = None                 # (xh1, yh1, xh2, yh2) on device

    def push_from(self, bq1, bq2) -> None:
        """Adopt the host pair's streaming state (device takes over)."""
        self._state = tuple(
            jnp.asarray(np.asarray(v, np.float64))
            for v in (bq1.xh, bq1.yh, bq2.xh, bq2.yh))

    def pull_to(self, bq1, bq2) -> None:
        """Hand the streaming state back to the host pair."""
        xh1, yh1, xh2, yh2 = (np.asarray(s) for s in self._state)
        bq1.xh = xh1.astype(bq1.xh.dtype)
        bq1.yh = yh1.astype(bq1.yh.dtype)
        bq2.xh = xh2.astype(bq2.xh.dtype)
        bq2.yh = yh2.astype(bq2.yh.dtype)
        self._state = None

    def process(self, dev_out, K: int):
        """Filter dev_out [ch, cap] (first K columns valid) through both
        sections; returns the filtered [ch, cap] device array."""
        a1, b1, a2, b2 = self._coef
        xh1, yh1, xh2, yh2 = self._state
        y, xh1, yh1, xh2, yh2 = _cascade2_step(
            dev_out.T, a1, b1, xh1, yh1, a2, b2, xh2, yh2, jnp.int32(K))
        self._state = (xh1, yh1, xh2, yh2)
        return y.T


@jax.jit
def _assoc_run(x, a, b, xh, yh):
    n, ch = x.shape
    # FIR part: f_n = sum_i a[i] * x_{n-i}, with the carried input history
    xpad = jnp.concatenate([xh[::-1], x], axis=0)      # [4+n, ch], oldest..
    f = (a[0] * xpad[4:] + a[1] * xpad[3:-1] + a[2] * xpad[2:-2]
         + a[3] * xpad[1:-3] + a[4] * xpad[:-4])       # [n, ch]

    # companion matrix of the feedback side
    A = jnp.array([[0.0, 0.0, 0.0, 0.0],
                   [1.0, 0.0, 0.0, 0.0],
                   [0.0, 1.0, 0.0, 0.0],
                   [0.0, 0.0, 1.0, 0.0]], dtype=x.dtype)
    A = A.at[0].set(jnp.stack([-b[1], -b[2], -b[3], -b[4]]))

    Ms = jnp.broadcast_to(A, (n, 4, 4))
    vs = jnp.zeros((n, ch, 4), dtype=x.dtype).at[:, :, 0].set(f)

    def combine(left, right):
        Ml, vl = left
        Mr, vr = right
        return (jnp.einsum("nij,njk->nik", Mr, Ml),
                jnp.einsum("nij,ncj->nci", Mr, vl) + vr)

    Mtot, vtot = jax.lax.associative_scan(combine, (Ms, vs), axis=0)
    # y_n is the first state component: (Mtot_n @ s0) + vtot_n
    return jnp.einsum("nij,cj->nci", Mtot, yh.T)[:, :, 0] + vtot[:, :, 0]
