"""Vectorized dry-run query parity vs the per-sample reference loops.

get_required_samples / get_expected_output mirror the reference's
accumulated ``offset += 1/ratio`` stepping (resampler.c:853-918), which the
vectorized versions reproduce exactly: np.cumsum applies the same strict
left-to-right float64 additions, and ring slides subtract exact integers.
"""

import time

import numpy as np
import pytest

from art_tpu.core import accounting as acc
from art_tpu.core.flags import RESAMPLE_FIXED_RATIO, RESAMPLER_FLUSHED


def _fuzz_states(n):
    rng = np.random.default_rng(7)
    for _ in range(n):
        taps = int(rng.choice([4, 16, 48, 380]))
        num_samples = taps * 16
        idx = int(rng.integers(taps, num_samples + 1))
        offset = float(rng.uniform(0, idx))
        ratio = float(rng.choice([
            rng.uniform(0.05, 0.3), rng.uniform(0.3, 1.1),
            rng.uniform(0.9, 1.1), rng.uniform(1.0, 20.0)]))
        yield taps, num_samples, idx, offset, ratio


@pytest.mark.parametrize("case", range(40))
def test_required_samples_matches_loop(case):
    gen = list(_fuzz_states(40))[case]
    taps, num_samples, idx, offset, ratio = gen
    rng = np.random.default_rng(case)
    for n_out in [0, 1, int(rng.integers(2, 5000)),
                  int(rng.integers(5000, 40000))]:
        kw = dict(output_offset=offset, input_index=idx,
                  num_samples=num_samples, num_taps=taps,
                  n_out=n_out, ratio=ratio)
        assert acc.simulate_required_samples(**kw) \
            == acc._simulate_required_samples_loop(**kw), (gen, n_out)


@pytest.mark.parametrize("case", range(40))
def test_expected_output_matches_loop(case):
    gen = list(_fuzz_states(40))[case]
    taps, num_samples, idx, offset, ratio = gen
    rng = np.random.default_rng(100 + case)
    flags = [0, RESAMPLE_FIXED_RATIO, RESAMPLER_FLUSHED][case % 3]
    for n_in in [-1, 0, 1, int(rng.integers(2, 5000)),
                 int(rng.integers(5000, 40000))]:
        kw = dict(output_offset=offset, input_index=idx, flags=flags,
                  num_samples=num_samples, num_taps=taps, n_in=n_in,
                  ratio=ratio, fixed_ratio=ratio * 1.01)
        assert acc.simulate_expected_output(**kw) \
            == acc._simulate_expected_output_loop(**kw), (gen, n_in, flags)


def test_dry_run_queries_scale_to_millions():
    """A 1e7-output sizing query completes in well under a second
    (the round-1 per-sample loop took minutes)."""
    t0 = time.perf_counter()
    used = acc.simulate_required_samples(
        output_offset=190.0, input_index=380, num_samples=6080,
        num_taps=380, n_out=10_000_000, ratio=48000 / 44100)
    exp = acc.simulate_expected_output(
        output_offset=190.0, input_index=380, flags=0, num_samples=6080,
        num_taps=380, n_in=10_000_000, ratio=48000 / 44100,
        fixed_ratio=0.0)
    dt = time.perf_counter() - t0
    assert abs(used - 10_000_000 * 44100 / 48000) < 10
    assert abs(exp - 10_000_000 * 48000 / 44100) < 10
    assert dt < 5.0
