"""Biquad parity against the C reference (cascaded lowpass over noise)."""

import subprocess

import numpy as np
import pytest

from art_tpu.engines.biquad import (Biquad, biquad_highpass, biquad_lowpass)
from art_tpu.utils.testsig import NoiseLCG


@pytest.mark.parametrize("mode,freq", [("lowpass", 0.2), ("lowpass", 0.45),
                                       ("highpass", 0.1)])
def test_cascaded_biquad_bit_exact(golden_bin, mode, freq):
    n = 4000
    raw = subprocess.run([str(golden_bin), "biquad", mode, str(freq), str(n)],
                         capture_output=True, check=True).stdout
    ref = np.frombuffer(raw, dtype=np.float32)
    coeffs = biquad_lowpass(freq) if mode == "lowpass" else biquad_highpass(freq)
    f1 = Biquad.init(coeffs, 1.0, channels=1, dtype=np.float32)
    f2 = Biquad.init(coeffs, 1.0, channels=1, dtype=np.float32)
    x = NoiseLCG().fill(n)
    y = f2.apply_buffer(f1.apply_buffer(x))
    np.testing.assert_array_equal(y, ref)


def test_apply_sample_matches_buffer_order_differs_only_in_association():
    """Sample and buffer paths use different sum associations; outputs agree
    within float noise (and exactly for order-1)."""
    coeffs = biquad_lowpass(0.3)
    f1 = Biquad.init(coeffs, 1.0, channels=1)
    f2 = Biquad.init(coeffs, 1.0, channels=1)
    x = NoiseLCG().fill(500)
    ys = np.array([f1.apply_sample(np.array([v], np.float32))[0] for v in x])
    yb = f2.apply_buffer(x)
    assert np.abs(ys - yb).max() < 1e-5


def test_multichannel_lanes_independent():
    coeffs = biquad_lowpass(0.25)
    f = Biquad.init(coeffs, 1.0, channels=3)
    x = NoiseLCG().fill(300 * 3).reshape(300, 3)
    y = f.apply_buffer(x)
    for c in range(3):
        fc = Biquad.init(coeffs, 1.0, channels=1)
        yc = fc.apply_buffer(x[:, c])
        np.testing.assert_array_equal(y[:, c], yc)


def test_gain_folding():
    coeffs = biquad_lowpass(0.2)
    f1 = Biquad.init(coeffs, 2.0, channels=1)
    f2 = Biquad.init(coeffs, 1.0, channels=1)
    x = NoiseLCG().fill(64)
    y1 = f1.apply_buffer(x.copy())
    y2 = f2.apply_buffer(x.copy())
    # gain applies to the feed-forward side only: same shape, scaled drive
    assert np.abs(y1).max() > np.abs(y2).max()
