"""LPC extrapolator parity — bit-exact against the reference's coordinate
descent, PARCOR clamping, fallbacks, and prediction loops."""

import subprocess

import numpy as np
import pytest

from art_tpu.engines import extrapolator as ex
from art_tpu.utils.testsig import NoiseLCG

CASES = [
    ("fwd", 190, 190, "sine"), ("fwd", 64, 32, "noise"),
    ("fwd", 190, 190, "noise"), ("rev", 190, 190, "sine"),
    ("rev", 100, 64, "noise"), ("rev", 64, 32, "noise"),
    ("fwd", 16, 16, "sine"), ("fwd", 512, 64, "sine"),
]


def _signal(nvalues, sig, freq=0.05):
    if sig == "sine":
        i = np.arange(nvalues)
        return (0.4 * np.sin(i * freq)
                + 0.1 * np.sin(i * freq * 3.1)).astype(np.float32)
    return NoiseLCG().fill(nvalues)


@pytest.mark.parametrize("mode,nvalues,nx,sig", CASES)
def test_extrapolation_bit_exact(golden_bin, mode, nvalues, nx, sig):
    raw = subprocess.run(
        [str(golden_bin), "extrap", mode, str(nvalues), str(nx), sig,
         "0.05"], capture_output=True, check=True).stdout
    ref = np.frombuffer(raw, dtype=np.float32)
    x = _signal(nvalues, sig)
    mine = (ex.extrapolate_forward(x, nx) if mode == "fwd"
            else ex.extrapolate_reverse(x, nx))
    np.testing.assert_array_equal(mine, ref)


def test_silence_returns_zero_filter():
    coeffs, quality = ex.calc_lpc_coeffs(np.zeros(64, np.float32))
    np.testing.assert_array_equal(coeffs, np.zeros(4, np.float32))
    assert quality == 20.0


def test_quality_bounds():
    x = _signal(128, "sine")
    _, q = ex.calc_lpc_coeffs(x)
    assert 0.0 <= q <= 20.0
