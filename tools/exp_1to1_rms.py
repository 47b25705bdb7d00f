"""Why the 1:1 (ratio exactly 1.0) TONE round trip measures ~0.8 dB
"worse" than the C reference (fuzz_artest_golden seeds 60256 / 60442).

Method: dump the bit-identical w1 (input) and w2 (one resample leg)
streams from both artest builds for the failing config, reconstruct the
EXACT leg (float64 convolution with the engine's own f32 bank, rounded
once per output — the per-sample optimal f32 result), and regress each
implementation's error against (a) the signal (coherent gain), (b) the
adjacent-phase direction (coherent phase), leaving (c) incoherent
noise.

Finding (this machine, seed-60256 config `-s44100 -d44.1k -h2009 -l16k
-e -z`):

    ours: gain=-8.1e-09 lerp=+1.0e-08 noise=8.4e-09   match_exact 95.8%
    ref : gain=-1.8e-10 lerp=-2.6e-09 noise=1.38e-08  match_exact 54.5%
    fl32(exact): gain=-8.2e-09 lerp=+8.7e-09 noise=8.2e-09   (by defn 100%)

Ours IS the exactly-rounded result (1.57x lower per-leg error than the
reference).  But at ratio exactly 1.0 every output applies the SAME
single filter phase, so optimal rounding error on a pure tone is
partially COHERENT with the signal (see the fl32(exact) row: the
optimum itself carries the same coherent part) — and coherent error
adds linearly across the two round-trip legs, while the reference's
larger f32 outside-in-paired accumulation noise is decorrelated and
adds in quadrature.  Net: x - F(F(x)) RMS favors the noisier
implementation by ~0.9 dB at this degenerate config

    ours round trip  ~ sqrt((2*coh)^2 + 2*noise^2) ~ 2.4e-8
    ref  round trip  ~ sqrt(2) * 1.38e-8           ~ 1.95e-8
    20*log10(2.4/1.95) ~ +0.9 dB  (measured: +0.77 / +0.93 dB)

At any ratio != 1 the per-output phase rotates through the bank and the
rounding error decorrelates from the tone, so the effect exists ONLY at
ratio exactly 1.0 with a narrowband input.  Classified in
tools/fuzz_artest_golden.py (same-rate tone diff-stream class) and
PARITY.md; the engine needs no change — its per-leg output is strictly
more accurate.

Usage: exp_1to1_rms.py  (needs /tmp/art_golden via tools/build_golden.sh)
"""
import pathlib
import subprocess
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

GOLD = pathlib.Path("/tmp/art_golden/artest_ref")
CFG = ["-3", "-s44100", "-d44.1k", "-n2", "-c1", "-b777", "-h2009",
       "-l16k", "-e", "-z"]


def dump(cmd, w):
    return subprocess.run(cmd + [f"-w{w}"], capture_output=True,
                          check=True).stdout


def main():
    ref1 = np.frombuffer(dump([str(GOLD), *CFG], 1), np.float32)
    ref2 = np.frombuffer(dump([str(GOLD), *CFG], 2), np.float32)
    our1 = np.frombuffer(dump([sys.executable, "-m", "art_tpu.cli.artest",
                               *CFG], 1), np.float32)
    our2 = np.frombuffer(dump([sys.executable, "-m", "art_tpu.cli.artest",
                               *CFG], 2), np.float32)
    assert our1.tobytes() == ref1.tobytes(), "w1 must be bit-identical"

    from art_tpu.core import flags as F
    from art_tpu.engines.resampler import Resampler
    FL = F.SUBSAMPLE_INTERPOLATE | F.INCLUDE_LOWPASS      # -z: Hann window
    eng = Resampler.fixed_ratio(1, 380, 380, 44100, 44100, 16000, FL)
    bank = np.asarray(eng.bank, np.float64)
    x = ref1.astype(np.float64)
    xp = np.concatenate([np.zeros(800), x, np.zeros(800)])
    Yf = np.convolve(xp, bank[0][::-1], mode="valid")

    # alignment: the streams carry the 2*taps/2 latency + pad geometry
    mid = slice(40000, 41000)
    off = min(range(1400, 1700),
              key=lambda o: float(np.mean(
                  (Yf[o + mid.start:o + mid.stop]
                   - our2[mid].astype(np.float64)) ** 2)))
    Y = Yf[off:off + len(our2)]
    Y1 = np.convolve(xp, bank[1][::-1], mode="valid")[off:off + len(our2)]
    sl = slice(10000, 80000)
    ex32 = Y.astype(np.float32)
    basis = np.stack([Y[sl], Y1[sl] - Y[sl]], 1)

    def fit(name, y):
        e = y[sl].astype(np.float64) - Y[sl]
        coef, *_ = np.linalg.lstsq(basis, e, rcond=None)
        resid = e - basis @ coef
        m = np.mean(y[sl] == ex32[sl]) * 100
        print(f"{name}: gain={coef[0]:+.3e} lerp={coef[1]:+.3e} "
              f"noise={np.sqrt(np.mean(resid ** 2)):.3e} "
              f"total={np.sqrt(np.mean(e ** 2)):.3e} "
              f"match_exact={m:.1f}%")
        return coef, resid

    print(f"alignment offset {off}")
    (go, _), _ = fit("ours        ", our2), None
    fit("reference   ", ref2)
    fit("fl32(exact) ", ex32)


if __name__ == "__main__":
    main()
