"""Randomized golden sweeps against the C reference.

Seeded fuzzing over (taps, filters, channels, rates/ratios, block sizes,
advances, flags), asserting the same contract as the targeted goldens:
exact counts and phase position, f32-floor sample agreement.  Also exercises
the output-limited partial-consumption path (tiny output buffers), which the
targeted tests never hit.
"""

import subprocess

import numpy as np
import pytest

from art_tpu.core.flags import (BLACKMAN_HARRIS, EXTRAPOLATE_ENDPOINTS,
                                INCLUDE_LOWPASS, NO_FILTER_REDUCTION,
                                SUBSAMPLE_INTERPOLATE)
from art_tpu.engines.resampler import Resampler
from art_tpu.utils.testsig import NoiseLCG

from helpers import compare_stream

RATE_PAIRS = [(44100, 48000), (48000, 44100), (96000, 44100), (8000, 32000),
              (22050, 24000), (44100, 44101)]


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_decimator_bit_exact(golden_bin, seed):
    from art_tpu.core.flags import (DITHER_FLAT, DITHER_HIGHPASS,
                                    DITHER_LOWPASS, SHAPING_1ST_ORDER,
                                    SHAPING_2ND_ORDER, SHAPING_3RD_ORDER,
                                    SHAPING_ATH_CURVE)
    from art_tpu.engines.decimator import Decimator
    rng = np.random.default_rng(2000 + seed)
    chans = int(rng.integers(1, 9))
    bits = int(rng.integers(4, 25))
    nbytes = (bits + 7) // 8 + (1 if rng.random() < 0.2 else 0)
    gain = float(rng.uniform(0.5, 2.0))
    rate = [32000, 44100, 48000, 88200, 96000, 37800][
        int(rng.integers(0, 6))]
    dither = [0, DITHER_HIGHPASS, DITHER_FLAT, DITHER_LOWPASS][
        int(rng.integers(0, 4))]
    shaping = [0, SHAPING_1ST_ORDER, SHAPING_2ND_ORDER, SHAPING_3RD_ORDER,
               SHAPING_ATH_CURVE][int(rng.integers(0, 5))]
    flags = dither | shaping
    n, nblocks = int(rng.integers(100, 1500)), int(rng.integers(1, 4))

    raw = subprocess.run(
        [str(golden_bin), "decimate", str(chans), str(bits), str(nbytes),
         repr(gain), str(rate), format(flags, "x"), str(n), str(nblocks)],
        capture_output=True, check=True).stdout
    total = n * chans * nbytes * nblocks
    ref = np.frombuffer(raw, dtype=np.uint8, count=total)
    ref_clip = int(np.frombuffer(raw, dtype=np.uint32, count=1,
                                 offset=total)[0])
    backend = ["numpy", "native", "jax"][seed % 3]
    d = Decimator(chans, bits, nbytes, gain, rate, flags, backend=backend)
    lcg = NoiseLCG()
    mine, clip = [], 0
    for _ in range(nblocks):
        x = lcg.fill(n * chans).reshape(n, chans)
        pb, c = d.process_interleaved(x)
        mine.append(pb.reshape(-1))
        clip += c
    np.testing.assert_array_equal(np.concatenate(mine), ref)
    assert clip == ref_clip


@pytest.mark.parametrize("seed", range(16))
def test_fuzz_stream_parity(golden_bin, seed):
    rng = np.random.default_rng(1000 + seed)
    taps = int(rng.integers(1, 40)) * 4
    filters = int(rng.integers(1, 200))
    chans = int(rng.integers(1, 5))
    mode = int(rng.integers(0, 2))
    flags = BLACKMAN_HARRIS if rng.random() < 0.7 else 0
    if rng.random() < 0.8:
        flags |= SUBSAMPLE_INTERPOLATE
    if rng.random() < 0.3:
        flags |= NO_FILTER_REDUCTION
    if rng.random() < 0.3:
        flags |= EXTRAPOLATE_ENDPOINTS
    block = int(rng.integers(64, 3000))
    nblocks = int(rng.integers(2, 5))
    if mode:
        src, dst = RATE_PAIRS[int(rng.integers(0, len(RATE_PAIRS)))]
        lowpass, ratio = 0, dst / src
        flags |= INCLUDE_LOWPASS
    else:
        src = dst = 1
        ratio = float(rng.uniform(0.3, 3.0))
        lowpass = float(rng.uniform(0.3, 0.95)) if rng.random() < 0.5 else 0.0
    advance = float(rng.integers(0, taps))
    if flags & SUBSAMPLE_INTERPOLATE and rng.random() < 0.5:
        advance += 0.25

    compare_stream(golden_bin, chans=chans, taps=taps, filters=filters,
                   flags=flags, mode=mode, src=src, dst=dst,
                   lowpass=lowpass, ratio=ratio, block=block,
                   nblocks=nblocks, advance=advance, atol=2e-7)


@pytest.mark.parametrize("outcap,block", [(37, 700), (128, 1000), (5, 260)])
def test_output_limited_partial_consumption(golden_bin, outcap, block):
    """Tiny output buffers force the reference to consume input partially
    (the break at resampler.c:512-513); counts and values must track."""
    chans, taps, filters = 2, 48, 48
    flags = SUBSAMPLE_INTERPOLATE | BLACKMAN_HARRIS | INCLUDE_LOWPASS
    nblocks = 3
    args = [str(golden_bin), "resample_small", str(chans), str(taps),
            str(filters), format(flags, "x"), "1", "44100", "48000", "0",
            repr(48000 / 44100), str(block), str(nblocks), "24.0",
            str(outcap)]
    raw = subprocess.run(args, capture_output=True, check=True).stdout

    r = Resampler.fixed_ratio(chans, taps, filters, 44100, 48000, 0, flags)
    r.advance_position(24.0)
    lcg = NoiseLCG()
    off = 0
    maxdiff = 0.0
    for b in range(nblocks):
        data = lcg.fill(block * chans).reshape(block, chans)
        avail = data
        while avail.shape[0] > 0:
            iu, og = np.frombuffer(raw, dtype=np.uint32, count=2, offset=off)
            off += 8
            ref = np.frombuffer(raw, dtype=np.float32, count=int(og) * chans,
                                offset=off).reshape(int(og), chans)
            off += int(og) * chans * 4
            out, res = r.process_interleaved(avail, avail.shape[0], outcap,
                                             0.0)
            assert (res.input_used, res.output_generated) == \
                (int(iu), int(og))
            if og:
                maxdiff = max(maxdiff, float(np.abs(out - ref).max()))
            avail = avail[res.input_used:]
            if not res.input_used and not res.output_generated:
                break
    ref_pos = float(np.frombuffer(raw, dtype=np.float64, count=1,
                                  offset=off)[0])
    assert r.get_position() == ref_pos
    assert maxdiff < 2e-7
