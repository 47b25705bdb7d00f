"""C-compatible API surface.

Every public entry point of the reference library is available under its
original name (reference resampler.h:64-78, decimator.h:66-71, biquad.h:41-47,
stretch.h:52-57, extrapolator.h:39-40), taking/returning numpy arrays instead
of pointers.  Contexts are the engine objects; "free" calls exist as no-ops
for drop-in familiarity.  New code should prefer the engine classes directly.
"""

from __future__ import annotations

import numpy as np

from .core.flags import *                      # noqa: F401,F403
from .engines.biquad import (Biquad, BiquadCoefficients, biquad_highpass,
                             biquad_lowpass)
from .engines.decimator import Decimator, float_integers
from .engines.extrapolator import extrapolate_forward, extrapolate_reverse
from .engines.resampler import Resampler, ResampleResult
from .engines.stretch import Stretcher

__all__ = [
    "resampleInit", "resampleFixedRatioInit", "resampleProcess",
    "resampleProcessInterleaved", "resampleProcessAndFlush",
    "resampleProcessAndFlushInterleaved", "resampleGetRequiredSamples",
    "resampleGetExpectedOutput", "resampleAdvancePosition",
    "resampleGetLowpassRatio", "resampleGetPosition",
    "resampleGetNumFilters", "resampleInterpolationUsed", "resampleReset",
    "resampleFree", "decimateInit", "decimateProcessLE",
    "decimateProcessInterleavedLE", "decimateFree", "floatIntegersLE",
    "biquad_init", "biquad_lowpass_c", "biquad_highpass_c",
    "biquad_apply_sample", "biquad_apply_buffer", "stretchInit",
    "stretchProcess", "stretchFlush", "stretchReset", "stretchFree",
    "stretchGetOutputCapacity", "ResampleResult",
]


# ------------------------------------------------------------- resampler
def resampleInit(numChannels, numTaps, numFilters, lowpassRatio, flags,
                 **kw) -> Resampler:
    return Resampler(numChannels, numTaps, numFilters, lowpassRatio, flags,
                     **kw)


def resampleFixedRatioInit(numChannels, numTaps, maxFilters, sourceRate,
                           destinRate, lowpassFreq, flags, **kw) -> Resampler:
    return Resampler.fixed_ratio(numChannels, numTaps, maxFilters,
                                 sourceRate, destinRate, lowpassFreq, flags,
                                 **kw)


def resampleProcess(cxt, input, numInputFrames, numOutputFrames, ratio):
    """Planar process: input [channels, n] or None (flush with n = -1).
    Returns (output [channels, generated], ResampleResult)."""
    return cxt.process(input, numInputFrames, numOutputFrames, ratio)


def resampleProcessInterleaved(cxt, input, numInputFrames, numOutputFrames,
                               ratio):
    return cxt.process_interleaved(input, numInputFrames, numOutputFrames,
                                   ratio)


def resampleProcessAndFlush(cxt, input, numInputFrames, numOutputFrames,
                            ratio):
    return cxt.process_and_flush(input, numInputFrames, numOutputFrames,
                                 ratio)


def resampleProcessAndFlushInterleaved(cxt, input, numInputFrames,
                                       numOutputFrames, ratio):
    return cxt.process_and_flush_interleaved(input, numInputFrames,
                                             numOutputFrames, ratio)


def resampleGetRequiredSamples(cxt, numOutputFrames, ratio):
    return cxt.get_required_samples(numOutputFrames, ratio)


def resampleGetExpectedOutput(cxt, numInputFrames, ratio):
    return cxt.get_expected_output(numInputFrames, ratio)


def resampleAdvancePosition(cxt, delta):
    cxt.advance_position(delta)


def resampleGetLowpassRatio(cxt):
    return cxt.get_lowpass_ratio()


def resampleGetPosition(cxt):
    return cxt.get_position()


def resampleGetNumFilters(cxt):
    return cxt.get_num_filters()


def resampleInterpolationUsed(cxt):
    return cxt.interpolation_used()


def resampleReset(cxt):
    cxt.reset()


def resampleFree(cxt):
    pass


# ------------------------------------------------------------- decimator
def decimateInit(numChannels, outputBits, outputBytes, outputGain,
                 sampleRate, flags, **kw) -> Decimator:
    return Decimator(numChannels, outputBits, outputBytes, outputGain,
                     sampleRate, flags, **kw)


def decimateProcessLE(cxt, input):
    """input [channels, n] -> (packed bytes [n, ch*bytes], clipped)."""
    return cxt.process(input)


def decimateProcessInterleavedLE(cxt, input):
    """input [n, channels] -> (packed bytes [n, ch*bytes], clipped)."""
    return cxt.process_interleaved(input)


def decimateFree(cxt):
    pass


def floatIntegersLE(input, inputGain, inputBits, inputBytes,
                    dtype=np.float32):
    return float_integers(input, inputGain, inputBits, inputBytes, dtype)


# --------------------------------------------------------------- biquads
def biquad_lowpass_c(frequency) -> BiquadCoefficients:
    return biquad_lowpass(frequency)


def biquad_highpass_c(frequency) -> BiquadCoefficients:
    return biquad_highpass(frequency)


def biquad_init(coeffs, gain, channels=1, dtype=np.float32) -> Biquad:
    return Biquad.init(coeffs, gain, channels, dtype)


def biquad_apply_sample(f, input):
    return f.apply_sample(input)


def biquad_apply_buffer(f, buffer):
    return f.apply_buffer(buffer)


# --------------------------------------------------------------- stretch
def stretchInit(shortest_period, longest_period, num_channels, flags,
                **kw) -> Stretcher:
    return Stretcher(shortest_period, longest_period, num_channels, flags,
                     **kw)


def stretchProcess(cxt, samples, num_samples, ratio):
    return cxt.process(samples, num_samples, ratio)


def stretchFlush(cxt):
    return cxt.flush()


def stretchReset(cxt):
    cxt.reset()


def stretchFree(cxt):
    pass


def stretchGetOutputCapacity(cxt, max_num_samples, max_ratio):
    return cxt.get_output_capacity(max_num_samples, max_ratio)
