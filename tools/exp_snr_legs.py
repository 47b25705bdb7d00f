"""Decompose the bench round-trip SNR gap (device -141.44 dB vs C
-142.29): which leg loses it?

Runs the `artest -i -e` metric (preset -3 44.1k->48k stereo, LCG noise,
fades, forward resample -> inverse resample -> subtract) with each leg on
either the host engine (bit-parity class vs C) or the device engine:

  host/host : the C-parity baseline (expect ~-142.3 dB)
  dev/host  : device forward, host inverse
  host/dev  : host forward, device inverse
  dev/dev   : the shipped bench metric

Usage: python tools/exp_snr_legs.py [seconds]
"""
import math
import sys

sys.path.insert(0, "/root/repo")
import jax.numpy as jnp
import numpy as np

from art_tpu.core import flags as F
from art_tpu.engines.resampler import Resampler
from art_tpu.parallel.streams import DeviceStreamResampler
from art_tpu.utils.testsig import NoiseLCG, fade_in, fade_out

IB = F.SUBSAMPLE_INTERPOLATE | F.BLACKMAN_HARRIS
ch, taps, src, dst, bufn = 2, 380, 44100, 48000, 4096
seconds = int(sys.argv[1]) if len(sys.argv) > 1 else 20

buffers = -(-seconds * src // bufn)
n = buffers * bufn
sig = NoiseLCG().fill(n * ch, np.float32).reshape(n, ch)
fade_in(sig[:bufn])
fade_out(sig[-bufn:])
planar = np.ascontiguousarray(sig.T)


def run_host(x_planar, s, d):
    eng = Resampler.fixed_ratio(ch, taps, 380, s, d, 0, IB)
    eng.advance_position(taps // 2)
    nin = x_planar.shape[1]
    cap = int(nin * d / s) + taps + 64
    out, res = eng.process(x_planar, nin, cap, 0.0)
    out2, res2 = eng.process(None, -1, cap - res.output_generated, 0.0)
    return np.concatenate([out[:, :res.output_generated],
                           out2[:, :res2.output_generated]], axis=1)


def run_dev(x_planar, s, d):
    eng = DeviceStreamResampler(ch, taps, 380, s, d, 0, IB)
    eng.advance_position(taps // 2)
    x = jnp.asarray(x_planar)
    o1, k1 = eng.process(x, x.shape[1])
    o2, k2 = eng.flush()
    return np.asarray(jnp.concatenate([o1[:, :k1], o2[:, :k2]], axis=1))


def diff_db(z):
    m = min(n, z.shape[1])
    d = z[:, :m].astype(np.float64) - planar[:, :m].astype(np.float64)
    return 10.0 * math.log10((d * d).sum() / (m * ch) * 2.0)


for name, fwd, inv in (("host/host", run_host, run_host),
                       ("dev/host", run_dev, run_host),
                       ("host/dev", run_host, run_dev),
                       ("dev/dev", run_dev, run_dev)):
    y = fwd(planar, src, dst)
    z = inv(y, dst, src)
    print(f"{name:9s}: {diff_db(z):8.2f} dB")
