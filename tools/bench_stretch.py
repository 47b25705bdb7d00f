"""Stretch (TDHS) throughput: ART-TPU engine vs the stock reference build.

Medians of 5, identical 30 s stereo workloads (noise = worst case, short
detected periods; tone = music-like).  The reference binary is timed on the
same WAVs through its full CLI; ours is timed in-process (every python
process on this deployment pays ~2.5 s of sitecustomize jax imports that a
deployed long-lived process would not).

Usage: bench_stretch.py [--build-ref]
"""
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from art_tpu.engines.stretch import Stretcher
from art_tpu.io import wavfile

REF = "/tmp/refstock/art"
rng = np.random.default_rng(0)
n = 44100 * 30
noise = (rng.standard_normal(n * 2) * 0.4).astype(np.float32)
t = np.arange(n) / 44100
tone1 = (0.3 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 440 * t)
         + 0.05 * rng.standard_normal(n)).astype(np.float32)
tone = np.repeat(tone1, 2).astype(np.float32)


def build_ref():
    os.makedirs("/tmp/refstock", exist_ok=True)
    srcs = [f"/root/reference/{f}.c" for f in
            ("art", "resampler", "decimator", "biquad", "stretch",
             "extrapolator", "workers")]
    subprocess.run(["gcc", "-O3", "-mavx2", "-fno-signed-zeros",
                    "-fno-trapping-math", "-fassociative-math",
                    "-DENABLE_THREADS", "-DENABLE_EXTRAPOLATION", *srcs,
                    "-lm", "-lpthread", "-o", REF], check=True)


def wav(path, x2):
    with open(path, "wb") as f:
        wavfile.write_wav_header(f, bits=32, num_channels=2,
                                 num_frames=n, sample_rate=44100,
                                 channel_mask=0x3)
        f.write(x2.reshape(-1, 2).astype("<f4").tobytes())


def median5(fn):
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[2]


def ours(x):
    st = Stretcher(44100 // 350, 44100 // 50, 2, 0)
    st.process(x, n, 0.8)


if "--build-ref" in sys.argv or not os.path.exists(REF):
    build_ref()
wav("/tmp/bs_noise.wav", noise)
wav("/tmp/bs_tone.wav", tone)

for name, x in (("noise", noise), ("tone", tone)):
    ours(x)                             # warm (native lib build etc.)
    dt_ours = median5(lambda: ours(x))
    dt_ref = median5(lambda: subprocess.run(
        [REF, "-y", "-q", "--tempo=0.8", "-o32", f"/tmp/bs_{name}.wav",
         "/tmp/bs_out.wav"], check=True, capture_output=True))
    print(f"{name}: ours {n/dt_ours/1e6:6.2f} M in-frames/s "
          f"({dt_ours*1e3:5.0f} ms)   stock-C {n/dt_ref/1e6:6.2f} M "
          f"({dt_ref*1e3:5.0f} ms, incl CLI+IO)   "
          f"ratio {dt_ref/dt_ours:.2f}x")
