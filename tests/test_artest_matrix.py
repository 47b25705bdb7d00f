"""Broad ARTEST-vs-reference matrix: full stats-block comparison.

For each config, every count in every stats line must match the C binary
exactly, input lines must be bit-identical, and the round-trip diff RMS must
be within 0.5 dB (ours is typically equal or slightly better thanks to
float64 accumulation in the convolution)."""

import io
import re
import subprocess
from contextlib import redirect_stderr
from pathlib import Path

import pytest

ARTEST_BIN = Path("/tmp/refbuild/artest")

CONFIGS = [
    ["-1", "-s44.1k", "-d48k", "-c1", "-n2", "-e", "-i"],
    ["-2", "-s96k", "-d44.1k", "-c2", "-n2", "-e", "-i", "-o16"],
    ["-3", "-s44.1k", "-d48k", "-c2", "-n2", "-e", "-i"],
    ["-3", "-s44.1k", "-d48k", "-c2", "-n2", "-i", "-l20k"],
    ["-1", "-s32k", "-d48k", "-c4", "-n2", "-e", "-i", "-b1024"],
    ["-1", "-s44.1k", "-d48k", "-c2", "-n2", "-e", "-i", "-x", "-a"],
    ["-2", "-s48k", "-d44.1k", "-c2", "-n2", "-e", "-i", "-z", "-o24"],
    ["-4", "-s44.1k", "-d48k", "-c2", "-n1", "-e", "-i"],
    ["-1", "-s48k", "-d32k", "-c3", "-n2", "-e", "-i", "-o8"],
    ["-3", "-s44.1k", "-d48k", "-c2", "-n2", "-e", "-i", "-v"],
    ["-1", "-s44.1k", "-d48k", "-c2", "-n2", "-e", "-i", "-h3000"],
    ["-2", "-s44.1k", "-d48k", "-c2", "-n2", "-e", "-i", "-o16", "-d2",
     "-n1"],
    ["-3", "-s44.1k", "-d48k", "-c2", "-n2", "-e", "-i", "-m"],
]

_LINE = re.compile(r"(\w+) \(-w(\d)\): count =\s*(\d+), checksum = (\w+), "
                   r"range = ([-\d.]+) to ([-\d.]+), RMS = ([-\d.]+) dB")


def _parse(text):
    out = {}
    for line in text.splitlines():
        m = _LINE.search(line)
        if m:
            out[m.group(2)] = dict(count=int(m.group(3)),
                                   checksum=m.group(4),
                                   rms=float(m.group(7)),
                                   raw=line.strip())
        if "decimate (-w3)" in line:
            m2 = re.search(r"count =\s*(\d+), checksum = (\w+), clipped "
                           r"samples = (\d+)", line)
            out["3"] = dict(count=int(m2.group(1)), checksum=m2.group(2),
                            clipped=int(m2.group(3)), raw=line.strip())
    return out


@pytest.mark.parametrize("args", CONFIGS, ids=[" ".join(c) for c in CONFIGS])
def test_artest_matrix(args):
    if not ARTEST_BIN.exists():
        pytest.skip("reference artest not built")
    ref = _parse(subprocess.run([str(ARTEST_BIN), *args],
                                capture_output=True, text=True).stderr)
    from art_tpu.cli import artest as at
    buf = io.StringIO()
    with redirect_stderr(buf):
        at.main(args)
    mine = _parse(buf.getvalue())

    assert set(ref) == set(mine)
    # input stream bit-identical
    assert ref["1"]["raw"] == mine["1"]["raw"]
    for key in ref:
        assert ref[key]["count"] == mine[key]["count"], key
        if "rms" in ref[key]:
            # one-sided: ours may be arbitrarily better (f64 accumulation),
            # never more than 0.5 dB worse
            assert mine[key]["rms"] - ref[key]["rms"] < 0.5, key
        if "clipped" in ref[key]:
            assert ref[key]["clipped"] == mine[key]["clipped"]


def test_artest_strtol_args_and_degenerate_streams():
    """artest parity edges: -b4k parses as 4 via strtol prefix semantics
    (clean bounds error, not a traceback); an empty stdin stream prints
    the reference's exact degenerate stats line (f32-rounded 1e20 range
    sentinel, glibc's '-nan' RMS); unknown --backend errors."""
    import io as _io
    import subprocess
    from contextlib import redirect_stderr
    from pathlib import Path

    import pytest

    from art_tpu.cli import artest as at

    with pytest.raises(SystemExit, match="inbuffer samples must be"):
        at.main(["-s44100", "-d48000", "-b4k"])
    with pytest.raises(SystemExit, match="--backend must be"):
        at.main(["-s44100", "-d48000", "--backend=jaxx"])
    with pytest.raises(SystemExit, match="--profile needs"):
        at.main(["-s44100", "-d48000", "--profile"])

    # empty stdin: stats block, no traceback, exact reference line
    import sys as _sys
    buf = _io.StringIO()
    old_stdin = _sys.stdin
    try:
        import os as _os
        _sys.stdin = open(_os.devnull, "rb")
        _sys.stdin = type("S", (), {"buffer": _sys.stdin})()
        with redirect_stderr(buf):
            rc = at.main(["-s44100", "-d48000", "-n1", "-e", "-r"])
    finally:
        _sys.stdin = old_stdin
    assert rc == 0
    mine = next(l for l in buf.getvalue().splitlines() if "input (-w1)" in l)
    artest_bin = Path("/tmp/refbuild/artest")
    if artest_bin.exists():
        ref = subprocess.run([str(artest_bin), "-s44100", "-d48000", "-n1",
                              "-e", "-r"], capture_output=True, text=True,
                             stdin=subprocess.DEVNULL).stderr
        ref_line = next(l for l in ref.splitlines() if "input (-w1)" in l)
        assert mine.strip() == ref_line.strip()


def test_artest_lowpass_over_nyquist_clean_error():
    """lowpass >= destination Nyquist: the reference prints the
    validation line (resampler.c:317) then SEGFAULTS on the NULL context
    (artest.c uses the init return unchecked) — ours prints the same
    line and exits cleanly (artest fuzz seed 2)."""
    import io as _io
    from contextlib import redirect_stderr

    from art_tpu.cli import artest as at

    buf = _io.StringIO()
    with redirect_stderr(buf):
        rc = at.main(["-1", "-s16k", "-d22.05k", "-n1", "-l16k", "-e"])
    assert rc != 0
    assert ("lowpass frequency must be lower than destination Nyquist!"
            in buf.getvalue())
    assert "Traceback" not in buf.getvalue()


DEVICE_CONFIGS = [
    # flagship: fixed-ratio round trip through the device engine
    ["-3", "-s44.1k", "-d48k", "-c2", "-n2", "-e", "-i"],
    # interpolated device mode (preset-1 cannot reduce 44.1k->48k)
    ["-1", "-s44.1k", "-d48k", "-c1", "-n2", "-e", "-i"],
    # decimate tap + planar API path + extrapolated endpoints (host edges)
    ["-2", "-s96k", "-d44.1k", "-c2", "-n2", "-e", "-i", "-o16", "-v", "-x"],
    # runtime-ratio interpolated path WITHOUT -e: BatchedASRC via
    # ASRCStreamResampler (reference artest.c:380-437; VERDICT r04
    # item 3) — the baseline interp config class (C: -114.1 dB)
    ["-1", "-s44.1k", "-d48k", "-c2", "-n2", "-i"],
    # same with decimate tap + planar API path
    ["-1", "-s44.1k", "-d48k", "-c1", "-n2", "-i", "-o16", "-v"],
]


@pytest.mark.parametrize("args", DEVICE_CONFIGS,
                         ids=[" ".join(c) for c in DEVICE_CONFIGS])
def test_artest_device_backend(args):
    """--backend=device routes the -e steady state through the
    HybridStreamResampler (VERDICT r03 item 3): counts and input stats
    must match the numpy backend exactly; the round-trip diff stays in
    the f32-matmul-floor parity class (PARITY.md row 'apply_filter hot
    loop'); decimate clip counts match exactly."""
    from art_tpu.cli import artest as at

    outs = {}
    for be in ("numpy", "device"):
        buf = io.StringIO()
        with redirect_stderr(buf):
            rc = at.main([*args, f"--backend={be}"])
        assert rc == 0
        outs[be] = _parse(buf.getvalue())
    ref, dev = outs["numpy"], outs["device"]
    assert set(ref) == set(dev)
    assert ref["1"]["raw"] == dev["1"]["raw"]        # input bit-identical
    for key in ref:
        assert ref[key]["count"] == dev[key]["count"], key
        if "clipped" in ref[key]:
            assert ref[key]["clipped"] == dev[key]["clipped"]
    # round-trip error class: the host path sits at the f64-accumulation
    # floor (~-142 dB); the device path at the f32 matmul floor (< -125 dB
    # where the config itself resolves that finely — short preset-1 filters
    # bound the round trip near -46 dB for BOTH backends, so there the
    # device path must simply stay within 0.5 dB of the host path)
    assert (dev["5"]["rms"] < -125.0
            or dev["5"]["rms"] - ref["5"]["rms"] < 0.5)
