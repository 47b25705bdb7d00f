# Build entry points, mirroring the reference's four-target Makefile
# (reference Makefile:5-19: art/art64/artest/artest64).  Here the CLIs are
# Python entry points over one package; the native targets build the C++
# runtime library the hot host paths load via ctypes.

PY ?= python

.PHONY: all native golden test bench bench-smoke clean

all: native

# C++ runtime (quantize/biquad/byte-pack hot loops) -> art_tpu/native/*.so
native:
	$(PY) -c "import art_tpu.native as n; assert n.available(); print(n._LIB)"

# strict-IEEE golden harness from the read-only reference (out-of-tree)
golden:
	sh tools/build_golden.sh

test: native
	$(PY) -m pytest tests/ -q

bench: native
	$(PY) bench.py

# on-TPU Mosaic regression gate: compile+run every shipped Pallas kernel at
# a production geometry vs a host oracle (the pytest suite runs them in
# interpret mode only); commit the artifact each round
bench-smoke:
	$(PY) tools/tpu_smoke.py --save=MOSAIC_SMOKE_r04.json

clean:
	rm -f art_tpu/native/*.so
	find . -name __pycache__ -type d -exec rm -rf {} +
