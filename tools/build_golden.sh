#!/bin/sh
# Build the golden-dump harness against the read-only reference sources.
# Produces /tmp/art_golden/golden_dump (f32) and golden_dump64 (f64).
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/art_golden}
HERE=$(dirname "$0")
mkdir -p "$OUT"
# strict IEEE (no reassociation, no FMA contraction) so float op order is
# exactly the source order — the parity target is the reference's *math*,
# not its fast-math build artifacts
FLAGS="-O2 -ffp-contract=off -DENABLE_THREADS -DENABLE_EXTRAPOLATION -I$REF"
SRCS="$HERE/golden_dump.c $REF/resampler.c $REF/extrapolator.c $REF/decimator.c $REF/workers.c $REF/biquad.c"
# rebuild when the harness source is newer than the cached binary
{ [ -x "$OUT/golden_dump" ] && [ "$OUT/golden_dump" -nt "$HERE/golden_dump.c" ]; } \
    || gcc $FLAGS $SRCS -lm -pthread -o "$OUT/golden_dump"
{ [ -x "$OUT/golden_dump64" ] && [ "$OUT/golden_dump64" -nt "$HERE/golden_dump.c" ]; } \
    || gcc -DPATH_WIDTH=64 $FLAGS $SRCS -lm -pthread -o "$OUT/golden_dump64"
echo "$OUT"
