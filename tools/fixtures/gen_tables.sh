#!/bin/sh
# Dump the reference CPU tracker's feature tables for the BASELINE
# configs bench.py needs accuracy oracles for (traffic 500-feat with
# per-frame replacement; laptops 2000-feat affine).  Built at
# -O0 -ffp-contract=off — the flag set that reproduces the repo's
# committed goldens byte-for-byte — so the tables ARE reference
# semantics, not a recompile variant.  Output: tests/fixtures/*.ft
# (regenerable; consumed by bench.py's drift/status fields).
set -e
REF=/root/reference/src/V1
REPO=$(cd "$(dirname "$0")/../.." && pwd)
SCRATCH=$(mktemp -d)
trap 'rm -rf "$SCRATCH"' EXIT

cp "$REF"/*.c "$REF"/*.h "$SCRATCH"/
cd "$SCRATCH"
gcc -O0 -ffp-contract=off -DNDEBUG -c convolve.c error.c pnmio.c pyramid.c \
    selectGoodFeatures.c storeFeatures.c trackFeatures.c klt.c klt_util.c \
    writeFeatures.c
gcc -O0 -ffp-contract=off -DNDEBUG -o bench_ref \
    "$REPO/tools/fixtures/bench_ref.c" ./*.o -I. -lm

mkdir -p "$REPO/tests/fixtures"
echo "traffic 500 feat + replacement, 551 frames (a few minutes)..."
# affine arg -1: affineConsistencyCheck OFF (the reference default,
# src/V1/klt.c:34, and what the replacement workflow V4/example3.c
# runs).  r3/r4 passed 0 here, which ENABLES the check in translation
# mode (>= 0, src/V1/trackFeatures.c:1457) -- an oracle the bench
# config never matched; every kill-decision "divergence" measured in
# r4 traced back to it.
./bench_ref /root/reference/data/images_traffic 500 551 -1 1 1 \
    "$REPO/tests/fixtures/table_traffic_500r.ft"
echo "laptops 2000 feat affine, 60 frames (4-level/ss2 pyramid)..."
./bench_ref /root/reference/data/images_laptops 2000 60 2 0 1 \
    "$REPO/tests/fixtures/table_laptops_2000aff.ft" 4 2
