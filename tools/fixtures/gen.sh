#!/bin/sh
# Build the reference CPU implementation in a scratch directory and run the
# fixture generator against it.  Requires the reference tree mounted at
# /root/reference (read-only).  Fixtures land in tests/fixtures/.
#
# The scratch build uses -O0 -ffp-contract=off, which reproduces the
# repository's committed golden outputs (src/V1/feat/features2.txt)
# byte-for-byte.
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
gcc -O0 -ffp-contract=off -DNDEBUG -o gen_fixtures \
    "$REPO/tools/fixtures/gen_fixtures.c" ./*.o -I. -lm

mkdir -p "$REPO/tests/fixtures"
./gen_fixtures "$REPO/tests/fixtures"
