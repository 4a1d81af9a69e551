#!/bin/bash
# Build the golden-vector generator against the read-only reference headers
# and regenerate tests/golden/.  The raw dumps are compressed into a single
# .npz by tools/pack_golden.py.
set -euo pipefail
cd "$(dirname "$0")"

NFIELDS="${1:-4}"
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT

g++ -O2 -std=c++17 -mavx2 -mfma -mbmi2 \
    -DHAVE_AVX=1 -DHAVE_FMA=1 -DHAVE_BMI2=1 \
    -I/root/reference/src \
    golden_gen.cpp -o "$TMP/golden_gen"

mkdir -p "$TMP/raw"
"$TMP/golden_gen" "$TMP/raw" "$NFIELDS"

python pack_golden.py "$TMP/raw" ../tests/golden/golden.npz "$NFIELDS"
echo "golden vectors packed to tests/golden/golden.npz"
