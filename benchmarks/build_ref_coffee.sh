#!/bin/sh
# Build the reference benchmark harness against the read-only reference tree.
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/ref_coffee_bench}
g++ -O3 -march=native -std=c++17 \
    "$(dirname "$0")/ref_coffee_bench.cpp" -o "$OUT" \
    -I"$REF/src" \
    -I"$REF/src/core" \
    -I"$REF/src/objects" \
    -I"$REF/src/objects/primatives" \
    -I"$REF/src/acceleration" \
    -I"$REF/src/materials" \
    -I"$REF/src/materials/textures" \
    -I"$REF/src/materials/volumes" \
    -I"$REF/src/image" \
    -I"$REF/src/image/external" \
    -lpng -lpthread
echo "built $OUT"
