#!/bin/sh
# Build the native helpers into native/*.so (g++ + zlib, no other deps).
set -e
cd "$(dirname "$0")/.."
g++ -O3 -fPIC -shared -o native/libexr_decode.so native/exr_decode.cpp -lz
echo "built native/libexr_decode.so"
