#!/bin/sh
# Build the native host codec (ctypes shared library).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libark_codec.so ark_codec.cpp
echo "built $(pwd)/libark_codec.so"
