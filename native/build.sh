#!/bin/sh
# Build the native graph-IO shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -o libgraphio.so graphio.cpp
echo "built $(pwd)/libgraphio.so"
