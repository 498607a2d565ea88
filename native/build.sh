#!/bin/sh
# Build the native IO library next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 slamio.cpp -o libslamio.so -lpng -lz -lpthread
echo "built $(pwd)/libslamio.so"
