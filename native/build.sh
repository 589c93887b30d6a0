#!/bin/sh
# Build the native MPS parser shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -o libmps_parser.so mps_parser.cpp
echo "built $(pwd)/libmps_parser.so"
