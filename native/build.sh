#!/bin/bash
# Build the native geometry library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fopenmp -shared -fPIC -std=c++17 \
    actionmesh_native.cpp -o libactionmesh_native.so
echo "built native/libactionmesh_native.so"
