#!/usr/bin/env bash
# Build the native runtime components into the Python package tree.
set -euo pipefail
cd "$(dirname "$0")"
mkdir -p ../jaybenne_tpu/native
g++ -O2 -shared -fPIC -std=c++17 mesh_builder.cc -o ../jaybenne_tpu/native/libjbmesh.so
echo "built jaybenne_tpu/native/libjbmesh.so"
