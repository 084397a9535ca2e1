#!/bin/sh
# Build the native runtime components into surfd_tpu/data/_native/.
set -e
cd "$(dirname "$0")"
OUT=../surfd_tpu/_native
mkdir -p "$OUT"
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread -fopenmp closest_point.cpp marching.cpp mesh_post.cpp -o "$OUT/libsurfd_native.so"
echo "built $OUT/libsurfd_native.so"
