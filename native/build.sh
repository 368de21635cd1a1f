#!/bin/sh
# Build libgamma_host.so next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -std=c++17 -fPIC -shared -pthread -fvisibility=hidden \
    -o libgamma_host.so gamma_host.cc -lzstd
echo "built $(pwd)/libgamma_host.so"
g++ -O2 -std=c++17 -o gamma_client_demo gamma_client.cc
echo "built $(pwd)/gamma_client_demo"
