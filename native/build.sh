#!/bin/sh
# Build the native host-pipeline library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -o libtie_assembler.so \
    tie_assembler.cpp -lpthread
echo "built native/libtie_assembler.so"
