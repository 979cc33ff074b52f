#!/bin/sh
# Build the native multiseq ops shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libmultiseq_ops.so \
    multiseq_ops.cpp
echo "built native/libmultiseq_ops.so"
