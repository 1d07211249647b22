#!/usr/bin/env bash
# Build the native host-gather library (also built lazily on first use
# by shadowkv_tpu.native).
set -euo pipefail
cd "$(dirname "$0")/../native"
g++ -O3 -march=native -shared -fPIC -pthread host_gather.cpp \
  -o libhost_gather.so
echo "built native/libhost_gather.so"
