#!/usr/bin/env bash
# Build + run the C++ client against a live server (reference contract:
# imcui/api/test/build_and_run.sh).
set -euo pipefail
cd "$(dirname "$0")"
mkdir -p build
cmake -S . -B build -DCMAKE_BUILD_TYPE=Release >/dev/null
cmake --build build -j >/dev/null
./build/client "${1:-127.0.0.1}" "${2:-8001}" "${3:-}"
