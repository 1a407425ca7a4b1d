#!/usr/bin/env bash
# Build the native C++ components (video decoder).
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -std=c++17 \
    src/video_decoder.cc \
    -lavformat -lavcodec -lavutil -lswscale \
    -o libo3video.so
echo "built $(pwd)/libo3video.so"
