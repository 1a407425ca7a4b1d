"""Native (C++) host-side components: video decode, frame sampling.

Built from ``open_o3_video_tpu/native/src`` via ``build.sh`` (libavformat/
libavcodec/libswscale). Python bindings use ctypes; every entry point has a
pure-Python fallback so the framework degrades gracefully when the shared
library hasn't been compiled.
"""
