"""ctypes bindings for the C++ libav video decoder.

The shared library (``libo3video.so``) is the decord-equivalent: it probes
container metadata and decodes exactly the requested frame indices to RGB24,
skipping decode work for unsampled frames where the codec allows.

Build: ``bash open_o3_video_tpu/native/build.sh``
"""

from __future__ import annotations

import ctypes
import os
from dataclasses import dataclass

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libo3video.so")
_lib = None


@dataclass
class VideoMeta:
    num_frames: int
    fps: float
    width: int
    height: int


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _try_build()
    if not os.path.exists(_LIB_PATH):
        raise FileNotFoundError(
            f"native decoder not built: {_LIB_PATH} (run open_o3_video_tpu/native/build.sh)"
        )
    lib = ctypes.CDLL(_LIB_PATH)
    lib.o3v_probe.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),  # num_frames
        ctypes.POINTER(ctypes.c_double),  # fps
        ctypes.POINTER(ctypes.c_int),  # width
        ctypes.POINTER(ctypes.c_int),  # height
    ]
    lib.o3v_probe.restype = ctypes.c_int
    lib.o3v_decode_frames.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),  # indices
        ctypes.c_int64,  # n indices
        ctypes.POINTER(ctypes.c_uint8),  # out buffer (n, H, W, 3)
        ctypes.c_int,  # width
        ctypes.c_int,  # height
    ]
    lib.o3v_decode_frames.restype = ctypes.c_int
    lib.o3v_decode_frames_scaled.argtypes = lib.o3v_decode_frames.argtypes + [
        ctypes.c_int,  # interp: 0=bilinear, 1=bicubic
    ]
    lib.o3v_decode_frames_scaled.restype = ctypes.c_int
    _lib = lib
    return lib


def _try_build() -> None:
    """Best-effort first-use build (the .so is not checked in).

    Serialized across processes with an exclusive lockfile so concurrent
    workers don't race the compiler; failures fall through to _load()'s
    FileNotFoundError with the manual build command.
    """
    import subprocess

    script = os.path.join(os.path.dirname(__file__), "build.sh")
    if not os.path.exists(script):
        return
    lock_path = _LIB_PATH + ".buildlock"
    try:
        with open(lock_path, "w") as lock:
            try:
                import fcntl

                fcntl.flock(lock, fcntl.LOCK_EX)
            except ImportError:
                pass
            if not os.path.exists(_LIB_PATH):  # may have been built while waiting
                subprocess.run(
                    ["bash", script], check=False, capture_output=True, timeout=300
                )
    except OSError:
        pass


def available() -> bool:
    if not os.path.exists(_LIB_PATH):
        _try_build()
    return os.path.exists(_LIB_PATH)


def probe(path: str) -> VideoMeta:
    lib = _load()
    n = ctypes.c_int64()
    fps = ctypes.c_double()
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.o3v_probe(path.encode(), ctypes.byref(n), ctypes.byref(fps), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise IOError(f"o3v_probe failed ({rc}) for {path}")
    return VideoMeta(num_frames=n.value, fps=fps.value, width=w.value, height=h.value)


def decode_frames(path: str, indices: np.ndarray) -> np.ndarray:
    """Decode the given frame indices; returns (N, H, W, 3) uint8 RGB."""
    meta = probe(path)
    return decode_frames_scaled(path, indices, meta.width, meta.height, bicubic=False)


def decode_frames_scaled(
    path: str, indices: np.ndarray, width: int, height: int, bicubic: bool = True
) -> np.ndarray:
    """Decode + swscale-resize in one C++ pass; (N, height, width, 3) uint8.

    Fuses the model resize into decode (no intermediate full-res frames).
    swscale SWS_BICUBIC approximates the reference's PIL/torchvision bicubic.
    """
    if width <= 0 or height <= 0:
        # A degenerate pixel budget can floor smart_resize to 0 on one axis
        # (the reference's PIL/torchvision resize raises there too); swscale
        # must never see a 0 dimension — it aborts the process.
        raise ValueError(
            f"invalid resize target {width}x{height} (pixel budget too small "
            f"for this aspect ratio)"
        )
    lib = _load()
    idx = np.ascontiguousarray(np.asarray(indices, dtype=np.int64))
    out = np.empty((len(idx), height, width, 3), dtype=np.uint8)
    rc = lib.o3v_decode_frames_scaled(
        path.encode(),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(idx),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        width,
        height,
        1 if bicubic else 0,
    )
    if rc != 0:
        raise IOError(f"o3v_decode_frames_scaled failed ({rc}) for {path}")
    return out
