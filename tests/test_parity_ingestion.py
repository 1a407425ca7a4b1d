"""Ingestion parity over EVERY real video shipped with the reference.

VERDICT r3 item 3a: the strongest weight-free evidence for the vision
front end. For each reference video (assets/*.mp4 + eval/example_video.mp4)
across fps/nframes/trim grids:

  1. sampling + sizing formulas differential vs the ACTUAL reference
     module (smart_nframes / smart_resize imported from
     /root/reference/src/r1-v/src/open_r1/vision_process.py, torch
     linspace indices) — exact equality;
  2. decoder cross-check: the native libav decoder vs cv2 at identical
     indices (different YUV->RGB converters bound the delta; the
     reference's torchvision reader is ALSO libav/FFmpeg, see PARITY.md);
  3. resize vs PIL on the real decoded frames — <=1 LSB (the reference's
     torchvision uint8 antialias path is purpose-built for PIL parity);
  4. the three fetch pipelines agree: fetch_video (host PIL),
     fetch_video_raw + device resize (TPU path), fetch_video_fast
     (swscale, documented approximation).

The only link no test here can touch is torchvision's own decode loop —
it cannot decode in this image (see tests/test_video_trim.py's gated
frame-level differential, and PARITY.md for the full evidence matrix).
"""

import os
import sys

import numpy as np
import pytest

from open_o3_video_tpu.data import video as V
from open_o3_video_tpu.native import video_decoder
from open_o3_video_tpu.ops.resize import resize_frames_host

VIDEOS = [
    "/root/reference/eval/example_video.mp4",
    "/root/reference/assets/5587257558.mp4",
    "/root/reference/assets/5804131706.mp4",
    "/root/reference/assets/s08e18_seg02_clip_03.mp4",
]
VIDEOS = [v for v in VIDEOS if os.path.exists(v)]

ELES = [
    {},
    {"nframes": 8},
    {"fps": 1.0},
    {"video_start": 1.0, "video_end": 5.0, "nframes": 4},
]

pytestmark = pytest.mark.skipif(
    not VIDEOS or not video_decoder.available(),
    reason="reference videos / native decoder unavailable",
)


def _load_reference_vision():
    sys.path.insert(0, "/root/reference/src/r1-v/src/open_r1")
    try:
        from tests.test_video_ingestion import _load_reference_vision as L

        return L()
    except Exception:
        return None


REF = _load_reference_vision()


@pytest.fixture(scope="module")
def decoded():
    """{path: (meta, idx@nframes=8, native u8 TCHW, cv2 u8 TCHW)}."""
    out = {}
    for vid in VIDEOS:
        meta = video_decoder.probe(vid)
        n = V.smart_nframes({"nframes": 8}, meta.num_frames, meta.fps)
        idx = V.sample_indices(meta.num_frames, n)
        nat = video_decoder.decode_frames(vid, idx).transpose(0, 3, 1, 2)
        cv = V._decode_indices_cv2(vid, idx) if hasattr(V, "_decode_indices_cv2") else None
        out[vid] = (meta, idx, nat, cv)
    return out


@pytest.mark.skipif(REF is None, reason="reference module not importable")
@pytest.mark.parametrize("vid", VIDEOS)
@pytest.mark.parametrize("ele_base", ELES)
def test_formulas_differential(vid, ele_base):
    """nframes, sampled indices, resize target and sample_fps all equal the
    reference's own math on this video's real metadata."""
    import torch

    meta = video_decoder.probe(vid)
    start, window = V.trim_window(ele_base, meta.num_frames, meta.fps)

    ours_n = V.smart_nframes(dict(ele_base), window, meta.fps)
    theirs_n = REF.smart_nframes(dict(ele_base), window, meta.fps)
    assert ours_n == theirs_n

    ours_idx = V.sample_indices(window, ours_n) + start
    theirs_idx = (torch.linspace(0, window - 1, theirs_n).round().long().numpy()
                  + start)
    assert np.array_equal(ours_idx, theirs_idx)

    min_pixels = V.VIDEO_MIN_PIXELS
    total_pixels = V.VIDEO_TOTAL_PIXELS
    max_pixels = max(
        min(V.VIDEO_MAX_PIXELS, total_pixels / ours_n * V.FRAME_FACTOR),
        int(min_pixels * 1.05),
    )
    ours_hw = V.smart_resize(meta.height, meta.width, factor=V.IMAGE_FACTOR,
                             min_pixels=min_pixels, max_pixels=max_pixels)
    theirs_hw = REF.smart_resize(meta.height, meta.width, factor=REF.IMAGE_FACTOR,
                                 min_pixels=min_pixels, max_pixels=max_pixels)
    assert tuple(ours_hw) == tuple(theirs_hw)


@pytest.mark.parametrize("vid", VIDEOS)
def test_decoders_agree(vid, decoded):
    """libav (native) vs cv2 on identical indices: same geometry, pixels
    within YUV-converter tolerance (mean < 1, 99.9% within 4)."""
    meta, idx, nat, _ = decoded[vid]
    cv = np.stack([
        f for f in _cv2_frames(vid, idx)
    ])
    assert nat.shape == cv.shape, (nat.shape, cv.shape)
    d = np.abs(nat.astype(np.int32) - cv.astype(np.int32))
    assert d.mean() < 1.0, d.mean()
    assert (d <= 4).mean() > 0.999, (d > 4).mean()


def _cv2_frames(vid, idx):
    import cv2

    cap = cv2.VideoCapture(vid)
    try:
        for i in idx:
            cap.set(cv2.CAP_PROP_POS_FRAMES, int(i))
            ok, frame = cap.read()
            assert ok, (vid, i)
            yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB).transpose(2, 0, 1)
    finally:
        cap.release()


@pytest.mark.parametrize("vid", VIDEOS)
def test_resize_pil_parity_on_real_frames(vid, decoded):
    """Our resample (the device path's exact semantics, host twin) vs PIL
    BICUBIC on this video's decoded frames: <=1 LSB, ties-only frequency."""
    from PIL import Image

    meta, idx, nat, _ = decoded[vid]
    n = V.smart_nframes({"nframes": 8}, meta.num_frames, meta.fps)
    max_pixels = max(
        min(V.VIDEO_MAX_PIXELS, V.VIDEO_TOTAL_PIXELS / n * V.FRAME_FACTOR),
        int(V.VIDEO_MIN_PIXELS * 1.05),
    )
    oh, ow = V.smart_resize(meta.height, meta.width, factor=V.IMAGE_FACTOR,
                            min_pixels=V.VIDEO_MIN_PIXELS, max_pixels=max_pixels)
    ours = resize_frames_host(nat, oh, ow).astype(np.uint8)
    pil = np.stack([
        np.asarray(Image.fromarray(f.transpose(1, 2, 0)).resize(
            (ow, oh), Image.Resampling.BICUBIC)).transpose(2, 0, 1)
        for f in nat
    ])
    d = np.abs(ours.astype(np.int32) - pil.astype(np.int32))
    assert d.max() <= 1, d.max()
    assert (d != 0).mean() < 1e-3, (d != 0).mean()


@pytest.mark.parametrize("vid", VIDEOS)
@pytest.mark.parametrize("ele_base", ELES)
def test_fetch_pipelines_agree(vid, ele_base):
    """fetch_video (host PIL), fetch_video_raw + device-resize semantics,
    and fetch_video_fast (swscale) produce the same geometry/fps; the
    device path matches the PIL path <=1 LSB; swscale stays a bounded
    approximation (its bicubic differs from PIL's by design)."""
    ele = dict(ele_base, video=vid)
    pil_frames, fps_pil = V.fetch_video(dict(ele), return_video_sample_fps=True)
    raw, (rh, rw), fps_raw = V.fetch_video_raw(dict(ele))
    fast, fps_fast = V.fetch_video_fast(dict(ele))

    assert fps_pil == pytest.approx(fps_raw) == pytest.approx(fps_fast)
    assert pil_frames.shape[2:] == (rh, rw) == fast.shape[2:]
    assert pil_frames.shape[0] == raw.shape[0] == fast.shape[0]

    dev = resize_frames_host(raw, rh, rw)  # device path semantics
    d = np.abs(dev - pil_frames.astype(np.float32))
    assert d.max() <= 1.0, d.max()

    d_fast = np.abs(fast.astype(np.float32) - pil_frames.astype(np.float32))
    assert d_fast.mean() < 4.0, d_fast.mean()
