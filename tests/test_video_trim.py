"""video_start/video_end trimming (reference: vision_process.py:194-218).

The reference's torchvision reader trims to the inclusive pts window
[video_start, video_end] seconds then samples nframes uniformly over the
trimmed span; its decord reader raises NotImplementedError (:246-248).
Both our backends implement the torchvision semantics; pinned here by
window math, cross-backend agreement, and (when torchvision can decode)
a frame-level differential against the actual reference reader.
"""

import os
import sys

import numpy as np
import pytest

from open_o3_video_tpu.data.video import (
    sample_indices,
    smart_nframes,
    trim_window,
    _read_video_cv2,
    _read_video_native,
    is_native_available,
)

EXAMPLE_VIDEO = "/root/reference/eval/example_video.mp4"  # 491 frames @ 22.29fps

pytestmark = pytest.mark.skipif(
    not os.path.exists(EXAMPLE_VIDEO), reason="example video not mounted"
)


def test_trim_window_math():
    # frame i has pts i/fps; inclusive [start, end] window
    start, n = trim_window({"video_start": 2.0, "video_end": 5.0}, 491, 22.29)
    assert start == int(np.ceil(2.0 * 22.29 - 1e-6)) == 45
    assert start + n - 1 == int(np.floor(5.0 * 22.29 + 1e-6)) == 111
    # no end -> through the last frame
    start, n = trim_window({"video_start": 10.0}, 491, 22.29)
    assert start + n == 491
    # no trimming -> full video
    assert trim_window({}, 491, 22.29) == (0, 491)
    # empty window raises
    with pytest.raises(ValueError):
        trim_window({"video_start": 30.0, "video_end": 1.0}, 491, 22.29)


def test_cv2_trimmed_selects_window_frames():
    """Trimmed read == manually sampling the window's absolute indices."""
    ele = {"video": EXAMPLE_VIDEO, "nframes": 4,
           "video_start": 2.0, "video_end": 8.0}
    video, sample_fps = _read_video_cv2(ele)
    assert video.shape[0] == 4

    full, _ = _read_video_cv2({"video": EXAMPLE_VIDEO, "nframes": 490})
    start, window = trim_window(ele, 491, 22.29)
    # reconstruct: full read sampled 490 of 491 indices; map through them
    full_idx = sample_indices(491, 490)
    expect_idx = sample_indices(window, 4) + start
    for k, fi in enumerate(expect_idx):
        pos = int(np.where(full_idx == fi)[0][0])
        np.testing.assert_array_equal(video[k], full[pos])
    # sample_fps densifies relative to the untrimmed read
    assert sample_fps == pytest.approx(4 / window * 22.29, rel=1e-3)


@pytest.mark.skipif(not is_native_available(), reason="native decoder not built")
def test_native_matches_cv2_on_trimmed_window():
    ele = {"video": EXAMPLE_VIDEO, "nframes": 4,
           "video_start": 3.0, "video_end": 12.0}
    v_native, fps_n = _read_video_native(dict(ele))
    v_cv2, fps_c = _read_video_cv2(dict(ele))
    assert v_native.shape == v_cv2.shape
    assert fps_n == pytest.approx(fps_c, rel=1e-6)
    # same frames, same decoder family (libav underneath both) -> equal
    # up to codec rounding
    diff = np.abs(v_native.astype(np.int32) - v_cv2.astype(np.int32))
    assert float(diff.mean()) < 2.0


def test_differential_vs_reference_torchvision_reader():
    """Feed the SAME ele to the reference's torchvision reader and ours;
    the sampled frames must be the same frames (pixel-equal up to decoder
    rounding)."""
    tv = pytest.importorskip("torchvision")
    sys.path.insert(0, "/root/reference/src/r1-v/src/open_r1")
    try:
        import vision_process as ref
    except Exception as e:
        pytest.skip(f"reference vision_process not importable: {e}")
    ele = {"video": EXAMPLE_VIDEO, "nframes": 4,
           "video_start": 2.0, "video_end": 8.0}
    try:
        ref_video, ref_fps = ref._read_video_torchvision(dict(ele))
    except Exception as e:
        pytest.skip(f"torchvision cannot decode in this image: {e}")
    ours, our_fps = _read_video_cv2(dict(ele))
    assert tuple(ref_video.shape) == ours.shape
    assert our_fps == pytest.approx(float(ref_fps), rel=0.05)
    diff = np.abs(ref_video.numpy().astype(np.int32) - ours.astype(np.int32))
    assert float(diff.mean()) < 3.0
