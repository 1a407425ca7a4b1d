"""Tests for video ingestion: smart_resize, smart_nframes, decode, fetch."""

import os
import sys
import types

import numpy as np
import pytest

from open_o3_video_tpu.data import video as V

EXAMPLE_VIDEO = "/root/reference/eval/example_video.mp4"
REF_OPEN_R1 = "/root/reference/src/r1-v/src/open_r1"


def _load_reference_vision():
    """Import the reference vision_process with torchvision stubbed out —
    smart_resize / smart_nframes never touch it."""
    if not os.path.isdir(REF_OPEN_R1):
        return None
    if "torchvision" not in sys.modules:
        import importlib.machinery

        tv = types.ModuleType("torchvision")
        tv.__version__ = "0.0.0"
        tv.io = types.ModuleType("torchvision.io")
        tv.transforms = types.ModuleType("torchvision.transforms")
        tv.transforms.InterpolationMode = types.SimpleNamespace(BICUBIC="bicubic")
        tv.transforms.functional = types.SimpleNamespace()
        # A stub without __spec__ breaks importlib.util.find_spec for any
        # LATER import of transformers (its availability probe raises
        # "torchvision.__spec__ is None") — test-order-dependent failures.
        for name, mod in (("torchvision", tv), ("torchvision.io", tv.io),
                          ("torchvision.transforms", tv.transforms)):
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod
    sys.path.insert(0, REF_OPEN_R1)
    try:
        import vision_process as ref

        return ref
    except Exception:
        return None
    finally:
        sys.path.remove(REF_OPEN_R1)


REF = _load_reference_vision()


class TestSmartResize:
    def test_divisible_by_factor(self):
        h, w = V.smart_resize(360, 640)
        assert h % 28 == 0 and w % 28 == 0

    def test_pixel_budget(self):
        h, w = V.smart_resize(2000, 3000, max_pixels=V.MAX_PIXELS)
        assert h * w <= V.MAX_PIXELS

    def test_min_budget(self):
        h, w = V.smart_resize(10, 10, min_pixels=V.MIN_PIXELS)
        assert h * w >= V.MIN_PIXELS

    def test_extreme_ratio_raises(self):
        with pytest.raises(ValueError):
            V.smart_resize(10, 4000)

    @pytest.mark.skipif(REF is None, reason="reference repo not mounted")
    def test_differential(self):
        import random

        rng = random.Random(0)
        for _ in range(200):
            h = rng.randint(28, 3000)
            w = rng.randint(28, 3000)
            if max(h, w) / min(h, w) > 200:
                continue
            for kwargs in [
                {},
                {"min_pixels": V.VIDEO_MIN_PIXELS, "max_pixels": V.VIDEO_MIN_PIXELS * 2},
                {"max_pixels": 128 * 28 * 28},
            ]:
                assert V.smart_resize(h, w, **kwargs) == REF.smart_resize(h, w, **kwargs), (h, w, kwargs)


class TestSmartNframes:
    def test_nframes_override(self):
        assert V.smart_nframes({"nframes": 15}, total_frames=100, video_fps=30) == 16

    def test_fps_path_caps_at_max(self):
        # 100s of video at 2 fps target = 200 frames, capped at 16
        n = V.smart_nframes({}, total_frames=3000, video_fps=30)
        assert n == 16

    def test_short_video_min(self):
        n = V.smart_nframes({}, total_frames=10, video_fps=30)
        assert n == 4

    @pytest.mark.skipif(REF is None, reason="reference repo not mounted")
    def test_differential(self):
        import random

        rng = random.Random(1)
        for _ in range(200):
            total = rng.randint(4, 20000)
            fps = rng.choice([10, 23.97, 24, 25, 29.97, 30, 60])
            for ele in [{}, {"fps": 1.0}, {"nframes": min(rng.randint(2, 64), total)},
                        {"max_frames": 32}, {"fps": 4.0, "min_frames": 8, "max_frames": 64}]:
                try:
                    ours = V.smart_nframes(dict(ele), total, fps)
                except ValueError:
                    ours = "raise"
                try:
                    theirs = REF.smart_nframes(dict(ele), total, fps)
                except ValueError:
                    theirs = "raise"
                assert ours == theirs, (ele, total, fps)


class TestSampleIndices:
    def test_linspace_round_matches_torch(self):
        import torch

        for total, n in [(491, 16), (100, 4), (7, 6), (1000, 16)]:
            ours = V.sample_indices(total, n)
            theirs = torch.linspace(0, total - 1, n).round().long().numpy()
            assert np.array_equal(ours, theirs), (total, n)


@pytest.mark.skipif(not os.path.exists(EXAMPLE_VIDEO), reason="example video not mounted")
class TestDecode:
    def test_cv2_backend(self):
        video, sample_fps = V._read_video_cv2({"video": EXAMPLE_VIDEO})
        assert video.shape == (16, 3, 360, 640)
        assert video.dtype == np.uint8
        assert sample_fps == pytest.approx(16 / 491 * 22.29, rel=1e-3)

    def test_native_backend_matches_cv2(self):
        if not V.is_native_available():
            pytest.skip("native decoder not built")
        native, fps_n = V._read_video_native({"video": EXAMPLE_VIDEO})
        ref, fps_c = V._read_video_cv2({"video": EXAMPLE_VIDEO})
        assert native.shape == ref.shape
        assert fps_n == pytest.approx(fps_c)
        # Same codec, same sampled indices -> identical pixels.
        assert np.mean(np.abs(native.astype(int) - ref.astype(int))) < 1.0

    def test_fetch_video_resizes_to_28_factor(self):
        video, fps = V.fetch_video({"video": EXAMPLE_VIDEO}, return_video_sample_fps=True)
        t, c, h, w = video.shape
        assert t == 16 and c == 3
        assert h % 28 == 0 and w % 28 == 0
        assert h * w <= max(V.VIDEO_MAX_PIXELS, int(V.VIDEO_MIN_PIXELS * 1.05))
        assert video.dtype == np.float32

    def test_process_vision_info_video(self):
        conv = [
            {"role": "user", "content": [
                {"type": "video", "video": EXAMPLE_VIDEO},
                {"type": "text", "text": "q"},
            ]}
        ]
        images, videos, kwargs = V.process_vision_info(conv, return_video_kwargs=True)
        assert images is None
        assert len(videos) == 1 and len(kwargs["fps"]) == 1

    def test_fetch_video_list_of_frames_pads(self):
        from PIL import Image

        frames = [Image.new("RGB", (64, 48), (i, 0, 0)) for i in range(3)]
        out, fps = V.fetch_video({"video": frames}, return_video_sample_fps=True)
        assert len(out) == 4  # padded to FRAME_FACTOR multiple
        assert fps == 2.0


class TestFetchImage:
    def test_rgba_flattens_white(self):
        from PIL import Image

        img = Image.new("RGBA", (56, 56), (255, 0, 0, 0))  # fully transparent
        out = V.fetch_image({"image": img})
        assert out.mode == "RGB"
        assert out.getpixel((5, 5)) == (255, 255, 255)

    def test_resize_budget(self):
        from PIL import Image

        img = Image.new("RGB", (1000, 1000))
        out = V.fetch_image({"image": img, "max_pixels": 256 * 28 * 28})
        assert out.size[0] * out.size[1] <= 256 * 28 * 28

    def test_rejects_remote(self):
        with pytest.raises(ValueError):
            V.fetch_image({"image": "https://example.com/x.png"})


class TestDevicePatchify:
    def test_matches_host_patchify(self):
        import jax.numpy as jnp

        from open_o3_video_tpu.ops.preprocess import patchify, patchify_device

        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, (2, 3, 56, 84), dtype=np.uint8)
        host, grid = patchify(frames)
        dev = np.asarray(patchify_device(jnp.asarray(frames)))
        assert grid == (1, 4, 6)
        np.testing.assert_allclose(dev, host, atol=1e-5)

    def test_single_image_needs_tps_padding(self):
        import jax.numpy as jnp

        from open_o3_video_tpu.ops.preprocess import patchify, patchify_device

        rng = np.random.default_rng(1)
        frame = rng.integers(0, 255, (1, 3, 28, 28), dtype=np.uint8)
        host, _ = patchify(frame)  # host pads T 1 -> 2 by repeat
        padded = np.concatenate([frame, frame], axis=0)
        dev = np.asarray(patchify_device(jnp.asarray(padded)))
        np.testing.assert_allclose(dev, host, atol=1e-5)


@pytest.mark.skipif(not os.path.exists(EXAMPLE_VIDEO), reason="example video not mounted")
class TestFetchVideoFast:
    def test_matches_reference_path_closely(self):
        if not V.is_native_available():
            pytest.skip("native decoder not built")
        from open_o3_video_tpu.data.video import fetch_video_fast

        fast, fps_fast = fetch_video_fast({"video": EXAMPLE_VIDEO, "nframes": 8})
        ref, fps_ref = V.fetch_video({"video": EXAMPLE_VIDEO, "nframes": 8},
                                     return_video_sample_fps=True)
        assert fast.shape == ref.shape
        assert fast.dtype == np.uint8
        assert fps_fast == pytest.approx(fps_ref)
        # swscale bicubic vs PIL bicubic: close, not bit-identical
        diff = np.abs(fast.astype(np.float32) - ref).mean()
        assert diff < 3.0, f"mean abs pixel diff {diff}"


@pytest.mark.skipif(not os.path.exists(EXAMPLE_VIDEO), reason="example video not mounted")
class TestNativeKeyframeSeeks:
    """Sparse targets beyond the seek gap must use av_seek_frame and still
    return frame-exact results (seek path falls back to sequential decode
    on any timestamp uncertainty)."""

    @pytest.fixture(scope="class")
    def long_video(self, tmp_path_factory):
        import cv2

        path = str(tmp_path_factory.mktemp("vid") / "long.mp4")
        w, h, n = 160, 120, 2000
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
        rng = np.random.default_rng(0)
        base = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        for i in range(n):
            f = base.copy()
            f[:20, :20] = (i % 255, (i // 255) % 255, 17)  # frame stamp
            vw.write(f)
        vw.release()
        return path, n

    def test_sparse_seek_decode_matches_cv2(self, long_video):
        import cv2

        from open_o3_video_tpu.native.video_decoder import decode_frames, available

        if not available():
            pytest.skip("native decoder not built")
        path, n = long_video
        # gap ~285 >> the 128-frame seek threshold: seeks engage
        idx = np.linspace(0, n - 1, 8).astype(np.int64)
        frames = decode_frames(path, idx)
        cap = cv2.VideoCapture(path)
        for j, i in enumerate(idx):
            cap.set(cv2.CAP_PROP_POS_FRAMES, int(i))
            ok, f = cap.read()
            assert ok
            ref = cv2.cvtColor(f, cv2.COLOR_BGR2RGB)
            np.testing.assert_array_equal(frames[j], ref, err_msg=f"frame {i}")
        cap.release()

    def test_unsorted_and_repeated_indices(self, long_video):
        from open_o3_video_tpu.native.video_decoder import decode_frames, available

        if not available():
            pytest.skip("native decoder not built")
        path, n = long_video
        idx = np.array([1500, 10, 1500, 700], dtype=np.int64)
        frames = decode_frames(path, idx)
        np.testing.assert_array_equal(frames[0], frames[2])
        sorted_frames = decode_frames(path, np.array([10, 700, 1500], dtype=np.int64))
        np.testing.assert_array_equal(frames[1], sorted_frames[0])
        np.testing.assert_array_equal(frames[3], sorted_frames[1])
        np.testing.assert_array_equal(frames[0], sorted_frames[2])
