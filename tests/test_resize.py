"""Device-side PIL-parity bicubic resize (ops/resize.py).

The reference resizes frames on the host with PIL BICUBIC
(vision_process.py:310-315); the device path reproduces it as two
separable matmuls with per-pass uint8 rounding. Pinned here:
  - <=1 LSB vs PIL across down/up-scale and odd geometries (observed
    exact on >99.99% of pixels; diffs only at exact rounding boundaries);
  - the engine's resize->normalize->patchify program equals the host
    PIL-resize + host-patchify pipeline to float tolerance;
  - engine generate() with Request.resize_hw matches generate() on
    host-resized frames token-for-token.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from open_o3_video_tpu.ops.resize import (
    pil_resize_weights,
    resize_frames_device,
    resize_frames_host,
)


def _pil_resize(img_hwc: np.ndarray, oh: int, ow: int) -> np.ndarray:
    from PIL import Image

    return np.asarray(
        Image.fromarray(img_hwc).resize((ow, oh), Image.Resampling.BICUBIC)
    )


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((360, 640), (252, 448)),  # the example video's downscale shape
        ((360, 640), (420, 756)),  # upscale
        ((37, 53), (28, 28)),      # odd -> patch-aligned
        ((100, 100), (98, 98)),    # near-identity
    ],
)
def test_pil_parity(in_hw, out_hw):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (*in_hw, 3), dtype=np.uint8)
    ref = _pil_resize(img, *out_hw)
    ours = resize_frames_host(img.transpose(2, 0, 1)[None], *out_hw)[0]
    diff = np.abs(ours.transpose(1, 2, 0).astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1
    assert (diff != 0).mean() < 1e-3  # boundary ties only


def test_weights_row_stochastic():
    for n_in, n_out in ((640, 448), (360, 420), (28, 28)):
        w = pil_resize_weights(n_in, n_out)
        assert w.shape == (n_out, n_in)
        # quantized to the 2^-22 grid like PIL, so sums are 1 +- ksize*2^-22
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)


def test_device_matches_host_twin():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (2, 3, 36, 64), dtype=np.uint8)
    wh = jnp.asarray(pil_resize_weights(36, 28))
    ww = jnp.asarray(pil_resize_weights(64, 56))
    dev = np.asarray(resize_frames_device(jnp.asarray(frames), wh, ww))
    host = resize_frames_host(frames, 28, 56)
    np.testing.assert_array_equal(dev, host)


def test_engine_resize_patchify_matches_host_pipeline():
    """engine._frames_to_patches(src, resize_hw) == host PIL resize +
    host patchify, and generate() emits identical tokens both ways."""
    from open_o3_video_tpu.engine import InferenceEngine, Request, SamplingParams
    from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, params as P
    from open_o3_video_tpu.ops.preprocess import frames_as_images_patches

    cfg = Qwen25VLConfig.tiny()
    params = P.init(cfg, seed=0)
    engine = InferenceEngine(params, cfg, prompt_buckets=(128,),
                             cache_dtype=jnp.float32)

    rng = np.random.default_rng(2)
    psz = cfg.vision.patch_size * cfg.vision.spatial_merge_size
    oh, ow = 2 * psz, 2 * psz
    src = rng.integers(0, 256, (2, 3, 40, 72), dtype=np.uint8)

    # host pipeline: PIL-parity resize (host twin) -> host patchify
    host_resized = resize_frames_host(src, oh, ow).astype(np.uint8)
    host_patches, grid = frames_as_images_patches(
        host_resized, cfg.vision.patch_size, cfg.vision.temporal_patch_size,
        cfg.vision.spatial_merge_size,
    )
    dev_patches = np.asarray(
        engine._frames_to_patches(src, resize_hw=(oh, ow))
    )
    np.testing.assert_allclose(
        dev_patches, host_patches, atol=5e-3, rtol=0
    )  # engine patches are model-dtype (bf16-ish) wide

    n_tok = int(grid.prod(axis=1).sum()) // cfg.vision.merge_unit
    prompt = ([7, 8, cfg.vision_start_token_id]
              + [cfg.image_token_id] * n_tok
              + [cfg.vision_end_token_id, 9])
    sampling = SamplingParams(temperature=0.0, max_tokens=8)
    out_dev = engine.generate(
        [Request(input_ids=prompt, frames=src, resize_hw=(oh, ow),
                 grid_thw=grid, vision_token_id=cfg.image_token_id)],
        sampling,
    )
    out_host = engine.generate(
        [Request(input_ids=prompt, frames=host_resized,
                 grid_thw=grid, vision_token_id=cfg.image_token_id)],
        sampling,
    )
    assert out_dev[0]["token_ids"] == out_host[0]["token_ids"]


def test_prestage_frames_with_resize():
    from open_o3_video_tpu.engine import InferenceEngine
    from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, params as P

    cfg = Qwen25VLConfig.tiny()
    engine = InferenceEngine(P.init(cfg, seed=0), cfg, prompt_buckets=(64,),
                             cache_dtype=jnp.float32)
    rng = np.random.default_rng(3)
    psz = cfg.vision.patch_size * cfg.vision.spatial_merge_size
    src = [rng.integers(0, 256, (2, 3, 40, 72), dtype=np.uint8)
           for _ in range(3)]
    bufs = engine.prestage_frames(src, resize_hws=[(psz, psz)] * 3)
    direct = [np.asarray(engine._frames_to_patches(f, resize_hw=(psz, psz)))
              for f in src]
    for b, d in zip(bufs, direct):
        np.testing.assert_array_equal(np.asarray(b), d)


def test_fetch_video_raw_geometry():
    """fetch_video_raw returns source-res frames and the same target the
    fast path resizes to, on the real example video."""
    import os

    from open_o3_video_tpu.data.video import fetch_video_fast, fetch_video_raw
    from open_o3_video_tpu.native import video_decoder

    video = "/root/reference/eval/example_video.mp4"
    if not os.path.exists(video) or not video_decoder.available():
        pytest.skip("example video / native decoder unavailable")
    ele = {"video": video, "nframes": 4}
    raw, (rh, rw), fps_raw = fetch_video_raw(ele)
    fast, fps_fast = fetch_video_fast(ele)
    assert raw.shape[2:] == (360, 640)  # decoded resolution
    assert fast.shape[2:] == (rh, rw)   # same smart_resize target
    assert fps_raw == fps_fast
