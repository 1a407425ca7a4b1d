"""Video/image ingestion: decode, uniform frame sampling, smart resize.

Pipeline semantics mirror the reference qwen-vl-utils fork
(src/r1-v/src/open_r1/vision_process.py) exactly:

- ``smart_resize``: 28-factor aspect-preserving resize under pixel budgets.
- ``smart_nframes``: FPS- or nframes-driven frame count, rounded to
  FRAME_FACTOR, clamped to [min_frames, max_frames, total].
- uniform ``linspace(0, total-1, nframes).round()`` frame sampling.
- per-frame bicubic antialiased resize (PIL; matches the reference's
  torchvision bicubic+antialias path, which was written to mimic PIL).

Decode backends (selected via FORCE_VIDEO_READER env or availability):

- ``native``: our C++ libavformat/libavcodec decoder (open_o3_video_tpu.native)
  — the decord equivalent, decodes only the sampled frames.
- ``cv2``: OpenCV VideoCapture fallback.

Arrays are numpy TCHW float32 (the torch-free analogue of the reference's
torch TCHW tensors); images are PIL.
"""

from __future__ import annotations

import logging
import math
import os
import sys
import time
from functools import lru_cache
from io import BytesIO
from typing import Any

import numpy as np
from PIL import Image

logger = logging.getLogger(__name__)

# Constants (reference: vision_process.py:25-42)
IMAGE_FACTOR = 28
MIN_PIXELS = 4 * 28 * 28
MAX_PIXELS = 256 * 28 * 28
MAX_RATIO = 200

VIDEO_MIN_PIXELS = 128 * 28 * 28
VIDEO_MAX_PIXELS = 128 * 28 * 28
FRAME_FACTOR = 2
FPS = 2.0
FPS_MIN_FRAMES = 4
FPS_MAX_FRAMES = 16

VIDEO_TOTAL_PIXELS = int(float(os.environ.get("VIDEO_MAX_PIXELS", 128000 * 28 * 28 * 0.9)))


def round_by_factor(number: float, factor: int) -> int:
    """Closest integer to ``number`` divisible by ``factor``."""
    return round(number / factor) * factor


def ceil_by_factor(number: float, factor: int) -> int:
    """Smallest integer >= ``number`` divisible by ``factor``."""
    return math.ceil(number / factor) * factor


def floor_by_factor(number: float, factor: int) -> int:
    """Largest integer <= ``number`` divisible by ``factor``."""
    return math.floor(number / factor) * factor


def smart_resize(
    height: int,
    width: int,
    factor: int = IMAGE_FACTOR,
    min_pixels: int = MIN_PIXELS,
    max_pixels: int = MAX_PIXELS,
) -> tuple[int, int]:
    """Target (h, w) such that both divide ``factor``, total pixels lie in
    [min_pixels, max_pixels], and aspect ratio is approximately preserved
    (reference: vision_process.py:61-87)."""
    if max(height, width) / min(height, width) > MAX_RATIO:
        raise ValueError(
            f"absolute aspect ratio must be smaller than {MAX_RATIO}, "
            f"got {max(height, width) / min(height, width)}"
        )
    h_bar = max(factor, round_by_factor(height, factor))
    w_bar = max(factor, round_by_factor(width, factor))
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = floor_by_factor(height / beta, factor)
        w_bar = floor_by_factor(width / beta, factor)
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = ceil_by_factor(height * beta, factor)
        w_bar = ceil_by_factor(width * beta, factor)
    return h_bar, w_bar


def smart_nframes(ele: dict, total_frames: int, video_fps: float) -> int:
    """Number of frames to sample for model input
    (reference: vision_process.py:145-182)."""
    assert not ("fps" in ele and "nframes" in ele), "Only accept either `fps` or `nframes`"
    if "nframes" in ele:
        nframes = round_by_factor(ele["nframes"], FRAME_FACTOR)
    else:
        fps = ele.get("fps", FPS)
        min_frames = ceil_by_factor(ele.get("min_frames", FPS_MIN_FRAMES), FRAME_FACTOR)
        max_frames = floor_by_factor(
            ele.get("max_frames", min(FPS_MAX_FRAMES, total_frames)), FRAME_FACTOR
        )
        nframes = total_frames / video_fps * fps
        if nframes > total_frames:
            logger.warning(f"smart_nframes: nframes[{nframes}] > total_frames[{total_frames}]")
        nframes = min(min(max(nframes, min_frames), max_frames), total_frames)
        nframes = floor_by_factor(nframes, FRAME_FACTOR)
    if not (FRAME_FACTOR <= nframes and nframes <= total_frames):
        raise ValueError(
            f"nframes should in interval [{FRAME_FACTOR}, {total_frames}], but got {nframes}."
        )
    return nframes


def sample_indices(total_frames: int, nframes: int) -> np.ndarray:
    """Uniform linspace sampling, matching torch.linspace(...).round().long()
    (reference: vision_process.py:216, 252). torch.round rounds half-to-even;
    numpy.round does too, so the indices agree."""
    return np.round(np.linspace(0, total_frames - 1, nframes)).astype(np.int64)


def trim_window(ele: dict, total_frames: int, video_fps: float) -> tuple[int, int]:
    """``video_start``/``video_end`` (seconds) -> (first frame index, window
    length in frames).

    Reference semantics: the torchvision reader trims via
    io.read_video(start_pts=video_start, end_pts=video_end, pts_unit="sec")
    — an INCLUSIVE pts range — then samples nframes uniformly over the
    trimmed span (vision_process.py:194-218). Frame i's pts is i/fps, so
    the window is [ceil(start*fps), floor(end*fps)] clamped to the video.
    (The reference's decord reader raises NotImplementedError instead,
    :246-248; both our backends support trimming.)"""
    start = float(ele.get("video_start") or 0.0)
    end = ele.get("video_end", None)
    start_idx = max(0, int(math.ceil(start * video_fps - 1e-6)))
    if end is None:
        end_idx = total_frames - 1
    else:
        end_idx = min(total_frames - 1, int(math.floor(float(end) * video_fps + 1e-6)))
    if end_idx < start_idx:
        raise ValueError(
            f"empty video window [video_start={start}, video_end={end}] "
            f"at fps={video_fps} ({total_frames} frames)"
        )
    return start_idx, end_idx - start_idx + 1


# --------------------------------------------------------------------------
# Decode backends
# --------------------------------------------------------------------------


def _read_video_cv2(ele: dict) -> tuple[np.ndarray, float]:
    """OpenCV decode: returns (TCHW uint8 RGB array of sampled frames,
    sample_fps). Seeks per sampled index for long videos."""
    import cv2

    video_path = ele["video"]
    if video_path.startswith("file://"):
        video_path = video_path[7:]
    st = time.time()
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise IOError(f"cv2 failed to open video: {video_path}")
    total_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    video_fps = cap.get(cv2.CAP_PROP_FPS) or 1.0
    start_idx, window = trim_window(ele, total_frames, video_fps)
    nframes = smart_nframes(ele, total_frames=window, video_fps=video_fps)
    idx = sample_indices(window, nframes) + start_idx

    frames = []
    # Sequential grab/retrieve is robust across codecs; seek only when the
    # sampled set is sparse enough that skipping decodes wins. The
    # sequential path must decode up to the END of the trim window, so
    # that — not total_frames — is the cost to beat.
    sparse = (start_idx + window) > 4 * nframes
    if sparse:
        for i in idx:
            cap.set(cv2.CAP_PROP_POS_FRAMES, int(i))
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(frame)
    if len(frames) != nframes:
        frames = []
        cap.release()
        cap = cv2.VideoCapture(video_path)
        pos = 0
        if start_idx > 0:
            # One coarse seek to the trim start so a deep video_start
            # window doesn't decode the whole preamble; verified via
            # POS_FRAMES — codecs whose seeking is unreliable (why this
            # fallback exists at all) still decode from 0.
            cap.set(cv2.CAP_PROP_POS_FRAMES, int(start_idx))
            if int(cap.get(cv2.CAP_PROP_POS_FRAMES)) == int(start_idx):
                pos = int(start_idx)
            else:
                cap.release()
                cap = cv2.VideoCapture(video_path)
        want = set(int(i) for i in idx)
        counts = {int(i): int(np.sum(idx == i)) for i in idx}
        while len(frames) < nframes:
            ok = cap.grab()
            if not ok:
                break
            if pos in want:
                ok, frame = cap.retrieve()
                if not ok:
                    break
                frames.extend([frame] * counts[pos])
            pos += 1
    cap.release()
    if len(frames) < nframes:
        if not frames:
            raise IOError(f"cv2 decoded no frames from {video_path}")
        # Tolerate truncated containers the way decord's EOF retry does.
        frames.extend([frames[-1]] * (nframes - len(frames)))
    video = np.stack(frames)[..., ::-1]  # BGR -> RGB
    video = np.ascontiguousarray(video.transpose(0, 3, 1, 2))  # TCHW
    logger.info(
        f"cv2: video_path={video_path!r}, total_frames={total_frames}, "
        f"video_fps={video_fps}, time={time.time() - st:.3f}s"
    )
    sample_fps = nframes / max(window, 1e-6) * video_fps
    return video, sample_fps


def _read_video_native(ele: dict) -> tuple[np.ndarray, float]:
    """C++ libav decoder: decodes only sampled frames (decord equivalent)."""
    from ..native import video_decoder

    video_path = ele["video"]
    if video_path.startswith("file://"):
        video_path = video_path[7:]
    st = time.time()
    meta = video_decoder.probe(video_path)
    total_frames, video_fps = meta.num_frames, meta.fps
    start_idx, window = trim_window(ele, total_frames, video_fps)
    nframes = smart_nframes(ele, total_frames=window, video_fps=video_fps)
    idx = sample_indices(window, nframes) + start_idx
    video = video_decoder.decode_frames(video_path, idx)  # THWC uint8 RGB
    video = np.ascontiguousarray(video.transpose(0, 3, 1, 2))
    logger.info(
        f"native: video_path={video_path!r}, total_frames={total_frames}, "
        f"video_fps={video_fps}, time={time.time() - st:.3f}s"
    )
    sample_fps = nframes / max(window, 1e-6) * video_fps
    return video, sample_fps


VIDEO_READER_BACKENDS = {
    "native": _read_video_native,
    "cv2": _read_video_cv2,
}

FORCE_VIDEO_READER = os.getenv("FORCE_VIDEO_READER", None)


def is_native_available() -> bool:
    try:
        from ..native import video_decoder

        return video_decoder.available()
    except Exception:
        return False


@lru_cache(maxsize=1)
def get_video_reader_backend() -> str:
    if FORCE_VIDEO_READER is not None:
        backend = FORCE_VIDEO_READER
    elif is_native_available():
        backend = "native"
    else:
        backend = "cv2"
    print(f"open_o3_video_tpu using {backend} to read video.", file=sys.stderr)
    return backend


# --------------------------------------------------------------------------
# Fetch (image / video / conversations)
# --------------------------------------------------------------------------


def to_rgb(pil_image: Image.Image) -> Image.Image:
    """RGBA flattens onto a white background; everything else converts to RGB
    (reference: vision_process.py:90-96)."""
    if pil_image.mode == "RGBA":
        white = Image.new("RGB", pil_image.size, (255, 255, 255))
        white.paste(pil_image, mask=pil_image.split()[3])
        return white
    return pil_image.convert("RGB")


def fetch_image(ele: dict[str, Any], size_factor: int = IMAGE_FACTOR) -> Image.Image:
    """Load + smart-resize one image (reference: vision_process.py:99-142).
    http(s) URLs are rejected — this build runs with zero egress."""
    image = ele.get("image", ele.get("image_url"))
    if isinstance(image, Image.Image):
        image_obj = image
    elif isinstance(image, np.ndarray):
        image_obj = Image.fromarray(image)
    elif isinstance(image, str):
        if image.startswith(("http://", "https://")):
            raise ValueError("remote image URLs are not supported in this environment")
        if image.startswith("file://"):
            image_obj = Image.open(image[7:])
        elif image.startswith("data:image"):
            import base64

            if "base64," not in image:
                raise ValueError("data:image must be base64-encoded")
            _, b64 = image.split("base64,", 1)
            image_obj = Image.open(BytesIO(base64.b64decode(b64)))
        else:
            image_obj = Image.open(image)
    else:
        raise ValueError(
            f"Unrecognized image input, support local path, base64 and PIL.Image, got {image}"
        )
    image_pil = to_rgb(image_obj)
    if "resized_height" in ele and "resized_width" in ele:
        resized_height, resized_width = smart_resize(
            ele["resized_height"], ele["resized_width"], factor=size_factor
        )
    else:
        width, height = image_pil.size
        resized_height, resized_width = smart_resize(
            height,
            width,
            factor=size_factor,
            min_pixels=ele.get("min_pixels", MIN_PIXELS),
            max_pixels=ele.get("max_pixels", MAX_PIXELS),
        )
    return image_pil.resize((resized_width, resized_height))


def resize_video_frames(video_tchw: np.ndarray, height: int, width: int) -> np.ndarray:
    """Bicubic antialiased per-frame resize to (height, width); float32 TCHW.

    PIL's bicubic resize is inherently antialiased, which is the behavior
    torchvision's antialias=True bicubic emulates (reference:
    vision_process.py:310-315)."""
    T = video_tchw.shape[0]
    out = np.empty((T, 3, height, width), dtype=np.float32)
    for t in range(T):
        frame = np.ascontiguousarray(video_tchw[t].transpose(1, 2, 0))
        img = Image.fromarray(frame.astype(np.uint8)).resize(
            (width, height), Image.Resampling.BICUBIC
        )
        out[t] = np.asarray(img, dtype=np.float32).transpose(2, 0, 1)
    return out


def fetch_video(
    ele: dict, image_factor: int = IMAGE_FACTOR, return_video_sample_fps: bool = False
):
    """Decode + sample + resize one video element
    (reference: vision_process.py:279-333).

    A path returns float32 TCHW numpy; a list of frames returns PIL images
    padded to a FRAME_FACTOR multiple.
    """
    if isinstance(ele["video"], str):
        backend = get_video_reader_backend()
        try:
            video, sample_fps = VIDEO_READER_BACKENDS[backend](ele)
        except Exception as e:
            if backend == "cv2":
                # cv2 IS the fallback: retrying the same reader on the same
                # file doubles the decode cost and reports the second
                # attempt's traceback instead of the real one.
                raise
            logger.warning(f"video reader backend {backend} error, falling back to cv2, msg: {e}")
            video, sample_fps = VIDEO_READER_BACKENDS["cv2"](ele)

        nframes, _, height, width = video.shape
        min_pixels = ele.get("min_pixels", VIDEO_MIN_PIXELS)
        total_pixels = ele.get("total_pixels", VIDEO_TOTAL_PIXELS)
        max_pixels = max(
            min(VIDEO_MAX_PIXELS, total_pixels / nframes * FRAME_FACTOR),
            int(min_pixels * 1.05),
        )
        max_pixels_supposed = ele.get("max_pixels", max_pixels)
        if max_pixels_supposed > max_pixels:
            logger.warning(f"The given max_pixels[{max_pixels_supposed}] exceeds limit[{max_pixels}].")
        max_pixels = min(max_pixels_supposed, max_pixels)
        if "resized_height" in ele and "resized_width" in ele:
            resized_height, resized_width = smart_resize(
                ele["resized_height"], ele["resized_width"], factor=image_factor
            )
        else:
            resized_height, resized_width = smart_resize(
                height, width, factor=image_factor, min_pixels=min_pixels, max_pixels=max_pixels
            )
        video = resize_video_frames(video, resized_height, resized_width)
        if return_video_sample_fps:
            return video, sample_fps
        return video
    else:
        assert isinstance(ele["video"], (list, tuple))
        process_info = ele.copy()
        process_info.pop("type", None)
        process_info.pop("video", None)
        images = [
            fetch_image({"image": frame, **process_info}, size_factor=image_factor)
            for frame in ele["video"]
        ]
        nframes = ceil_by_factor(len(images), FRAME_FACTOR)
        if len(images) < nframes:
            images.extend([images[-1]] * (nframes - len(images)))
        if return_video_sample_fps:
            return images, process_info.pop("fps", 2.0)
        return images


def fetch_video_fast(ele: dict) -> tuple[np.ndarray, float]:
    """Serving fast path: decode + bicubic resize fused in the C++ decoder.

    Same sampling (smart_nframes/linspace) and size (smart_resize) math as
    :func:`fetch_video`, but swscale does the resize during decode — no
    intermediate full-resolution frames, no per-frame PIL pass. Returns
    (uint8 TCHW at the model resolution, sample_fps). swscale SWS_BICUBIC
    approximates (not bit-matches) the reference's PIL bicubic; use
    fetch_video for strict preprocessing parity.
    """
    from ..native import video_decoder

    video_path = ele["video"]
    if video_path.startswith("file://"):
        video_path = video_path[7:]
    meta = video_decoder.probe(video_path)
    start_idx, window = trim_window(ele, meta.num_frames, meta.fps)
    nframes = smart_nframes(ele, total_frames=window, video_fps=meta.fps)
    idx = sample_indices(window, nframes) + start_idx

    min_pixels = ele.get("min_pixels", VIDEO_MIN_PIXELS)
    total_pixels = ele.get("total_pixels", VIDEO_TOTAL_PIXELS)
    max_pixels = max(
        min(VIDEO_MAX_PIXELS, total_pixels / nframes * FRAME_FACTOR),
        int(min_pixels * 1.05),
    )
    max_pixels = min(ele.get("max_pixels", max_pixels), max_pixels)
    resized_height, resized_width = smart_resize(
        meta.height, meta.width, factor=IMAGE_FACTOR,
        min_pixels=min_pixels, max_pixels=max_pixels,
    )
    frames_hwc = video_decoder.decode_frames_scaled(
        video_path, idx, resized_width, resized_height, bicubic=True
    )
    video = np.ascontiguousarray(frames_hwc.transpose(0, 3, 1, 2))
    sample_fps = nframes / max(window, 1e-6) * meta.fps
    return video, sample_fps


def fetch_video_raw(ele: dict) -> tuple[np.ndarray, tuple[int, int], float]:
    """Device-resize serving path: decode ONLY; resize happens on the TPU.

    Same sampling (smart_nframes/linspace) and size (smart_resize) math as
    :func:`fetch_video_fast`, but the frames come back at the DECODED
    resolution and the model-resolution resize runs on-device with exact
    PIL-bicubic semantics (ops/resize.py — pass the returned target as
    ``Request.resize_hw``). The host never runs a resample kernel, and the
    numerics match the reference's PIL path (vision_process.py:310-315)
    rather than swscale's approximation. Returns
    (uint8 TCHW source-res frames, (resized_h, resized_w), sample_fps).
    """
    from ..native import video_decoder

    video_path = ele["video"]
    if video_path.startswith("file://"):
        video_path = video_path[7:]
    meta = video_decoder.probe(video_path)
    start_idx, window = trim_window(ele, meta.num_frames, meta.fps)
    nframes = smart_nframes(ele, total_frames=window, video_fps=meta.fps)
    idx = sample_indices(window, nframes) + start_idx

    min_pixels = ele.get("min_pixels", VIDEO_MIN_PIXELS)
    total_pixels = ele.get("total_pixels", VIDEO_TOTAL_PIXELS)
    max_pixels = max(
        min(VIDEO_MAX_PIXELS, total_pixels / nframes * FRAME_FACTOR),
        int(min_pixels * 1.05),
    )
    max_pixels = min(ele.get("max_pixels", max_pixels), max_pixels)
    resized_height, resized_width = smart_resize(
        meta.height, meta.width, factor=IMAGE_FACTOR,
        min_pixels=min_pixels, max_pixels=max_pixels,
    )
    frames_hwc = video_decoder.decode_frames(video_path, idx)
    video = np.ascontiguousarray(frames_hwc.transpose(0, 3, 1, 2))
    sample_fps = nframes / max(window, 1e-6) * meta.fps
    return video, (resized_height, resized_width), sample_fps


def extract_vision_info(conversations) -> list[dict]:
    """Collect image/video content elements from chat messages
    (reference: vision_process.py:336-351)."""
    vision_infos = []
    if isinstance(conversations[0], dict):
        conversations = [conversations]
    for conversation in conversations:
        for message in conversation:
            if isinstance(message["content"], list):
                for ele in message["content"]:
                    if (
                        "image" in ele
                        or "image_url" in ele
                        or "video" in ele
                        or ele.get("type") in ("image", "image_url", "video")
                    ):
                        vision_infos.append(ele)
    return vision_infos


def process_vision_info(conversations, return_video_kwargs: bool = False):
    """(images, videos[, {'fps': [...]}]) for a batch of conversations
    (reference: vision_process.py:354-379)."""
    vision_infos = extract_vision_info(conversations)
    image_inputs = []
    video_inputs = []
    video_sample_fps_list = []
    for vision_info in vision_infos:
        if "image" in vision_info or "image_url" in vision_info:
            image_inputs.append(fetch_image(vision_info))
        elif "video" in vision_info:
            video_input, video_sample_fps = fetch_video(vision_info, return_video_sample_fps=True)
            video_sample_fps_list.append(video_sample_fps)
            video_inputs.append(video_input)
        else:
            raise ValueError("image, image_url or video should in content.")
    if len(image_inputs) == 0:
        image_inputs = None
    if len(video_inputs) == 0:
        video_inputs = None
    if return_video_kwargs:
        return image_inputs, video_inputs, {"fps": video_sample_fps_list}
    return image_inputs, video_inputs
