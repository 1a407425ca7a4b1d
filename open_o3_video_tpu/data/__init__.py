"""Host-side data plane: video decode, frame sampling, smart resize, datasets."""

from .video import (
    fetch_video_fast,
    smart_resize,
    smart_nframes,
    fetch_image,
    fetch_video,
    process_vision_info,
    IMAGE_FACTOR,
    MIN_PIXELS,
    MAX_PIXELS,
    VIDEO_MIN_PIXELS,
    VIDEO_MAX_PIXELS,
    FRAME_FACTOR,
    FPS,
    FPS_MIN_FRAMES,
    FPS_MAX_FRAMES,
)

__all__ = [k for k in dir() if not k.startswith("_")]
