"""RL dataset: loading, prompt attachment, and per-step sample preparation.

Rebuilds data_loader.py:43-58 (dataset loading, %4 truncation) and the
media-preparation half of Qwen2VLGRPOTrainer.compute_loss
(grpo_trainer.py:407-564): path resolution by source, vision ingestion,
frame prompts with timestamps, GT-keyframe interleaving, tokenization.
"""

from __future__ import annotations

import copy
import json
import os
from typing import Any, Optional

import numpy as np
from PIL import Image

from ..grounding.prompts import (
    VISION_PLACEHOLDER,
    interleave_keyframes,
    frame_prompt_rl,
    make_conversation,
)
from .media_roots import keyframe_root, resolve_media
from .processor import O3VideoProcessor
from .video import fetch_image, fetch_video


def load_rl_dataset(path: str) -> list[dict[str, Any]]:
    """JSON/JSONL -> examples with 'prompt' chat attached; train size
    truncated to a multiple of 4 (reference: data_loader.py:43-58)."""
    if path.endswith(".jsonl"):
        with open(path) as f:
            data = [json.loads(line) for line in f if line.strip()]
    else:
        with open(path) as f:
            data = json.load(f)
    data = [make_conversation(dict(ex)) for ex in data]
    keep = len(data) - (len(data) % 4)
    print(f"Dataset 'train' split size: {keep}")
    return data[:keep]


def _clean_none(example: dict[str, Any]) -> dict[str, Any]:
    """Drop None-valued entries from content dicts and key_items
    (grpo_trainer.py:386-394, 439-450)."""
    for entry in example.get("prompt", []):
        if isinstance(entry.get("content"), list):
            for sub in entry["content"]:
                if isinstance(sub, dict):
                    for key in [k for k, val in sub.items() if val is None]:
                        del sub[key]
    if isinstance(example.get("key_items"), dict):
        for key in [k for k, val in example["key_items"].items() if val is None]:
            del example["key_items"][key]
        for item in example["key_items"].values():
            if isinstance(item, dict):
                for key in [k for k, val in item.items() if val is None]:
                    del item[key]
    return example


def _load_keyframes(example, data_root, size_wh) -> list[np.ndarray]:
    """Keyframe JPEGs resized to the video frame size, as CHW arrays
    (grpo_trainer.py:503-513)."""
    root = keyframe_root(example, data_root)
    frames = []
    for kf in example["key_frames"]:
        img = Image.open(os.path.join(root, kf["path"])).convert("RGB").resize(size_wh)
        frames.append(np.asarray(img).transpose(2, 0, 1))
    return frames


def prepare_rl_sample(
    example: dict[str, Any],
    processor: O3VideoProcessor,
    data_root: str,
    *,
    nframes: Optional[int] = None,
) -> dict[str, Any]:
    """One RL example -> a GSPOTrainer-ready sample.

    Video tasks feed frames as individual images with a timestamped frame
    prompt; temporal-spatial tasks additionally interleave GT keyframes
    (grpo_trainer.py:477-537).
    """
    example = copy.deepcopy(example)
    if "prompt" not in example:
        make_conversation(example)
    example = _clean_none(example)
    media_kind, media_path = resolve_media(example, data_root)
    prompt_text = processor.apply_chat_template(example["prompt"], add_generation_prompt=True)

    reward_kwargs = {
        k: v for k, v in example.items() if k not in ("prompt",)
    }

    if media_kind == "image":
        img = fetch_image({"image": media_path})
        reward_kwargs["image_size_refine"] = (img.size[0], img.size[1])
        proc = processor(prompt_text, images=[img])
        reward_kwargs["prompt_text_final"] = prompt_text
        return {
            "input_ids": proc.input_ids,
            "pixel_patches": proc.pixel_patches,
            "grid_thw": proc.grid_thw,
            # From the processor, not hardcoded: remapped-id configs
            # (tiny-vocab ByteTokenizer.for_config) would otherwise fail
            # the trainer's placeholder-count check and silently degrade
            # every sample.
            "vision_token_id": getattr(processor, "image_token_id", 151655),
            "reward_kwargs": reward_kwargs,
        }

    ele = {"video": media_path}
    if nframes is not None:
        ele["nframes"] = nframes
    video, sample_fps = fetch_video(ele, return_video_sample_fps=True)
    T, _, H, W = video.shape
    reward_kwargs["video_sample_fps"] = sample_fps
    reward_kwargs["video_duration"] = T / sample_fps
    reward_kwargs["image_size"] = (W, H)
    frames = [video[i] for i in range(T)]

    if example.get("task") == "temporal-spatial free-form QA":
        kf_frames = _load_keyframes(example, data_root, (W, H))
        kf_times = [kf["time"] for kf in example["key_frames"]]
        plan, frame_prompt = interleave_keyframes(
            T, sample_fps, kf_times, round_kf_display=True, append_total_line=True
        )
        ordered = [
            frames[idx] if kind == "video" else kf_frames[idx] for kind, idx in plan
        ]
        images = ordered
    else:
        frame_prompt = frame_prompt_rl(T, sample_fps)
        images = frames

    prompt_text = prompt_text.replace(VISION_PLACEHOLDER, frame_prompt)
    reward_kwargs["prompt_text_final"] = prompt_text
    proc = processor(prompt_text, images=images)
    return {
        "input_ids": proc.input_ids,
        "pixel_patches": proc.pixel_patches,
        "grid_thw": proc.grid_thw,
        # From the processor, not hardcoded: remapped-id configs (tiny-vocab
        # ByteTokenizer.for_config) would otherwise fail the trainer's
        # placeholder-count check and silently degrade every sample.
        "vision_token_id": getattr(processor, "image_token_id", 151655),
        "reward_kwargs": reward_kwargs,
    }
