"""SFT dataset: per-task message building + the three collate paths.

Rebuilds prepare_dataset + collate_fn (sft_multi_task.py:56-399):
- visual QA: image grounding with bbox text rescaled to the resized image
- temporal-spatial free-form: GT-keyframe interleave + gemini bbox rewrite
- temporal / General video QA: timestamped frame prompt (no 's' dialect)
Targets are '<think>…</think>\\n<answer>…</answer>'; labels mask pad +
visual tokens (sft_multi_task.py:387-398).
"""

from __future__ import annotations

import copy
import json
import os
from typing import Any, Optional

import numpy as np
from PIL import Image

from ..grounding.coords import resize_boxes_in_text, rewrite_gemini_boxes_in_text
from ..grounding.prompts import (
    SFT_SYSTEM_PROMPT,
    VISION_PLACEHOLDER,
    frame_prompt_sft_temporal,
    interleave_keyframes,
)
from ..models.qwen25vl import get_rope_index
from .media_roots import keyframe_root, media_roots
from .processor import O3VideoProcessor
from .video import fetch_image, fetch_video

VISUAL_TOKEN_IDS = (151655,)  # Qwen2.5-VL masks the image-pad token
IGNORE_INDEX = -100


def visual_mask_ids(model_cfg) -> tuple[int, ...]:
    """Which special tokens the SFT labels mask, by family.

    Reference parity (sft_multi_task.py:391-396): the Qwen2-VL processor
    branch masks vision_start/vision_end/video_pad (151652/151653/151656);
    every other family masks only the image token the processor expands
    (Qwen2.5-VL: 151655)."""
    if getattr(model_cfg, "model_type", "") == "qwen2_vl":
        return (
            model_cfg.vision_start_token_id,
            model_cfg.vision_end_token_id,
            model_cfg.video_token_id,
        )
    return (getattr(model_cfg, "image_token_id", None) or VISUAL_TOKEN_IDS[0],)


def load_sft_dataset(path: str) -> list[dict[str, Any]]:
    with open(path) as f:
        if path.endswith(".jsonl"):
            return [json.loads(line) for line in f if line.strip()]
        return json.load(f)


def prepare_sft_example(example: dict[str, Any], data_root: str) -> dict[str, Any]:
    """Attach chat messages with the assistant target
    (reference: sft_multi_task.py:56-204)."""
    task = example["task"]
    roots = media_roots(data_root)
    target = "<think>" + example["reasoning_process"] + "</think>\n<answer>" + example["answer"] + "</answer>"

    def wrap(media, question_text):
        return [
            {"role": "system", "content": [{"type": "text", "text": SFT_SYSTEM_PROMPT[task]}]},
            {"role": "user", "content": [media, {"type": "text", "text": question_text}]},
            {"role": "assistant", "content": [{"type": "text", "text": target}]},
        ]

    if task == "visual QA":
        media = {"type": "image", "image": os.path.join(roots["treevgr"], example["image_path"])}
        messages = wrap(media, example["question"])
        return {"messages": messages, "image_size": example["image_size"], "task": task,
                "source": example["source"], "key_frames": []}
    if task == "temporal-spatial free-form QA":
        root = roots["str_plm"] if example["source"] == "STR_plm_rdcap" else roots["str"]
        media = {"type": "video", "video": os.path.join(root, example["video_path"])}
        messages = wrap(media, example["question"])
        return {"messages": messages, "key_frames": example["key_frames"], "task": task,
                "source": example["source"], "image_size": []}
    if task == "temporal QA":
        media = {"type": "video", "video": os.path.join(roots["tvg"], example["video_path"])}
        messages = wrap(media, "Question: " + example["question"])
        return {"messages": messages, "task": task, "source": example["source"],
                "key_frames": [], "image_size": []}
    if task in ("General video QA MCQ", "General video QA Free-form"):
        media = {"type": "video", "video": os.path.join(roots["videor1"], example["video_path"])}
        messages = wrap(media, "Question: " + example["question"])
        return {"messages": messages, "task": task, "source": example["source"],
                "key_frames": [], "image_size": []}
    raise ValueError(f"Unknown task: {task}")


def _load_keyframes_sft(example, data_root, size_wh):
    root = keyframe_root(example, data_root)
    out = []
    for kf in example["key_frames"]:
        img = Image.open(os.path.join(root, kf["path"])).convert("RGB").resize(size_wh)
        out.append(np.asarray(img).transpose(2, 0, 1))
    return out


def collate_sft(
    example: dict[str, Any],
    processor: O3VideoProcessor,
    model_cfg,
    data_root: str,
    *,
    nframes: Optional[int] = None,
) -> dict[str, Any]:
    """One prepared example -> a train-step batch (batch size 1, matching the
    reference's asserted bs=1, sft_multi_task.py:294)."""
    example = copy.deepcopy(example)
    messages = example["messages"]
    text = processor.apply_chat_template(messages, add_generation_prompt=False)
    task = example["task"]

    video_ele = None
    image_ele = None
    for msg in messages:
        if isinstance(msg["content"], list):
            for ele in msg["content"]:
                if ele.get("type") == "video":
                    video_ele = dict(ele)
                elif ele.get("type") == "image":
                    image_ele = dict(ele)

    if task == "visual QA":
        img = fetch_image(image_ele)
        text = resize_boxes_in_text(text, example["image_size"], [img.size[0], img.size[1]])
        proc = processor(text, images=[img])
    else:
        if nframes is not None:
            video_ele["nframes"] = nframes
        video, fps = fetch_video(video_ele, return_video_sample_fps=True)
        T, _, H, W = video.shape
        frames = [video[i] for i in range(T)]
        if task == "temporal-spatial free-form QA":
            kf_frames = _load_keyframes_sft(example, data_root, (W, H))
            kf_times = [kf["time"] for kf in example["key_frames"]]
            plan, frame_prompt = interleave_keyframes(
                T, fps, kf_times, round_kf_display=False, append_total_line=False
            )
            images = [frames[i] if kind == "video" else kf_frames[i] for kind, i in plan]
            text = text.replace(VISION_PLACEHOLDER, frame_prompt)
            text = rewrite_gemini_boxes_in_text(text, (W, H))
        else:  # temporal QA / General video QA
            frame_prompt = frame_prompt_sft_temporal(T, fps)
            text = text.replace(VISION_PLACEHOLDER, frame_prompt)
            images = frames
        proc = processor(text, images=images)

    input_ids = np.asarray([proc.input_ids])
    labels = input_ids.copy()
    pad_id = getattr(processor.tokenizer, "pad_token_id", None)
    if pad_id is not None:
        labels[labels == pad_id] = IGNORE_INDEX
    for tok in visual_mask_ids(model_cfg):
        labels[labels == tok] = IGNORE_INDEX

    position_ids, _ = get_rope_index(
        model_cfg, input_ids, image_grid_thw=proc.grid_thw
    )
    return {
        "input_ids": input_ids,
        "labels": labels,
        "position_ids": position_ids,
        "pixel_patches": proc.pixel_patches,
        "grid_thw": proc.grid_thw,
        "vision_token_id": model_cfg.image_token_id,
    }


def pack_sft_batch(
    singles: list[dict[str, Any]],
    model_cfg,
    *,
    pad_multiple: int = 64,
) -> dict[str, Any]:
    """Pad per-example collates into one global DP batch.

    The TPU-native replacement for the reference's 8-process DDP step
    (per_device_train_batch_size x world_size, run_sft_video.sh:13): B rows,
    right-padded to a shared length bucket, vision patches concatenated in
    row order with an explicit row-index map so the scatter stays static.
    """
    from ..models.qwen25vl import build_vision_row_index

    B = len(singles)
    lens = [s["input_ids"].shape[1] for s in singles]
    L = -(-max(lens) // pad_multiple) * pad_multiple
    pad_id = model_cfg.pad_token_id

    ids = np.full((B, L), pad_id, dtype=np.int64)
    labels = np.full((B, L), IGNORE_INDEX, dtype=np.int64)
    attn_valid = np.zeros((B, L), dtype=bool)
    pos = np.ones((3, B, L), dtype=np.int64)  # HF keeps pad positions at 1
    patch_list, grid_list, offsets = [], [], []
    n_merged = 0
    for b, s in enumerate(singles):
        n = lens[b]
        ids[b, :n] = s["input_ids"][0]
        labels[b, :n] = s["labels"][0]
        attn_valid[b, :n] = True
        pos[:, b, :n] = s["position_ids"][:, 0]
        offsets.append(n_merged)
        if s.get("pixel_patches") is not None:
            patch_list.append(np.asarray(s["pixel_patches"]))
            grid_list.append(np.asarray(s["grid_thw"]))
            n_merged += patch_list[-1].shape[0] // model_cfg.vision.merge_unit

    batch: dict[str, Any] = {
        "input_ids": ids,
        "labels": labels,
        "position_ids": pos,
        "attn_valid": attn_valid,
    }
    if patch_list:
        tok = model_cfg.image_token_id
        batch["pixel_patches"] = np.concatenate(patch_list, axis=0)
        batch["grid_thw"] = np.concatenate(grid_list, axis=0)
        batch["vision_token_id"] = tok
        batch["vision_row_index"] = build_vision_row_index(ids, tok, offsets)
    return batch


def collate_sft_batch(
    examples: list[dict[str, Any]],
    processor: O3VideoProcessor,
    model_cfg,
    data_root: str,
    *,
    nframes: Optional[int] = None,
    pad_multiple: int = 64,
) -> dict[str, Any]:
    """B prepared examples -> one padded global batch (DP over the mesh
    ``data`` axis; see pack_sft_batch)."""
    singles = [
        collate_sft(ex, processor, model_cfg, data_root, nframes=nframes)
        for ex in examples
    ]
    return pack_sft_batch(singles, model_cfg, pad_multiple=pad_multiple)
