"""V-STAR benchmark harness: 5 queries per item (VQA + 2 grounding chains).

Rebuilds eval/test/test_vstar_multi_images.py: cv2 1-fps frame extraction
(<=16 frames), frame prompts with timestamps, the exact five prompt builders
(VQA, Chain-1 temporal->spatial, Chain-2 spatial->temporal with GT box count/
boxes given), JSON repair, bbox extraction with denormalization, and ordered
result aggregation. Parallelism: the reference forks one process per GPU;
here items are batched through the TPU engine in-process.
"""

from __future__ import annotations

import json
import math
import os
import re
from typing import Optional, Sequence

import numpy as np

from ..grounding.tags import refined_timestamps

extract_timestamps = refined_timestamps  # same salvage logic (reference: 132-145)


def extract_frames_from_video(video_path: str, fps: float = 1.0, max_frames: int = 16):
    """PIL frames + times at ~1 fps, uniformly subsampled past max_frames
    (reference: 90-130)."""
    import cv2
    from PIL import Image

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise ValueError(f"Could not open video: {video_path}")
    video_fps = cap.get(cv2.CAP_PROP_FPS)
    total_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    duration = total_frames / video_fps
    frame_interval = int(video_fps / fps)
    expected = int(duration * fps)
    if expected > max_frames:
        frame_indices = np.linspace(0, total_frames - 1, max_frames, dtype=int)
    else:
        frame_indices = list(range(0, total_frames, frame_interval))[:max_frames]

    frames, frame_times = [], []
    for idx in frame_indices:
        cap.set(cv2.CAP_PROP_POS_FRAMES, int(idx))
        ok, frame = cap.read()
        if not ok:
            continue
        frames.append(Image.fromarray(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)))
        frame_times.append(idx / video_fps)
    cap.release()
    return frames, frame_times


def fix_incomplete_json(json_str: str) -> str:
    """Balance brackets of truncated model JSON (reference: 148-170)."""
    open_sq, close_sq = json_str.count("["), json_str.count("]")
    open_cu, close_cu = json_str.count("{"), json_str.count("}")
    if open_sq > close_sq:
        json_str += "]" * (open_sq - close_sq)
    elif close_sq > open_sq:
        json_str = "[" * (close_sq - open_sq) + json_str
    if open_cu > close_cu:
        json_str += "}" * (open_cu - close_cu)
    elif close_cu > open_cu:
        json_str = "{" * (close_cu - open_cu) + json_str
    return json_str


def create_frame_prompt(frame_times: Sequence[float]) -> str:
    out = ""
    for i, t in enumerate(frame_times):
        out += f"Frame {i + 1} at {round(t, 1)}s: <|vision_start|><|image_pad|><|vision_end|>\n"
    return out


def strip_stray_vision_tags(text: str) -> str:
    """Remove image-pad blocks that leaked into the question body
    (reference: remove_vision_tags, 222-240)."""
    start_marker = "the question about the video"
    end_marker = "<|im_start|>assistant"
    tag = "<|vision_start|><|image_pad|><|vision_end|>"
    start = text.find(start_marker)
    if start == -1:
        return text
    end = text.find(end_marker, start + len(start_marker))
    if end == -1:
        return text
    middle = text[start + len(start_marker) : end].replace(tag, "")
    return text[: start + len(start_marker)] + middle + text[end:]


def inference(video_path: str, prompt: str, model, fps: float = 1.0):
    """One V-STAR query: frames as images with timestamps (reference: 186-263)."""
    frames, frame_times = extract_frames_from_video(
        video_path, fps=fps, max_frames=model.video_max_frames
    )
    if not frames:
        raise ValueError(f"No frames extracted from video: {video_path}")
    frame_prompt = create_frame_prompt(frame_times)
    if "<|vision_start|><|video_pad|><|vision_end|>" in prompt:
        prompt = prompt.replace("<|vision_start|><|video_pad|><|vision_end|>", frame_prompt)
    else:
        prompt = frame_prompt + prompt

    messages = [
        {"role": "system", "content": "You are a helpful assistant."},
        {
            "role": "user",
            "content": [{"type": "text", "text": prompt}]
            + [{"type": "image", "image": frame} for frame in frames],
        },
    ]
    text = model.processor.apply_chat_template(messages, add_generation_prompt=True)
    text = strip_stray_vision_tags(text)

    from ..data.video import process_vision_info

    image_inputs, _, _ = process_vision_info([messages], return_video_kwargs=True)
    mm_data = {}
    if image_inputs is not None:
        mm_data["image"] = image_inputs
    generated = model.inference_wo_process([{"prompt": text, "multi_modal_data": mm_data}])
    return generated, len(frames), (frames[0].size if frames else (0, 0))


THINK_SUFFIX_VQA = (
    "You must first think about the reasoning process in the mind and then provide the user "
    "with the answer. The reasoning process and answer are enclosed within <think> </think> "
    "and <answer> </answer> tags, respectively. All reasoning must be grounded in visual "
    "evidence from the video. When you mention any related object, person, or specific visual "
    "element, you must strictly follow the following format: "
    "`<obj>object_name</obj><box>bounding_box</box>at<t>time_in_seconds</t>s`. "
    "Do not use <box>, <obj> and <t> in the answer part."
)


def get_answer_vqa(data, video_path, model, think_mode=True):
    prompt = (
        f"Answer the question about the video: {data['question']} \n "
        "(If the answer is a person, you don't need to identify the person.)"
    )
    if think_mode:
        prompt += THINK_SUFFIX_VQA
    answer, _, _ = inference(video_path, prompt, model)
    return answer


def get_answer_temporal(data, video_path, model, think_mode=True):
    video_length = round(data["frame_count"] / data["fps"], 2)
    q = data["temporal_question"]
    if think_mode:
        prompt = (
            f"This video is {video_length} seconds long. "
            "<|vision_start|><|video_pad|><|vision_end|>\n"
            f"Answer the question about the video: {q} \n. You must first think about the "
            "reasoning process in the mind and then provide the user with the answer. The "
            "reasoning process and answer are enclosed within <think> </think> and "
            "<answer> </answer> tags, respectively. The answer must follow the following "
            "format: `From <t>start_time</t>s to <t>end_time</t>s'"
        )
    else:
        prompt = (
            f"This video is {video_length} seconds long. "
            "<|vision_start|><|video_pad|><|vision_end|>\n"
            f"Answer the question about the video: {q} \nDirectly output the start and end "
            "moment timestamps. You must follow the following format: "
            "`From <t>start_time</t>s to <t>end_time</t>s'."
        )
    answer, _, _ = inference(video_path, prompt, model)
    return answer


def get_answer_temporal_2(data, video_path, bboxes, model, think_mode=True):
    video_length = round(data["frame_count"] / data["fps"], 2)
    q = data["temporal_question"]
    w, h = data["width"], data["height"]
    head = (
        f"This video is {video_length} seconds long with a resolution of {w}x{h} "
        "(width x height). <|vision_start|><|video_pad|><|vision_end|>\n"
        f"Answer the question about the video: {q} \nThere are {len(bboxes)} bounding boxes "
        f"of the key object related to the question in the video without knowing the time, "
        f"which are:{bboxes}. "
    )
    if think_mode:
        prompt = head + (
            "You must first think about the reasoning process in the mind and then provide "
            "the user with the answer. The reasoning process and answer are enclosed within "
            "<think> </think> and <answer> </answer> tags, respectively. The answer must "
            "follow the following format: `From <t>start_time</t>s to <t>end_time</t>s'"
        )
    else:
        prompt = head + (
            "Directly output the start and end moment timestamps. You must follow the "
            "following format: `From <t>start_time</t>s to <t>end_time</t>s'."
        )
    answer, _, _ = inference(video_path, prompt, model)
    return answer


def get_answer_spatial(data, video_path, model, think_mode=True):
    st, et = math.ceil(data["timestamps"][0]), math.floor(data["timestamps"][1])
    time_range = list(range(st, et + 1))
    q = data["spatial_question"]
    if think_mode:
        prompt = f"""<|vision_start|><|video_pad|><|vision_end|>
Please answer the question about the video: {q} with a series of bounding boxes in [x1, y1, x2, y2] format.
You must first think about the reasoning process in the mind and then provide the user with the answer. The reasoning process and answer are enclosed within <think> </think> and <answer> </answer> tags, respectively.
In the answer part, for each whole second within the time range {time_range} provided (inclusive of the boundaries), output a series of bounding boxes of the object in JSON format. The keys should be the whole seconds (as strings), and the values should be the box in [x1, y1, x2, y2] format.
Example output of the answer part: {{"{time_range[0]}": [x1, y1, x2, y2],...}}
"""
    else:
        prompt = f"""<|vision_start|><|video_pad|><|vision_end|>
Please answer the question about the video: {q} with a series of bounding boxes in [x1, y1, x2, y2] format.
For each whole second within the time range {time_range} provided (inclusive of the boundaries), output a series of bounding boxes of the object in JSON format. The keys should be the whole seconds (as strings), and the values should be the box in [x1, y1, x2, y2] format.
Example output: {{"{time_range[0]}": [x1, y1, x2, y2],...}}
"""
    answer, _, frame_size = inference(video_path, prompt, model)
    return answer, frame_size[0], frame_size[1]


def get_answer_spatial_2(data, video_path, bboxes, model, think_mode=True):
    q = data["spatial_question_2"]
    n = len(bboxes)
    if think_mode:
        prompt = f"""<|vision_start|><|video_pad|><|vision_end|>
Please answer the question about the video: {q} with a series of bounding boxes in [x1, y1, x2, y2] format.
You must first think about the reasoning process in the mind and then provide the user with the answer. The reasoning process and answer are enclosed within <think> </think> and <answer> </answer> tags, respectively.
In the answer part, for each whole second that may related to the question, output a series of bounding boxes of the object in JSON format. You only need to output {n} bbox(es). You need to determine which frame is related to the question, and you don't need to output the bbox for the frames not related to the question.
The keys should be the whole seconds (as strings), and the values should be the bounding box in [x0,y0,x1,y1] format.

Example output of the answer part:
{{"0": [x0,y0,x1,y1], "1":..., ..., "{n}":...}} (if the frames at 0~{n} second are related to the questions)
"""
    else:
        prompt = f"""<|vision_start|><|video_pad|><|vision_end|>
Please answer the question about the video: {q} with a series of bounding boxes in [x1, y1, x2, y2] format.
For each whole second that may related to the question, output a series of bounding boxes of the object in JSON format. You only need to output {n} bbox(es). You need to determine which frame is related to the question, and you don't need to output the bbox for the frames not related to the question.
The keys should be the whole seconds (as strings), and the values should be the bounding box in [x0,y0,x1,y1] format.

Example output:
{{"0": [x0,y0,x1,y1], "1":..., ..., "{n}":...}} (if the frames at 0~{n} second are related to the questions)
"""
    answer, _, frame_size = inference(video_path, prompt, model)
    return answer, frame_size[0], frame_size[1]


def extract_bounding_boxes(answer_spatial: str, data: dict, input_width: int, input_height: int):
    """Parse the per-second box JSON and denormalize from model-frame to
    original video resolution (reference: 375-449)."""
    m = re.search(r"<answer>(.*?)</answer>", answer_spatial, re.DOTALL)
    if m:
        answer_spatial = m.group(1).strip()
    w, h = data["width"], data["height"]

    def denorm(bbox):
        try:
            if len(bbox) == 1:
                bbox = bbox[0]
            if len(bbox) == 2:
                bbox = bbox[1]
            return [
                int(bbox[0] / input_width * w),
                int(bbox[1] / input_height * h),
                int(bbox[2] / input_width * w),
                int(bbox[3] / input_height * h),
            ]
        except Exception as e:
            print(f"Processing {bbox} occurs Error {e}")
            return bbox

    markdown = re.search(r"```json\s*\n(\[.*?\]|\{.*?\})\s*\n```", answer_spatial, re.DOTALL)
    m = markdown or re.search(r"(\[[\s\S]*\]|\{[\s\S]*\})", answer_spatial, re.DOTALL)
    if not m:
        print("No match found for the bounding box JSON.")
        return None
    raw = m.group(1).strip().replace("'", '"')
    try:
        boxes = json.loads(raw)
    except Exception:
        fixed = fix_incomplete_json(raw)
        try:
            boxes = json.loads(fixed)
        except Exception as e:
            print(f"Failed after fixing: {e}\nExtracted JSON: {fixed}")
            return None
        if isinstance(boxes, list):
            return [b for b in boxes]
        if isinstance(boxes, dict):
            return {k: denorm(v) for k, v in boxes.items()}
        return None
    if isinstance(boxes, list) and all(isinstance(item, dict) for item in boxes):
        combined = {}
        for item in boxes:
            combined.update(item)
        boxes = combined
    if isinstance(boxes, list):
        return {str(b[0]): denorm(b[1]) for b in boxes}
    if isinstance(boxes, dict):
        return {k: denorm(v) for k, v in boxes.items()}
    return None


def find_video(video_folder: str, vid: str) -> Optional[str]:
    target = f"{vid}.mp4"
    for root, _, files in os.walk(video_folder):
        if target in files:
            return os.path.join(root, target)
    return None


def process_item(data: dict, video_folder: str, model, think_mode: bool = True) -> Optional[dict]:
    """Run all 5 queries for one item (reference worker body: 473-571)."""
    vid = data.get("vid") or data.get("video_id")
    video_path = data.get("video_path") or find_video(video_folder, vid)
    if video_path is None or not os.path.exists(video_path):
        print(f"Warning: video not found for {vid}, skipping")
        return None

    result = dict(data)
    result["answer_vqa"] = get_answer_vqa(data, video_path, model, think_mode)

    # Chain 1: when -> where
    ans_t = get_answer_temporal(data, video_path, model, think_mode)
    result["answer_temporal_pre"] = ans_t
    result["answer_temporal"] = extract_timestamps(ans_t)

    ans_s, iw, ih = get_answer_spatial(data, video_path, model, think_mode)
    result["answer_spatial_pre"] = ans_s
    result["answer_spatial"] = extract_bounding_boxes(ans_s, data, iw, ih)

    # Chain 2: where (GT box count given) -> when (GT boxes given)
    gt_boxes = [
        {k: box[k] for k in ("xmin", "ymin", "xmax", "ymax")} for box in data.get("bboxes", [])
    ]
    ans_s2, iw2, ih2 = get_answer_spatial_2(data, video_path, gt_boxes, model, think_mode)
    result["answer_spatial_pre_2"] = ans_s2
    result["answer_spatial_2"] = extract_bounding_boxes(ans_s2, data, iw2, ih2)

    ans_t2 = get_answer_temporal_2(data, video_path, gt_boxes, model, think_mode)
    result["answer_temporal_pre_2"] = ans_t2
    result["answer_temporal_2"] = extract_timestamps(ans_t2)
    return result


def evaluate(
    anno_file: str,
    video_folder: str,
    model,
    output_file: str,
    *,
    think_mode: bool = True,
    limit: Optional[int] = None,
) -> list[dict]:
    """Full benchmark pass; results restored to annotation order
    (reference main: 575-693)."""
    with open(anno_file) as f:
        annotations = json.load(f)
    for i, item in enumerate(annotations):
        item["original_index"] = i
    if limit:
        annotations = annotations[:limit]

    results = []
    for item in annotations:
        out = process_item(item, video_folder, model, think_mode)
        if out is not None:
            results.append(out)
    results.sort(key=lambda r: r["original_index"])
    with open(output_file, "w") as f:
        json.dump(results, f, indent=2)
    print(f"V-STAR inference complete: {len(results)} items -> {output_file}")
    return results
