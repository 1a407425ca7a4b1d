"""Shared N-path MCQ evaluation with test-time-scaling voting.

Rebuilds the per-item voting core of test_videomme.py:129-246 (also used by
WorldSense/VideoMMMU): N sampled reasoning paths, each parsed for
<answer> in {A..} and <think>; a path's vote weight is 1.0 under majority
voting or the model's own evidence-relevance score under confidence voting
(crop the claimed boxes, ask the model to rate 0/1/2 -> {1.0, 0.6, 0.2});
final answer = argmax of per-choice summed scores.

The reference runs one worker process per GPU (test_videomme.py:315-345);
here items stream through the TPU engine in-process — multi-chip scaling is
the engine's mesh, not OS processes.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Optional, Sequence

from ..grounding.tags import parse_evidence_patterns
from .tts import build_image_scorer_msgs, extract_and_crop, relevance_mapping

ANSWER_RE = re.compile(r"<answer>(.*?)</answer>", re.DOTALL)
THINK_RE = re.compile(r"<think>(.*?)</think>", re.DOTALL)


def evaluate_mcq_item(
    model,
    video_path: str,
    text_input: str,
    image,
    doc: dict,
    *,
    N: int = 1,
    vote: str = "majority_voting",
    think_mode: bool = True,
    choices: Sequence[str] = ("A", "B", "C", "D"),
    question_for_scorer: Optional[str] = None,
    parse_answer_fn: Optional[Callable[[str, dict], str]] = None,
) -> dict[str, Any]:
    """Returns {pred, think, frame_shape, paths} for one benchmark item.

    All N paths run as ONE engine batch when the model supports it
    (generate_paths: video decoded once, N sampled completions); TTS
    evidence-scoring calls are likewise batched (run_images_scorer_batch).
    Models exposing only the reference per-call surface fall back to the
    sequential loop."""
    score_list: list[float] = []
    pred_list: list[str] = []
    n_think = ["" for _ in range(N)]

    # 1. generate the N reasoning paths
    if hasattr(model, "generate_paths"):
        raw_outputs, frames, fps, frame_shape = model.generate_paths(
            video_path, text_input, image, N
        )
        raw_outputs = list(raw_outputs)
    else:
        raw_outputs, frames, fps, frame_shape = [], None, None, None
        for _ in range(N):
            output_list, frames, fps, frame_shape = model(
                [video_path], [text_input], query_image=[image]
            )
            raw_outputs.append(output_list[0])

    # 2. parse paths; defer confidence-vote scorer calls so they batch
    pending: list[tuple[int, list, list]] = []  # (score slot, msgs, crops)
    for path_idx, pred_text in enumerate(raw_outputs):
        if think_mode:
            m = ANSWER_RE.search(pred_text)
            if not m:
                pred_list.append("NA")
                score_list.append(0)
                print("exit since pred_text not match:", pred_text)
                continue
            ans = m.group(1).strip()
            if ans not in choices:
                pred_list.append("NA")
                score_list.append(0)
                print("exit since pred_text not ABCD:", ans)
                continue
            pred_list.append(ans)

            m = THINK_RE.search(pred_text)
            if not m:
                score_list.append(0)
                print("exit since think not match:", ans)
                continue
            think_process = m.group(1).strip()
            n_think[path_idx] = think_process

            if vote == "majority_voting":
                score = 1.0
            elif vote == "confidence_voting":
                think_info = parse_evidence_patterns(think_process)
                image_list = extract_and_crop(frames, fps, think_info) if think_info is not None else []
                if len(image_list) > 0:
                    question = question_for_scorer or doc.get("question", "")
                    msgs = build_image_scorer_msgs(image_list, question)
                    pending.append((len(score_list), msgs, image_list))
                    score = 0.2  # placeholder; overwritten below
                else:
                    score = 0.2
            else:
                score = 0.2
        else:
            if parse_answer_fn is not None:
                ans = parse_answer_fn(pred_text, doc)
            else:
                from .mcq import parse_answer

                ans = parse_answer(pred_text, doc)
            if ans in choices:
                pred_list.append(ans)
                score = 1.0
            else:
                pred_list.append("NA")
                score = 0.0
        score_list.append(score)

    # 3. batch the deferred evidence-scoring calls
    if pending:
        if hasattr(model, "run_images_scorer_batch"):
            ratings = model.run_images_scorer_batch([(m, im) for _, m, im in pending])
        else:
            ratings = [model.run_images_scorer(m, im) for _, m, im in pending]
        for (slot, _, _), rating in zip(pending, ratings):
            score_list[slot] = relevance_mapping(rating)

    choice_score = {c: 0.0 for c in choices}
    for i in range(len(pred_list)):
        if pred_list[i] == "NA":
            continue
        choice_score[pred_list[i]] += score_list[i] if i < len(score_list) else 0.0
    pred_final = max(choice_score, key=choice_score.get)

    think_text = ""
    for idx, p in enumerate(pred_list):
        if p == pred_final:
            think_text = n_think[idx] if idx < len(n_think) else ""
            break

    return {
        "pred": pred_final,
        "think": think_text,
        "frame_shape": frame_shape,
        "choice_score": choice_score,
        "paths": raw_outputs,
    }
