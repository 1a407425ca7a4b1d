"""VideoMMMU evaluation harness (reference: eval/test/test_videommmu.py).

MCQ items (options A-J) go through the N-path voting core; open-ended items
run a single pass and are parsed with MMMU's open-response extraction.
Adaptation items carry a query image alongside the video (reference:
videommmu.py:144-149).
"""

from __future__ import annotations

import json
import time
from typing import Optional

from .dataloaders import videommmu as D
from .mcq_harness import evaluate_mcq_item


def evaluate(
    model,
    data_dir: str,
    output_file: str,
    *,
    N: int = 1,
    vote: str = "majority_voting",
    think_mode: bool = True,
    limit: Optional[int] = None,
) -> float:
    t0 = time.time()
    bench = D.VideoMMMUBench(data_dir, think_mode=think_mode)
    video_paths, image_input, text_input, docs = bench.get_data()
    if limit:
        video_paths, image_input, text_input, docs = (
            video_paths[:limit], image_input[:limit], text_input[:limit], docs[:limit]
        )

    metrics = []
    errors = []
    for i, (vp, img, txt, doc) in enumerate(zip(video_paths, image_input, text_input, docs)):
        item_t0 = time.time()
        try:
            pred = _run_item(model, vp, txt, img, doc, N=N, vote=vote, think_mode=think_mode)
        except Exception as e:
            # skip-and-record instead of fleet-kill (test_videomme.py:329-335)
            print(f"[warn] item {doc.get('id')} failed ({e!r}); skipping")
            errors.append({"id": doc.get("id"), "error": repr(e)})
            continue
        metrics.append(D.process_results(doc, pred))
        print(
            doc["id"], "GT:", doc["answer"],
            f"{i + 1}/{len(docs)} ({time.time() - item_t0:.1f}s)",
        )

    bench.cal_category_acc(metrics)
    acc = D.aggregate_results(metrics)
    with open(output_file, "w") as f:
        json.dump({"overall": acc, "results": metrics, "errors": errors},
                  f, indent=2, default=str)
    print(f"VideoMMMU done in {time.time() - t0:.1f}s -> {output_file}; overall {acc}")
    return acc


def _run_item(model, vp, txt, img, doc, *, N, vote, think_mode):
    from .mcq_harness import evaluate_mcq_item as _mcq

    if doc.get("question_type") == "multiple-choice":
        n_options = len(doc["options"])
        choices = [chr(ord("A") + j) for j in range(n_options)]
        question = doc["question"] + "\n" + D.parse_options(doc["options"])
        out = _mcq(
            model, vp, txt, img, doc,
            N=N, vote=vote, think_mode=think_mode,
            choices=choices, question_for_scorer=question,
        )
        return out["pred"]
    outputs, _, _, _ = model([vp], [txt], query_image=[img])
    return outputs[0]
