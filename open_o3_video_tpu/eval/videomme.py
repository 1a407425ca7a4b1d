"""VideoMME evaluation harness (reference: eval/test/test_videomme.py).

Per item: N reasoning paths with majority/confidence voting, parsed answers,
then duration/category aggregation. Runs in-process through the TPU engine.
"""

from __future__ import annotations

import json
import time
from typing import Any, Optional

from .dataloaders import videomme as D
from .mcq_harness import evaluate_mcq_item


def evaluate(
    model,
    data_dir: str,
    output_file: str,
    *,
    N: int = 1,
    vote: str = "majority_voting",
    think_mode: bool = True,
    add_asr: bool = False,
    asr_dir: Optional[str] = None,
    limit: Optional[int] = None,
) -> float:
    t0 = time.time()
    bench = D.VideoMMEBench(data_dir, add_asr=add_asr, asr_dir=asr_dir, think_mode=think_mode)
    video_paths, image_input, text_input, docs = bench.get_data()
    if limit:
        video_paths, image_input, text_input, docs = (
            video_paths[:limit], image_input[:limit], text_input[:limit], docs[:limit]
        )

    metrics: list[dict[str, Any]] = []
    errors: list[dict[str, Any]] = []
    for i, (vp, img, txt, doc) in enumerate(zip(video_paths, image_input, text_input, docs)):
        question = doc["question"] + "\n" + "\n".join(f"{opt}" for opt in doc["options"])
        try:
            out = evaluate_mcq_item(
                model, vp, txt, img, doc,
                N=N, vote=vote, think_mode=think_mode, question_for_scorer=question,
            )
        except Exception as e:
            # skip-and-record: one bad item no longer kills the run (the
            # reference terminates the whole fleet on first worker error,
            # test_videomme.py:329-335)
            print(f"[warn] item {doc.get('question_id')} failed ({e!r}); skipping")
            errors.append({"question_id": doc.get("question_id"), "error": repr(e)})
            continue
        print(doc["videoID"], "GT:", doc["answer"], "Pred:", out["pred"])
        metrics.append(D.process_results(doc, out["pred"], out["think"], out["frame_shape"]))
        print(f"{i + 1}/{len(docs)}")

    score = D.aggregate_results(metrics)
    with open(output_file, "w") as f:
        json.dump({"overall": score, "results": metrics, "errors": errors},
                  f, indent=2, default=str)
    print(f"VideoMME done in {time.time() - t0:.1f}s -> {output_file}; overall {score:.1f}%")
    return score
