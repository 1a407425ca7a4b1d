"""WorldSense evaluation harness (reference: eval/test/test_worldsense.py).

Same N-path voting core as VideoMME; results are scored with the WorldSense
MCQ parser (random fallback) and aggregated into the duration/domain rating
table.
"""

from __future__ import annotations

import time
from typing import Optional

from .dataloaders import worldsense as D
from .mcq_harness import evaluate_mcq_item


def evaluate(
    model,
    data_dir: str,
    output_prefix: str,
    *,
    asr_dir: Optional[str] = None,
    add_asr: bool = True,
    N: int = 1,
    vote: str = "majority_voting",
    think_mode: bool = True,
    limit: Optional[int] = None,
):
    t0 = time.time()
    bench = D.WorldSenseBench(data_dir, add_asr=add_asr, asr_dir=asr_dir, think_mode=think_mode)
    video_paths, image_input, text_input, docs = bench.get_data()
    if limit:
        video_paths, image_input, text_input, docs = (
            video_paths[:limit], image_input[:limit], text_input[:limit], docs[:limit]
        )

    records = []
    errors = []
    for i, (vp, img, txt, doc) in enumerate(zip(video_paths, image_input, text_input, docs)):
        candidates = doc["candidates"]
        if isinstance(candidates, str):
            candidates = eval(candidates)
        question = doc["question"] + "\n" + "\n".join(candidates)
        try:
            out = evaluate_mcq_item(
                model, vp, txt, img, doc,
                N=N, vote=vote, think_mode=think_mode, question_for_scorer=question,
            )
        except Exception as e:
            # skip-and-record instead of fleet-kill (test_videomme.py:329-335)
            print(f"[warn] item {doc.get('index')} failed ({e!r}); skipping")
            errors.append({"index": doc.get("index"), "video": doc.get("video"),
                           "error": repr(e)})
            continue
        rec = dict(doc)
        rec["prediction"] = out["pred"]
        rec["reasoning_process"] = out["think"]
        records.append(rec)
        print(doc["video"], "GT:", doc["answer"], "Pred:", out["pred"], f"{i + 1}/{len(docs)}")

    rating = D.process_result(records, output_prefix)
    if errors:
        # Same recorded-errors contract as the other harnesses: a run with
        # failures must be distinguishable from a clean run over fewer items.
        import json as _json

        with open(f"{output_prefix}_errors.json", "w") as f:
            _json.dump(errors, f, indent=1)
        rating["errors"] = errors
    print(f"WorldSense done in {time.time() - t0:.1f}s; overall {rating['overall']['overall']}")
    return rating
