"""On-chip A/B of the w8a8 serving path (ops/quant.py a8_acts).

Builds the bench geometry (28L 7B dims int8 text + int8 ViT blocks), runs
the same batched 8-video admission+decode through two engines — a8_prefill
off vs on — and reports per-stage times plus greedy-token agreement.

Timing note: through the tunneled TPU, block_until_ready returns early;
engine stage timers already force readbacks, so their numbers are real.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp

from open_o3_video_tpu.data.video import fetch_video_fast
from open_o3_video_tpu.engine import InferenceEngine, Request, SamplingParams
from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, params as P

TEXT_LAYERS = int(os.environ.get("BENCH_TEXT_LAYERS", "28"))
VISION_LAYERS = int(os.environ.get("BENCH_VISION_LAYERS", "32"))
N_VIDEOS = int(os.environ.get("BENCH_VIDEOS", "8"))
DECODE_TOKENS = int(os.environ.get("BENCH_DECODE_TOKENS", "32"))
VIDEO = os.environ.get(
    "BENCH_VIDEO", "/root/reference/eval/example_video.mp4"
)


def main():
    cfg = Qwen25VLConfig()
    cfg = dataclasses.replace(
        cfg,
        vision=dataclasses.replace(
            cfg.vision,
            depth=VISION_LAYERS,
            fullatt_block_indexes=tuple(
                i for i in cfg.vision.fullatt_block_indexes if i < VISION_LAYERS
            ) or (VISION_LAYERS - 1,),
        ),
        text=dataclasses.replace(cfg.text, num_hidden_layers=TEXT_LAYERS),
        dtype=jnp.bfloat16,
    )
    params = P.init(cfg, seed=0, quantize_text=True, quantize_vision=True)

    frames_u8, _ = fetch_video_fast({"video": VIDEO, "nframes": 16})
    T, _, H, W = frames_u8.shape
    grid_thw = np.tile(
        np.array([[1, H // cfg.vision.patch_size, W // cfg.vision.patch_size]], np.int64),
        (T, 1),
    )
    n_tok = int(grid_thw.prod(axis=1).sum()) // cfg.vision.merge_unit
    prompt = (
        list(range(200, 240))
        + [cfg.vision_start_token_id]
        + [cfg.image_token_id] * n_tok
        + [cfg.vision_end_token_id]
        + list(range(300, 320))
    )
    bucket = 1 << (len(prompt) - 1).bit_length()
    sampling = SamplingParams(
        temperature=0.0, repetition_penalty=1.05, max_tokens=DECODE_TOKENS
    )

    # Watermark copies so the engine's content-keyed prefix cache sees N
    # distinct videos (bench.py does the same).
    videos = []
    for i in range(N_VIDEOS):
        f = frames_u8.copy()
        f[:, :, 0, 0] = i
        videos.append(f)

    def reqs():
        return [
            Request(
                input_ids=list(prompt),
                frames=v,
                grid_thw=grid_thw,
                vision_token_id=cfg.image_token_id,
            )
            for v in videos
        ]

    results = {}
    for mode in ("w8", "a8"):
        eng = InferenceEngine(
            params, cfg, prompt_buckets=(bucket,), a8_prefill=(mode == "a8")
        )
        t0 = time.time()
        eng.generate(reqs(), sampling)  # compile + warm
        compile_s = time.time() - t0
        eng.timer.reset()
        t0 = time.time()
        out = eng.generate(reqs(), sampling)
        e2e = time.time() - t0
        stages = eng.timer.report()
        results[mode] = {
            "tokens": [o["token_ids"] for o in out],
            "e2e_s": round(e2e, 3),
            "compile_s": round(compile_s, 1),
            "stages_ms": {
                k: round(v["total_s"] * 1e3, 1) for k, v in stages.items()
            },
        }
        eng.release_memory()
        del eng

    agree = [
        sum(a == b for a, b in zip(ta, tb)) / max(len(ta), 1)
        for ta, tb in zip(results["w8"]["tokens"], results["a8"]["tokens"])
    ]
    print(json.dumps({
        "w8": {k: v for k, v in results["w8"].items() if k != "tokens"},
        "a8": {k: v for k, v in results["a8"].items() if k != "tokens"},
        "greedy_agreement_per_row": [round(a, 3) for a in agree],
    }, indent=2))


if __name__ == "__main__":
    main()
