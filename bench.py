"""End-to-end benchmark on real TPU hardware.

Measures the reference pipeline's operational envelope (BASELINE.md): a real
video decoded, sampled to 16 frames, smart-resized under the training pixel
budget, patchified, prefilled through the Qwen2.5-VL vision tower + decoder,
and decoded for 128 tokens — i.e. frames -> grounded answer.

Model: the FULL Qwen2.5-VL-7B architecture (28 decoder layers, 32 ViT
blocks, 3584 hidden, GQA 28/4) with int8 weight-only quantization of the
decoder matmuls (ops/quant.py) so the model + KV cache fit a single v5e
chip's 16 GB HBM — and decode HBM traffic halves. Attention runs the Pallas
flash kernel (ops/flash_attention.py). Prints ONE JSON line.

Env knobs: BENCH_TEXT_LAYERS, BENCH_QUANT=0 to disable int8,
BENCH_DECODE_TOKENS, BENCH_VIDEOS, BENCH_VIDEO.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

TEXT_LAYERS = int(os.environ.get("BENCH_TEXT_LAYERS", "28"))
VISION_LAYERS = int(os.environ.get("BENCH_VISION_LAYERS", "32"))
QUANT = os.environ.get("BENCH_QUANT", "1") != "0"
DECODE_TOKENS = int(os.environ.get("BENCH_DECODE_TOKENS", "128"))
N_VIDEOS = int(os.environ.get("BENCH_VIDEOS", "4"))
VIDEO = os.environ.get(
    "BENCH_VIDEO", "/root/reference/eval/example_video.mp4"
)


def main():
    import dataclasses

    import jax

    # Persistent compilation cache: the 28L engine compile is ~12 min cold
    # through the remote tunnel; warm runs skip it entirely.
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import jax.numpy as jnp

    from open_o3_video_tpu.data import fetch_video
    from open_o3_video_tpu.data.video import fetch_video_fast
    from open_o3_video_tpu.engine import InferenceEngine, Request, SamplingParams
    from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, params as P

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
    t0 = time.time()
    # quantize_text streams each layer to int8 at init so a full-size bf16
    # copy never exists on-chip (28L bf16 alone would OOM a 16 GB v5e).
    params = P.init(cfg, seed=0, quantize_text=QUANT)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    if QUANT:
        from open_o3_video_tpu.ops.quant import param_bytes

        print(f"int8 weights: {param_bytes(params) / 1e9:.2f} GB on-chip", file=sys.stderr)

    # ---- host pipeline: decode + sample + resize (training budget); frames
    # upload as uint8 and patchify on-device (8x less tunnel traffic).
    t_host0 = time.time()
    frames_u8, fps = fetch_video_fast({"video": VIDEO, "nframes": 16})
    T, _, H, W = frames_u8.shape
    grid_thw = np.tile(
        np.array([[1, H // cfg.vision.patch_size, W // cfg.vision.patch_size]], np.int64),
        (T, 1),
    )
    t_host = time.time() - t_host0

    n_tok = int(grid_thw.prod(axis=1).sum()) // cfg.vision.merge_unit
    prompt = (
        list(range(200, 240))
        + [cfg.vision_start_token_id]
        + [cfg.image_token_id] * n_tok
        + [cfg.vision_end_token_id]
        + list(range(300, 320))
    )
    req = Request(
        input_ids=prompt,
        frames=frames_u8,
        grid_thw=grid_thw,
        vision_token_id=cfg.image_token_id,
    )
    sampling = SamplingParams(temperature=0.0, repetition_penalty=1.05, max_tokens=DECODE_TOKENS)

    bucket = 1 << (len(prompt) - 1).bit_length()
    engine = InferenceEngine(params, cfg, prompt_buckets=(bucket,))

    # Warmup (compile prefill + decode loop).
    engine.generate([req], sampling)
    t_compile = time.time() - t0

    # ---- timed runs
    runs = []
    decode_counts = []
    for _ in range(N_VIDEOS):
        t1 = time.time()
        frames_u8, _ = fetch_video_fast({"video": VIDEO, "nframes": 16})
        out = engine.generate(
            [Request(input_ids=prompt, frames=frames_u8, grid_thw=grid_thw,
                     vision_token_id=cfg.image_token_id)],
            sampling,
        )
        runs.append(time.time() - t1)
        decode_counts.append(len(out[0]["token_ids"]))

    # decode-only throughput: bs=1 and bs=4 (the eval harness batches ~5)
    text_req = Request(input_ids=list(range(100, 164)))
    engine_txt = InferenceEngine(params, cfg, prompt_buckets=(128,))
    engine_txt.generate([text_req], sampling)  # warmup
    t2 = time.time()
    out_txt = engine_txt.generate([text_req], sampling)
    t_decode = time.time() - t2
    tok_s = len(out_txt[0]["token_ids"]) / t_decode

    batch4 = [Request(input_ids=list(range(100 + i, 164 + i))) for i in range(4)]
    engine_txt.generate(batch4, sampling)  # warmup bs=4 programs
    t3 = time.time()
    outs4 = engine_txt.generate(batch4, sampling)
    tok_s4 = sum(len(o["token_ids"]) for o in outs4) / (time.time() - t3)

    e2e = float(np.mean(runs))
    videos_per_sec = 1.0 / e2e
    result = {
        "metric": "e2e_videos_per_sec_per_chip",
        "value": round(videos_per_sec, 4),
        "unit": (
            f"videos/s (16f->{int(np.mean(decode_counts))}tok, {TEXT_LAYERS}L@7Bdims, "
            f"{n_params/1e9:.2f}B params{', int8' if QUANT else ''})"
        ),
        "vs_baseline": 0.0,
        "detail": {
            "e2e_sec_per_video": round(e2e, 3),
            "host_pipeline_sec": round(t_host, 3),
            "decode_tok_per_sec_bs1": round(tok_s, 2),
            "decode_tok_per_sec_bs4": round(tok_s4, 2),
            "compile_sec": round(t_compile, 1),
            "prompt_tokens": len(prompt),
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
