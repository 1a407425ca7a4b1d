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
BENCH_DECODE_TOKENS, BENCH_VIDEOS, BENCH_VIDEO, O3V_ATTN_IMPL=xla to
disable the Pallas kernel.

``vs_baseline`` compares against a same-chip NAIVE configuration — bf16
weights + XLA attention + one request at a time, i.e. what a straight
HF-transformers port would run (that configuration cannot even hold the
full 28-layer model in 16 GB HBM, so it was measured at 14 layers and
videos/s scaled by layer count; re-measure with BENCH_MEASURE_BASELINE=1
BENCH_QUANT=0 O3V_ATTN_IMPL=xla BENCH_TEXT_LAYERS=14).
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
N_VIDEOS = int(os.environ.get("BENCH_VIDEOS", "8"))
VIDEO = os.environ.get(
    "BENCH_VIDEO", "/root/reference/eval/example_video.mp4"
)
MEASURE_BASELINE = os.environ.get("BENCH_MEASURE_BASELINE", "0") == "1"

# Same-chip naive-configuration yardstick (see module docstring): measured
# 2026-08-16 on 1x v5e via the tunnel with BENCH_QUANT=0 O3V_ATTN_IMPL=xla
# BENCH_TEXT_LAYERS=14, single request: 4.061 s/video (0.43 s host + 3.63 s
# compute). Scaled to 28 layers (compute x2 + host): 7.69 s/video = 0.130
# videos/s — generous to the baseline, since 28L bf16 does not even fit in
# one chip's 16 GB HBM. Override with BENCH_BASELINE_VIDEOS_PER_SEC.
HF_BASELINE_VIDEOS_PER_SEC = float(
    os.environ.get("BENCH_BASELINE_VIDEOS_PER_SEC", "0.130") or "0"
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

    # ---- timed runs: single-request e2e
    runs = []
    decode_counts = []
    for _ in range(min(N_VIDEOS, 4)):
        t1 = time.time()
        frames_u8, _ = fetch_video_fast({"video": VIDEO, "nframes": 16})
        out = engine.generate(
            [Request(input_ids=prompt, frames=frames_u8, grid_thw=grid_thw,
                     vision_token_id=cfg.image_token_id)],
            sampling,
        )
        runs.append(time.time() - t1)
        decode_counts.append(len(out[0]["token_ids"]))
    e2e_single = float(np.mean(runs))

    if MEASURE_BASELINE:
        # Baseline re-measurement mode (see module docstring): report the
        # single-request e2e of whatever configuration the env knobs set up
        # (BENCH_QUANT=0 O3V_ATTN_IMPL=xla BENCH_TEXT_LAYERS=14 = the naive
        # same-chip configuration) and stop — no batched/prefix/decode
        # stages, which the naive yardstick does not have.
        print(json.dumps({
            "metric": "naive_baseline_videos_per_sec",
            "value": round(1.0 / e2e_single, 4),
            "unit": (
                f"videos/s single request ({TEXT_LAYERS}L"
                f"{', int8' if QUANT else ', bf16'}, "
                f"attn={os.environ.get('O3V_ATTN_IMPL', 'auto')})"
            ),
            "vs_baseline": 1.0,
            "detail": {
                "e2e_sec_per_video_single": round(e2e_single, 3),
                "compile_sec": round(t_compile, 1),
                "backend": jax.default_backend(),
            },
        }))
        return

    # ---- batched e2e: N_VIDEOS requests through the continuous engine at
    # once (the eval-harness shape: vstar item_batch x 5 queries); each
    # request gets its own decoded video (distinct frame arrays).
    def batched_run():
        # Host decode overlaps across videos (the C++ decoder releases the
        # GIL), mirroring the eval harness's threaded item preparation.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(4, N_VIDEOS)) as pool:
            frame_sets = list(pool.map(
                lambda _: fetch_video_fast({"video": VIDEO, "nframes": 16})[0],
                range(N_VIDEOS),
            ))
        reqs = [
            Request(input_ids=prompt, frames=f, grid_thw=grid_thw,
                    vision_token_id=cfg.image_token_id)
            for f in frame_sets
        ]
        engine.generate(reqs, sampling)

    batched_run()  # warmup (compile the n-row admission program)
    engine.timer.reset()
    t_b = time.time()
    batched_run()
    t_batched = time.time() - t_b
    stage_report = engine.timer.report()
    # Each (slots, length) configuration keeps a persistent arena; drop them
    # between phases — weights + three arena shapes + a prefix block do not
    # fit 16 GB together.
    engine.release_memory()

    # ---- V-STAR item shape: 5 queries over ONE video (eval/vstar.py runs
    # them as one batch). With automatic prefix caching the ~2k-token vision
    # prefix prefills ONCE; the plain comparison shares the same vision
    # arrays (tower still encodes once) and only disables prefix detection,
    # so the delta is purely the decoder prefill saved.
    def five_query_run():
        reqs = [
            Request(
                input_ids=prompt[:-20] + list(range(300 + 17 * q, 320 + 17 * q)),
                frames=frames_u8,
                grid_thw=grid_thw,
                vision_token_id=cfg.image_token_id,
            )
            for q in range(5)
        ]
        t0_ = time.time()
        engine.generate(reqs, sampling)
        return time.time() - t0_

    engine.clear_prefix_cache()
    five_query_run()  # warmup: prefix-prefill + suffix-admission programs
    engine.clear_prefix_cache()
    t_5q_cached = five_query_run()
    engine.release_memory()
    engine.prefix_cache_min = 0  # plain path on identical requests
    five_query_run()  # warmup the 5-row plain admission
    t_5q_plain = five_query_run()
    engine.prefix_cache_min = 256
    engine.release_memory()

    # decode-only throughput: bs=1 / 4 / 8 / 16. Decode is weight-HBM-bound,
    # so tok/s scales near-linearly with rows until KV traffic catches up.
    engine_txt = InferenceEngine(params, cfg, prompt_buckets=(128,), max_slots=16)

    def decode_tok_s(bs):
        batch = [Request(input_ids=list(range(100 + i, 164 + i))) for i in range(bs)]
        engine_txt.generate(batch, sampling)  # warmup program
        t = time.time()
        outs = engine_txt.generate(batch, sampling)
        return sum(len(o["token_ids"]) for o in outs) / (time.time() - t)

    tok_s = decode_tok_s(1)
    tok_s4 = decode_tok_s(4)
    tok_s8 = decode_tok_s(8)
    tok_s16 = decode_tok_s(16)

    videos_per_sec = N_VIDEOS / t_batched
    baseline = HF_BASELINE_VIDEOS_PER_SEC
    result = {
        "metric": "e2e_videos_per_sec_per_chip",
        "value": round(videos_per_sec, 4),
        "unit": (
            f"videos/s batched x{N_VIDEOS} (16f->{int(np.mean(decode_counts))}tok, "
            f"{TEXT_LAYERS}L@7Bdims, {n_params/1e9:.2f}B params{', int8' if QUANT else ''})"
        ),
        "vs_baseline": round(videos_per_sec / baseline, 2) if baseline > 0 else 0.0,
        "detail": {
            "e2e_sec_per_video_single": round(e2e_single, 3),
            "e2e_videos_per_sec_single": round(1.0 / e2e_single, 4),
            "e2e_sec_total_batched": round(t_batched, 3),
            "host_pipeline_sec": round(t_host, 3),
            "decode_tok_per_sec_bs1": round(tok_s, 2),
            "decode_tok_per_sec_bs4": round(tok_s4, 2),
            "decode_tok_per_sec_bs8": round(tok_s8, 2),
            "decode_tok_per_sec_bs16": round(tok_s16, 2),
            "vstar5q_sec_prefix_cached": round(t_5q_cached, 3),
            "vstar5q_sec_plain": round(t_5q_plain, 3),
            "vstar5q_prefix_cache_speedup": round(t_5q_plain / t_5q_cached, 2),
            "engine_stages_batched": stage_report,
            "baseline_videos_per_sec": baseline,
            "compile_sec": round(t_compile, 1),
            "prompt_tokens": len(prompt),
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
