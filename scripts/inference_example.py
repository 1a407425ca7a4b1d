"""Single-example grounded video QA — the public API contract
(reference: eval/inference_example.py).

Run: python scripts/inference_example.py --model_path /path/to/checkpoint \
        [--video example_video.mp4] [--tiny-demo]

Sampling mirrors the reference: temperature 0.7, top_p 0.001, repetition
penalty 1.05, max 2048 tokens, 16 frames, 81920-token context.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", default=None, help="HF checkpoint dir")
    parser.add_argument("--video", default="/root/reference/eval/example_video.mp4")
    parser.add_argument("--nframes", type=int, default=16)
    parser.add_argument("--max_tokens", type=int, default=2048)
    parser.add_argument(
        "--kv_cache", choices=["bf16", "fp8"], default="bf16",
        help="KV arena dtype; fp8 halves KV HBM (lets the full 81920-token "
        "context fit one 16 GB chip next to int8 weights)",
    )
    parser.add_argument(
        "--tiny-demo", action="store_true",
        help="run with a tiny random-weight model (pipeline smoke test, no checkpoint needed)",
    )
    parser.add_argument(
        "--greedy", action="store_true",
        help="temperature 0 (enables prompt-lookup speculative decoding "
        "when --spec is on)",
    )
    parser.add_argument(
        "--spec", action="store_true",
        help="prompt-lookup speculative decoding for single-request greedy "
        "runs — same sampling rule in fewer decode steps (exact-arithmetic "
        "lossless; bf16 argmax near-ties may resolve differently)",
    )
    parser.add_argument("--questions", nargs="+", default=[
        "What is the color of the bowling ball?",
        "What is the first scene about?",
    ])
    args = parser.parse_args()

    from open_o3_video_tpu.data.processor import O3VideoProcessor
    from open_o3_video_tpu.data.video import process_vision_info
    from open_o3_video_tpu.engine import InferenceEngine, Request, SamplingParams
    from open_o3_video_tpu.grounding.prompts import SYSTEM_PROMPT, VISION_PLACEHOLDER
    from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, params as P

    if args.tiny_demo:
        import dataclasses

        import jax.numpy as jnp

        cfg = Qwen25VLConfig.tiny()
        cfg = dataclasses.replace(
            cfg, image_token_id=151655, video_token_id=151656,
            vision_start_token_id=151652, vision_end_token_id=151653,
            eos_token_id=151645, pad_token_id=151643,
            text=dataclasses.replace(cfg.text, vocab_size=152064),
        )
        params = P.init(cfg, seed=0)
        processor = O3VideoProcessor()
        max_tokens = min(args.max_tokens, 32)
    else:
        if not args.model_path:
            parser.error("--model_path required (or use --tiny-demo)")
        params, cfg = P.load_pretrained(args.model_path)
        processor = O3VideoProcessor.from_pretrained(args.model_path)
        max_tokens = args.max_tokens

    import jax.numpy as _jnp

    cache_dtype = _jnp.float8_e4m3fn if args.kv_cache == "fp8" else _jnp.bfloat16
    engine = InferenceEngine(params, cfg, cache_dtype=cache_dtype,
                             spec_decode=args.spec)
    # Reference sampling (eval/inference_example.py:23-29): temperature 0.7
    # with top_p 0.001 — effectively greedy; --greedy makes that exact
    # (temperature 0), which is what the speculative path requires.
    sampling = SamplingParams(
        temperature=0.0 if args.greedy else 0.7, top_p=0.001,
        repetition_penalty=1.05, max_tokens=max_tokens,
    )

    system_message = SYSTEM_PROMPT["temporal-spatial free-form QA"]

    for question in args.questions:
        messages = [
            {"role": "system", "content": [{"type": "text", "text": system_message}]},
            {
                "role": "user",
                "content": [
                    {"type": "video", "video": args.video, "nframes": args.nframes},
                    {"type": "text", "text": question},
                ],
            },
        ]
        prompt = processor.apply_chat_template(messages, add_generation_prompt=True)
        _, video_inputs, video_kwargs = process_vision_info(messages, return_video_kwargs=True)

        frames = video_inputs[0]
        fps = video_kwargs["fps"][0]
        frame_prompt = ""
        for i in range(len(frames)):
            frame_prompt += (
                f"Frame {i + 1} at {round(i / fps, 1)} second: "
                "<|vision_start|><|image_pad|><|vision_end|>\n"
            )
        prompt = prompt.replace(VISION_PLACEHOLDER, frame_prompt)

        proc = processor(prompt, images=[frames[i] for i in range(len(frames))])
        out = engine.generate(
            [Request(input_ids=proc.input_ids, pixel_patches=proc.pixel_patches,
                     grid_thw=proc.grid_thw, vision_token_id=cfg.image_token_id)],
            sampling,
        )[0]
        text = processor.decode(out["token_ids"], skip_special_tokens=True)
        if args.tiny_demo:
            # random weights emit unprintable ids; show the envelope so the
            # smoke run has visible evidence of the full pipeline
            print(f"[tiny-demo: {len(out['token_ids'])} tokens generated, "
                  f"{out['num_prompt_tokens']}-token prompt] {text}")
        else:
            print(text)


if __name__ == "__main__":
    main()
