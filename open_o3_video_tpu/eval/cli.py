"""Unified evaluation CLI (replaces the reference's per-benchmark test_*.py
entry points + eval_all.sh plumbing).

  python -m open_o3_video_tpu.eval.cli vstar --model_path ... --anno ... --video_folder ...
  python -m open_o3_video_tpu.eval.cli vstar-judge --result_file ... --model_path <judge>
  python -m open_o3_video_tpu.eval.cli videomme|worldsense|videommmu --model_path ... --data_dir ...
  python -m open_o3_video_tpu.eval.cli tvgbench --model_path ... --anno ... --video_folder ...
"""

from __future__ import annotations

import argparse
import os

import yaml

DEFAULT_CONFIGS = {
    # reference: eval/config/*.yaml
    "vstar": {"temperature": 0.0, "max_tokens": 2048, "video_max_pixels": 2097152, "video_max_frames": 16},
    "tvgbench": {"temperature": 0.0, "max_tokens": 2048, "video_max_pixels": 2097152, "video_max_frames": 16},
    "videomme": {"temperature": 0.0, "max_tokens": 8192, "video_max_pixels": 262144, "video_max_frames": 64},
    "worldsense": {"temperature": 0.0, "max_tokens": 8192, "video_max_pixels": 262144, "video_max_frames": 64},
    "videommmu": {"temperature": 0.0, "max_tokens": 8192, "video_max_pixels": 262144, "video_max_frames": 64},
}


def load_model_kwargs(args, bench: str) -> dict:
    kwargs = dict(DEFAULT_CONFIGS[bench])
    if args.config and os.path.exists(args.config):
        with open(args.config) as f:
            kwargs.update(yaml.safe_load(f))
    return kwargs


def build_model(args, bench: str):
    from .model_engine import QwenVLEngine

    kwargs = load_model_kwargs(args, bench)
    if args.load_in_int8:
        kwargs["load_in_int8"] = True
    if args.load_in_int4:
        kwargs["load_in_int4"] = True
    mesh = None
    if args.mesh_tensor > 1 or args.mesh_data > 1:
        from ..parallel import make_mesh

        mesh = make_mesh(data=args.mesh_data, tensor=args.mesh_tensor)
        if args.mesh_data > 1:
            # DP eval fleet: slot rows sharded over `data` — each chip
            # decodes its own wave rows (== the reference's per-GPU workers).
            kwargs["batch_axis"] = "data"
            kwargs["max_slots"] = args.mesh_data * args.slots_per_chip
    return QwenVLEngine(args.model_path, rt_shape=True, mesh=mesh, **kwargs)


def main():
    parser = argparse.ArgumentParser(description="Benchmark evaluation")
    parser.add_argument("benchmark", choices=["vstar", "vstar-judge", "videomme", "worldsense", "videommmu", "tvgbench"])
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--config", default=None, help="yaml overriding model kwargs")
    parser.add_argument("--anno", default=None, help="V-STAR annotation json")
    parser.add_argument("--video_folder", default=None)
    parser.add_argument("--data_dir", default=None)
    parser.add_argument("--asr_dir", default=None)
    parser.add_argument("--output", default=None)
    parser.add_argument("--result_file", default=None, help="for vstar-judge")
    parser.add_argument(
        "--load_in_int8", action="store_true",
        help="stream decoder weights to int8 on load (full 7B on one 16 GB chip)",
    )
    parser.add_argument(
        "--load_in_int4", action="store_true",
        help="pack decoder weights to int4 on load (ops/int4.py; memory "
             "knob — 72B judge at ~36 GB — NOT a decode-speed win on v5e)",
    )
    parser.add_argument("--N", type=int, default=1)
    parser.add_argument("--vote", default="majority_voting",
                        choices=["majority_voting", "confidence_voting"])
    parser.add_argument("--think_mode", type=lambda s: s.lower() != "false", default=True)
    parser.add_argument("--add_asr", type=lambda s: s.lower() != "false", default=None)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--mesh_tensor", type=int, default=1)
    parser.add_argument(
        "--mesh_data", type=int, default=1,
        help="DP eval fleet width: shard engine decode slots over this many "
        "chips (reference: one eval worker per GPU)",
    )
    parser.add_argument("--slots_per_chip", type=int, default=8)
    parser.add_argument(
        "--item_batch", type=int, default=4,
        help="items evaluated concurrently through the engine (each engine "
        "batch is item_batch x N requests) — the in-process replacement for "
        "the reference's per-GPU eval worker fleet",
    )
    args = parser.parse_args()

    if args.benchmark == "vstar":
        from . import vstar

        model = build_model(args, "vstar")
        vstar.evaluate(
            args.anno, args.video_folder, model,
            args.output or "vstar_results.json",
            think_mode=args.think_mode, limit=args.limit,
            item_batch=args.item_batch,
        )
    elif args.benchmark == "vstar-judge":
        from .judge import EngineJudge, evaluate_json

        mesh = None
        if args.mesh_tensor > 1:
            from ..parallel import make_mesh

            mesh = make_mesh(tensor=args.mesh_tensor)
        # --load_in_int8: a 72B judge at int8 (~72 GB sharded) fits v5e-8
        # where bf16 (144 GB) cannot (reference judges on 4 A100s,
        # eval_vstar.py:20-24).
        judge = EngineJudge(args.model_path, mesh=mesh,
                            load_in_int8=args.load_in_int8,
                            load_in_int4=args.load_in_int4)
        evaluate_json(args.result_file, judge)
    elif args.benchmark == "videomme":
        from . import videomme

        model = build_model(args, "videomme")
        videomme.evaluate(
            model, args.data_dir, args.output or "videomme_results.json",
            N=args.N, vote=args.vote, think_mode=args.think_mode,
            add_asr=bool(args.add_asr), asr_dir=args.asr_dir, limit=args.limit,
            item_batch=args.item_batch,
        )
    elif args.benchmark == "worldsense":
        from . import worldsense

        model = build_model(args, "worldsense")
        worldsense.evaluate(
            model, args.data_dir, args.output or "worldsense",
            asr_dir=args.asr_dir, add_asr=args.add_asr if args.add_asr is not None else True,
            N=args.N, vote=args.vote, think_mode=args.think_mode, limit=args.limit,
            item_batch=args.item_batch,
        )
    elif args.benchmark == "tvgbench":
        from . import tvgbench

        model = build_model(args, "tvgbench")
        tvgbench.evaluate(
            args.anno, args.video_folder, model,
            args.output or "tvgbench_results.json",
            think_mode=args.think_mode, limit=args.limit,
            item_batch=args.item_batch,
        )
    elif args.benchmark == "videommmu":
        from . import videommmu

        model = build_model(args, "videommmu")
        videommmu.evaluate(
            model, args.data_dir, args.output or "videommmu_results.json",
            N=args.N, vote=args.vote, think_mode=args.think_mode, limit=args.limit,
            item_batch=args.item_batch,
        )


if __name__ == "__main__":
    main()
