"""GSPO RL entry point (reference contract: grpo.py + run_grpo_video.sh flags).

Usage:
  python -m open_o3_video_tpu.train.grpo_main \
      --model_name_or_path ./checkpoints/sft \
      --dataset_name /path/STGR-RL-36k.json \
      --data_root /path/data \
      --output_dir ./checkpoints/gspo \
      --max_prompt_length 16384 --max_completion_length 768 \
      --num_generations 4 --beta 0.04 --max_grad_norm 5
"""

from __future__ import annotations

import argparse
import os


def parse_args():
    p = argparse.ArgumentParser(description="GSPO RL training")
    p.add_argument("--model_name_or_path", required=True)
    p.add_argument("--dataset_name", required=True, help="STGR-RL json/jsonl")
    p.add_argument("--data_root", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument(
        "--reward_funcs",
        nargs="+",
        default=["ans_acc", "ans_tiou", "ans_viou", "thk_temporal_point",
                 "thk_temporal_segment", "thk_spatial", "format"],
    )
    p.add_argument("--max_prompt_length", type=int, default=16384)
    p.add_argument("--max_completion_length", type=int, default=768)
    p.add_argument("--num_generations", type=int, default=4)
    p.add_argument("--beta", type=float, default=0.04)
    p.add_argument("--learning_rate", type=float, default=1e-6)
    p.add_argument("--max_grad_norm", type=float, default=5.0)
    p.add_argument("--max_steps", type=int, default=-1)
    p.add_argument("--num_train_epochs", type=float, default=1.0)
    p.add_argument("--save_steps", type=int, default=500)
    p.add_argument("--logging_steps", type=int, default=1)
    p.add_argument("--max_pixels", type=int, default=12845056)
    p.add_argument("--min_pixels", type=int, default=3136)
    # Parse-only BY REFERENCE PARITY: the reference accepts these flags
    # (grpo.py:41-48) but every consumer in its trainer is commented out
    # (grpo_trainer.py:305, :315, :660) — they gate nothing there either.
    p.add_argument("--temporal", type=bool, default=True)
    p.add_argument("--len_control", type=bool, default=True)
    p.add_argument("--gspo", type=lambda s: s.lower() != "false", default=True)
    p.add_argument("--nframes", type=int, default=None)
    p.add_argument("--mesh_data", type=int, default=1)
    p.add_argument("--mesh_fsdp", type=int, default=-1)
    p.add_argument("--mesh_tensor", type=int, default=1)
    # Multi-host bootstrap (SURVEY §5.8); see sft_main for the flag contract.
    p.add_argument("--coordinator_address", default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    # PEFT / LoRA (reference: peft_config via TRL --use_peft flags, grpo.py:98)
    p.add_argument("--use_peft", action="store_true")
    p.add_argument("--lora_r", type=int, default=16)
    p.add_argument("--lora_alpha", type=float, default=32.0)
    p.add_argument("--lora_target_modules", default="q_proj,v_proj",
                   help="comma-separated (HF names like q_proj or leaf names like q_w)")
    p.add_argument("--resume_from_checkpoint", default=None)
    p.add_argument("--report_to", default="none")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args()


def main():
    args = parse_args()
    os.environ.setdefault("WANDB_MODE", "offline")
    os.environ.setdefault("DECORD_EOF_RETRY_MAX", "20480")

    from ..parallel import distributed as D

    D.initialize(args.coordinator_address, args.num_processes, args.process_id)

    import jax

    # Multi-host GSPO runs in SPMD lockstep: every host iterates the SAME
    # dataset cursor, prepares the SAME B prompts, and drives the engine
    # with replicated global arrays, so all hosts execute identical jitted
    # programs (the engine's _spmd mode); the update still shards over the
    # hybrid mesh's data axis. Rollout host work is duplicated per host —
    # the per-host-sharded-rollout optimization is future work.

    from ..data.processor import O3VideoProcessor
    from ..data.rl_dataset import load_rl_dataset, prepare_rl_sample
    from ..grounding.rewards import REWARD_REGISTRY
    from ..models.qwen25vl import params as P
    from ..utils.metrics import MetricsBus
    from . import checkpoint as CKPT
    from .gspo import GSPOConfig, GSPOTrainer

    params, model_cfg = P.load_pretrained(args.model_name_or_path)
    if args.use_peft:
        # PEFT path: the reference model is the frozen base with adapters
        # disabled (grpo_trainer.py:244-248) — no second copy exists, so
        # don't read the checkpoint twice.
        ref_params = params
    else:
        # Frozen reference model: a second full copy, matching the
        # reference's ZeRO-3 ref-model instantiation (grpo_trainer.py:234-243).
        ref_params, _ = P.load_pretrained(args.model_name_or_path)
    processor = O3VideoProcessor.from_pretrained(args.model_name_or_path)

    dataset = load_rl_dataset(args.dataset_name)
    if not dataset:
        raise ValueError(
            "RL dataset is empty after the reference's multiple-of-4 train "
            "truncation (data_loader.py:53-54) — provide >= 4 examples"
        )
    # total_steps set after the mesh exists: each step consumes one prompt
    # PER DATA REPLICA (TRL divides dataloader length by world size the
    # same way), so epochs = dataset passes, not dataset-size steps.

    reward_funcs = [REWARD_REGISTRY[name] for name in args.reward_funcs]
    cfg = GSPOConfig(
        num_generations=args.num_generations,
        max_prompt_length=args.max_prompt_length,
        max_completion_length=args.max_completion_length,
        beta=args.beta,
        learning_rate=args.learning_rate,
        max_grad_norm=args.max_grad_norm,
        gspo=args.gspo,
        logging_steps=args.logging_steps,
    )

    mesh = None
    if args.mesh_data == 1 and args.mesh_fsdp == 1 and args.mesh_tensor == 1:
        pass  # explicit 1x1x1 = run unsharded even on a multi-device host
    elif len(jax.devices()) > 1 or args.mesh_tensor > 1 or args.mesh_fsdp > 1:
        mesh = D.make_hybrid_mesh(
            data=args.mesh_data, fsdp=args.mesh_fsdp, tensor=args.mesh_tensor
        )

    metrics = MetricsBus(use_wandb=args.report_to == "wandb", primary=D.is_primary())
    lora_cfg = None
    if args.use_peft:
        from .lora import LoraConfig

        lora_cfg = LoraConfig(
            rank=args.lora_r,
            alpha=args.lora_alpha,
            target_modules=LoraConfig.normalize_targets(
                args.lora_target_modules.split(",")
            ),
            seed=args.seed,
        )
    trainer = GSPOTrainer(
        params, ref_params, model_cfg, cfg,
        detokenize=lambda ids: processor.decode(ids, skip_special_tokens=True),
        reward_funcs=reward_funcs,
        mesh=mesh,
        metrics=metrics,
        seed=args.seed,
        lora=lora_cfg,
    )

    import numpy as np

    def ckpt_state(step):
        # The rollout sampler draws seed+global_step per step, so capturing
        # (seed, step) makes resumed rollouts reproduce the original stream.
        # LoRA runs checkpoint the small adapter tree, not the frozen base.
        weights = trainer.adapters if trainer.adapters is not None else trainer.params
        return {"params": weights, "opt_state": trainer.opt_state,
                "meta": {"step": np.asarray(step, np.int64),
                         "seed": np.asarray(trainer.seed, np.int64)}}

    start_step = 0
    if args.resume_from_checkpoint:
        target = ckpt_state(0)
        state, start_step = CKPT.restore_checkpoint(args.resume_from_checkpoint, target=target)
        if trainer.adapters is not None:
            trainer.adapters = state["params"]
        else:
            trainer.params = state["params"]
        trainer.opt_state = state["opt_state"]
        trainer.seed = int(state["meta"]["seed"])
        print(f"Resumed from step {start_step} (sampler seed {trainer.seed})")

    # One prompt per data replica per step (reference: 1 prompt/GPU x 8,
    # run_grpo_video.sh:11); prompts = B, sequences = B x num_generations.
    n_prompts = mesh.shape["data"] if mesh is not None else 1
    total_steps = (
        args.max_steps if args.max_steps > 0
        else -(-int(len(dataset) * args.num_train_epochs) // n_prompts)
    )

    step = start_step
    cursor = start_step * n_prompts
    last_good_sample = None
    n_degraded = 0
    while step < total_steps:
        batch_samples = []
        for _ in range(n_prompts):
            example = dataset[cursor % len(dataset)]
            cursor += 1
            try:
                sample = prepare_rl_sample(
                    example, processor, args.data_root, nframes=args.nframes
                )
                last_good_sample = sample
            except Exception as e:
                # Degraded recompute (reference "using fixed data",
                # grpo_trainer.py:452-465): substitute the last good sample
                # rather than killing the run.
                n_degraded += 1
                print(f"[warn] sample prep failed at step {step} ({e!r}); using fixed data")
                if last_good_sample is None:
                    continue
                sample = last_good_sample
            batch_samples.append(sample)
        if not batch_samples:
            step += 1
            continue
        while len(batch_samples) < n_prompts:  # keep B == data-axis size
            batch_samples.append(batch_samples[0])
        trainer.step_batch(batch_samples, global_step=step, max_steps=total_steps)
        step += 1
        if step % cfg.logging_steps == 0:
            metrics.flush(step)
        if step % args.save_steps == 0:
            CKPT.save_checkpoint(args.output_dir, step, ckpt_state(step), async_save=True)

    CKPT.wait_for_saves()
    CKPT.save_checkpoint(args.output_dir, step, ckpt_state(step))
    if trainer.adapters is not None:
        from .lora import merge_adapters

        # PEFT merge_and_unload equivalent: export base + folded deltas.
        merged = merge_adapters(trainer.params, trainer.adapters, lora_cfg.scale)
        CKPT.export_safetensors(merged, model_cfg, args.output_dir)
    else:
        CKPT.export_safetensors(trainer.params, model_cfg, args.output_dir)
    CKPT.write_model_card(
        args.output_dir, trainer_name="GSPO",
        base_model=args.model_name_or_path,
        dataset_name=getattr(args, "dataset_name", None),
    )
    print(f"GSPO complete: {step} steps -> {args.output_dir}")


if __name__ == "__main__":
    main()
