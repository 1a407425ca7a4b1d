"""SFT entry point (reference contract: sft_multi_task.py __main__ +
run_sft_video.sh flags).

Usage:
  python -m open_o3_video_tpu.train.sft_main \
      --model_name_or_path /path/Qwen2.5-VL-7B-Instruct \
      --dataset_name /path/STGR-CoT-30k.json \
      --data_root /path/data \
      --output_dir ./checkpoints/sft \
      --learning_rate 1e-6 --num_train_epochs 1 --save_steps 500
"""

from __future__ import annotations

import argparse
import os


def parse_args():
    p = argparse.ArgumentParser(description="SFT cold-start training")
    p.add_argument("--model_name_or_path", required=True)
    p.add_argument("--dataset_name", required=True, help="STGR-CoT json/jsonl")
    p.add_argument("--data_root", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--learning_rate", type=float, default=1e-6)
    p.add_argument("--num_train_epochs", type=float, default=1.0)
    p.add_argument("--max_steps", type=int, default=-1)
    p.add_argument("--save_steps", type=int, default=500)
    p.add_argument("--logging_steps", type=int, default=1)
    _bool = lambda s: str(s).lower() not in ("false", "0", "no")
    p.add_argument(
        "--gradient_checkpointing", type=_bool, nargs="?", const=True,
        default=True,
        help="remat decoder layers (run_sft_video.sh:27); 'false' disables "
        "the backward recompute when HBM is plentiful",
    )
    p.add_argument(
        "--bf16", type=_bool, nargs="?", const=True, default=True,
        help="cast params to bfloat16 ('false' keeps the checkpoint dtype)",
    )
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--nframes", type=int, default=None)
    p.add_argument(
        "--per_device_train_batch_size", type=int, default=1,
        help="samples per data replica (reference: 1, run_sft_video.sh:13)",
    )
    p.add_argument("--mesh_data", type=int, default=1)
    p.add_argument("--mesh_fsdp", type=int, default=-1)
    p.add_argument("--mesh_tensor", type=int, default=1)
    # Multi-host (SURVEY §5.8): on a TPU pod jax.distributed auto-discovers
    # the coordinator; off-pod pass all three explicitly (or via
    # JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    p.add_argument("--coordinator_address", default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    # PEFT / LoRA (reference: peft_config via TRL --use_peft flags,
    # sft_multi_task.py:479)
    p.add_argument("--use_peft", action="store_true")
    p.add_argument("--lora_r", type=int, default=16)
    p.add_argument("--lora_alpha", type=float, default=32.0)
    p.add_argument("--lora_target_modules", default="q_proj,v_proj",
                   help="comma-separated (HF names like q_proj or leaf names like q_w)")
    p.add_argument("--resume_from_checkpoint", default=None)
    p.add_argument("--report_to", default="none")
    return p.parse_args()


def main():
    args = parse_args()
    os.environ.setdefault("WANDB_MODE", "offline")

    from ..parallel import distributed as D

    D.initialize(args.coordinator_address, args.num_processes, args.process_id)

    import jax.numpy as jnp
    import numpy as np
    from tqdm import tqdm

    from ..data.processor import O3VideoProcessor
    from ..data.sft_dataset import collate_sft_batch, load_sft_dataset, prepare_sft_example
    from ..models.qwen25vl import params as P
    from ..parallel import shard_params
    from ..utils.metrics import MetricsBus
    from . import checkpoint as CKPT
    from .sft import SFTConfig, make_optimizer, make_train_step

    params, model_cfg = P.load_pretrained(args.model_name_or_path)
    if args.bf16:
        # Reference trains in bf16 (run_sft_video.sh:28); checkpoints may
        # ship f32 — cast float leaves, leave ints (quantized) alone.
        import jax
        import jax.numpy as _jnp

        params = jax.tree.map(
            lambda x: x.astype(_jnp.bfloat16)
            if hasattr(x, "dtype") and _jnp.issubdtype(x.dtype, _jnp.floating)
            else x,
            params,
        )
    processor = O3VideoProcessor.from_pretrained(args.model_name_or_path)

    raw = load_sft_dataset(args.dataset_name)
    prepared = [prepare_sft_example(ex, args.data_root) for ex in tqdm(raw, desc="Preparing dataset")]

    mesh = None
    import jax

    if args.mesh_data == 1 and args.mesh_fsdp == 1 and args.mesh_tensor == 1:
        pass  # explicit 1x1x1 = run unsharded even on a multi-device host
    elif len(jax.devices()) > 1 or args.mesh_tensor > 1 or args.mesh_fsdp > 1:
        # Multi-process: the data axis grows by one DCN granule per host.
        mesh = D.make_hybrid_mesh(
            data=args.mesh_data, fsdp=args.mesh_fsdp, tensor=args.mesh_tensor
        )

    # Global batch = one sample per data replica x per-device batch size
    # (reference: 8 procs x bs 1, run_sft_video.sh:13).
    data_size = mesh.shape["data"] if mesh is not None else 1
    global_bs = data_size * args.per_device_train_batch_size

    steps_per_epoch = max(1, len(prepared) // global_bs)
    total_steps = args.max_steps if args.max_steps > 0 else int(steps_per_epoch * args.num_train_epochs)
    train_cfg = SFTConfig(
        learning_rate=args.learning_rate,
        max_grad_norm=args.max_grad_norm,
        gradient_checkpointing=args.gradient_checkpointing,
        save_steps=args.save_steps,
        logging_steps=args.logging_steps,
        total_steps=total_steps,
    )
    optimizer = make_optimizer(train_cfg)

    if mesh is not None:
        params = shard_params(params, mesh)
    lora_cfg = adapters = None
    if args.use_peft:
        from .lora import LoraConfig, init_adapters
        from .sft import make_lora_train_step

        lora_cfg = LoraConfig(
            rank=args.lora_r,
            alpha=args.lora_alpha,
            target_modules=LoraConfig.normalize_targets(
                args.lora_target_modules.split(",")
            ),
        )
        adapters = init_adapters(params, lora_cfg, dtype=jnp.bfloat16)
        if mesh is not None:
            from ..parallel import replicate

            adapters = replicate(adapters, mesh)
        opt_state = optimizer.init(adapters)
        lora_step = make_lora_train_step(
            model_cfg, train_cfg, optimizer, lora_cfg.scale
        )
        train_step = lambda a, o, b: lora_step(a, o, b, params)
    else:
        opt_state = optimizer.init(params)
        train_step = make_train_step(model_cfg, train_cfg, optimizer)
    if mesh is not None:
        from ..parallel import replicate_scalars

        opt_state = replicate_scalars(opt_state, mesh)

    start_step = 0
    if args.resume_from_checkpoint:
        # Restore INTO the live shardings (topology-change-safe).
        target = {"params": adapters if adapters is not None else params,
                  "opt_state": opt_state,
                  "meta": {"step": np.zeros((), np.int64)}}
        state, start_step = CKPT.restore_checkpoint(args.resume_from_checkpoint, target=target)
        if adapters is not None:
            adapters = state["params"]
        else:
            params = state["params"]
        opt_state = state["opt_state"]
        print(f"Resumed from step {start_step}")

    metrics = MetricsBus(use_wandb=args.report_to == "wandb", primary=D.is_primary())
    step = start_step
    n_skipped = 0

    def shard_batch(batch):
        """Host batch (GLOBAL rows, identical on every host) -> device batch
        sharded over the data axis. Multi-host: each process contributes the
        row block owned by its devices (put_global)."""
        from jax.sharding import PartitionSpec as P_

        pc = jax.process_count()
        pid = jax.process_index()

        out = {}
        for k, v in batch.items():
            if k in ("grid_thw", "vision_token_id") or v is None:
                out[k] = v  # host metadata (static under jit)
                continue
            if mesh is None:
                out[k] = jnp.asarray(v)
                continue
            v = np.asarray(v)
            if k == "position_ids":
                rows = v.shape[1] // pc
                local = v[:, pid * rows:(pid + 1) * rows] if pc > 1 else v
                out[k] = D.put_global(local, mesh, P_(None, "data"))
            elif k == "pixel_patches":
                # ragged across examples -> replicated (identical per host)
                out[k] = D.put_global(v, mesh, P_())
            else:
                rows = v.shape[0] // pc
                local = v[pid * rows:(pid + 1) * rows] if pc > 1 else v
                out[k] = D.put_global(local, mesh, P_("data"))
        return out

    if len(prepared) < global_bs:
        raise ValueError(
            f"dataset has {len(prepared)} usable examples but the global "
            f"batch is {global_bs} (mesh data axis x per-device batch); "
            "reduce --mesh_data / --per_device_train_batch_size or add data"
        )
    # Resume restarts data iteration where it stopped (the sampler is
    # sequential): skip the already-trained batches of the partial epoch
    # instead of replaying prepared[0:] and starving the dataset tail.
    epoch = start_step // steps_per_epoch
    resume_offset = (start_step % steps_per_epoch) * global_bs
    while step < total_steps:
        made_progress = False
        start_i, resume_offset = resume_offset, 0  # only the resumed epoch
        for i in range(start_i, len(prepared) - global_bs + 1, global_bs):
            if step >= total_steps:
                break
            group = prepared[i : i + global_bs]
            try:
                batch = collate_sft_batch(
                    group, processor, model_cfg, args.data_root, nframes=args.nframes
                )
            except Exception as e:
                # Failure absorption (reference degraded-recompute pattern,
                # grpo_trainer.py:452-465): a bad sample skips its batch
                # instead of killing the run.
                batch = None
                print(f"[warn] collate failed at step {step} ({e!r}); skipping batch")
            # Multi-host: agree on the skip so one host's transient IO
            # failure doesn't desynchronize the fleet (gspo.py guards its
            # step inputs the same way via assert_in_sync).
            if not D.all_hosts_ok(batch is not None, "sft collate"):
                n_skipped += 1
                continue
            batch = shard_batch(batch)
            if adapters is not None:
                adapters, opt_state, m = train_step(adapters, opt_state, batch)
            else:
                params, opt_state, m = train_step(params, opt_state, batch)
            metrics.push(loss=D.scalar(m["loss"]), grad_norm=D.scalar(m["grad_norm"]))
            step += 1
            made_progress = True
            if step % train_cfg.logging_steps == 0:
                metrics.flush(step, extra={"epoch": epoch, "skipped": n_skipped})
            if step % train_cfg.save_steps == 0:
                CKPT.save_checkpoint(
                    args.output_dir, step,
                    {"params": adapters if adapters is not None else params,
                     "opt_state": opt_state,
                     "meta": {"step": np.asarray(step, np.int64)}},
                    async_save=True,  # don't stall the train loop
                )
        epoch += 1
        if not made_progress and start_i == 0:
            # Every batch in the epoch failed collate: stop with a clear
            # error instead of spinning epochs forever. (A resumed partial
            # epoch that skipped to its tail is not "no progress".)
            raise RuntimeError(
                f"epoch {epoch - 1} made no training progress "
                f"({n_skipped} batches skipped) — data is unusable"
            )

    CKPT.wait_for_saves()
    CKPT.save_checkpoint(
        args.output_dir, step,
        {"params": adapters if adapters is not None else params,
         "opt_state": opt_state,
         "meta": {"step": np.asarray(step, np.int64)}},
    )
    # export gathers collectively and writes on process 0 only
    if adapters is not None:
        from .lora import merge_adapters

        # PEFT merge_and_unload equivalent: export base + folded deltas.
        CKPT.export_safetensors(
            merge_adapters(params, adapters, lora_cfg.scale), model_cfg,
            args.output_dir,
        )
    else:
        CKPT.export_safetensors(params, model_cfg, args.output_dir)
    CKPT.write_model_card(
        args.output_dir, trainer_name="SFT",
        base_model=args.model_name_or_path,
        dataset_name=getattr(args, "dataset_name", None),
    )
    print(f"SFT complete: {step} steps -> {args.output_dir}")


if __name__ == "__main__":
    main()
