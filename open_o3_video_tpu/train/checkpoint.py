"""Checkpoint IO: Orbax sharded save/restore + HF-safetensors interop.

Replaces the reference's HF Trainer + DeepSpeed checkpointing
(SURVEY.md §5.4): ``save_steps``-style periodic saves (optionally async),
step resume that restores arrays INTO the caller's shardings (safe across
topology changes), and "gather 16-bit weights on save" == exporting the
unsharded tree to safetensors for released-checkpoint interop.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np

_async_ckptr = None


def _get_async_checkpointer():
    global _async_ckptr
    if _async_ckptr is None:
        import orbax.checkpoint as ocp

        _async_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _async_ckptr


def save_checkpoint(ckpt_dir: str, step: int, state: dict[str, Any],
                    async_save: bool = False):
    """Orbax save of {params, opt_state, step, ...}.

    ``async_save=True`` returns immediately while the write proceeds in the
    background (call :func:`wait_for_saves` before reading the files or
    exiting) — the analogue of not stalling the train loop on save_steps.
    """
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    if async_save:
        _get_async_checkpointer().save(path, state, force=True)
    else:
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, state, force=True)
    return path


def wait_for_saves():
    """Block until all async saves have committed."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(name.split("_")[1])
        for name in os.listdir(ckpt_dir)
        if name.startswith("step_") and name.split("_")[1].isdigit()
    ]
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, step: Optional[int] = None, target: Optional[dict] = None):
    """Restore a checkpoint (latest step when unspecified).

    With ``target`` (a pytree of arrays — e.g. the freshly initialized,
    already-sharded state), every array restores directly INTO the target's
    sharding and dtype, which is both topology-change-safe and avoids a
    host gather (DeepSpeed's load_checkpoint analogue). Without it, arrays
    restore with their as-saved layout (orbax warns that this is unsafe on
    a different topology).
    """
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is not None:
            import jax

            def restore_arg(x):
                if hasattr(x, "sharding"):
                    return ocp.ArrayRestoreArgs(
                        sharding=x.sharding, global_shape=x.shape, dtype=x.dtype
                    )
                return ocp.RestoreArgs()

            restore_args = jax.tree.map(restore_arg, target)
            restored = ckptr.restore(path, item=target, restore_args=restore_args)
        else:
            restored = ckptr.restore(path)
    return restored, step


def export_safetensors(params: dict, cfg, out_dir: str):
    """Gather + export model weights to HF-convention safetensors
    (== zero3_gather_16bit_weights_on_model_save, local_scripts/zero3.json:33).

    Multi-host: every process must call this (the gather is collective);
    only process 0 writes the file."""
    import jax

    from ..models.qwen25vl.params import save_safetensors

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # Leaf-wise allgather bounds host memory to one full leaf at a time
        # plus the growing numpy tree.
        params = jax.tree.map(
            lambda x: np.asarray(multihost_utils.process_allgather(x, tiled=True))
            if hasattr(x, "sharding")
            else x,
            params,
        )
        if jax.process_index() != 0:
            return

    os.makedirs(out_dir, exist_ok=True)
    save_safetensors(params, cfg, os.path.join(out_dir, "model.safetensors"))
    # config.json makes the exported directory self-describing — a later
    # load_pretrained(out_dir) (or HF transformers) needs no side channel.
    import json

    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(cfg.to_hf_dict(), f, indent=2)


def write_model_card(
    out_dir: str,
    *,
    trainer_name: str,
    base_model: "str | None" = None,
    model_name: "str | None" = None,
    dataset_name: "str | None" = None,
    tags: "tuple[str, ...]" = (),
):
    """Draft model card in the exported directory (README.md).

    Mirrors the reference trainer's create_model_card (TRL
    generate_model_card; grpo_trainer.py:753-809 including its DeepSeekMath
    citation for the GRPO/GSPO family), without the hub/wandb/comet
    integrations. Rank-0 only under multi-host."""
    import jax

    if jax.process_count() > 1 and jax.process_index() != 0:
        return
    os.makedirs(out_dir, exist_ok=True)
    model_name = model_name or os.path.basename(os.path.normpath(out_dir))
    front = ["---"]
    if base_model:
        front.append(f"base_model: {base_model}")
    front += [
        "library_name: open_o3_video_tpu",
        f"model_name: {model_name}",
        "tags:",
        "- generated_from_trainer",
        f"- {trainer_name.lower()}",
    ]
    front += [f"- {t}" for t in tags]
    if dataset_name:
        front.append(f"datasets:\n- {dataset_name}")
    front.append("---")

    citation = ""
    if trainer_name.upper() in ("GRPO", "GSPO"):
        citation = (
            "\n## Citations\n\n```bibtex\n"
            "@article{zhihong2024deepseekmath,\n"
            "    title        = {{DeepSeekMath: Pushing the Limits of "
            "Mathematical Reasoning in Open Language Models}},\n"
            "    author       = {Zhihong Shao and Peiyi Wang and Qihao Zhu "
            "and Runxin Xu and Junxiao Song and Mingchuan Zhang and "
            "Y. K. Li and Y. Wu and Daya Guo},\n"
            "    year         = 2024,\n"
            "    eprint       = {arXiv:2402.03300},\n"
            "}\n```\n"
        )
    body = (
        f"\n# {model_name}\n\n"
        + (f"This model is a fine-tuned version of [{base_model}]"
           f"(https://huggingface.co/{base_model})" if base_model
           else "This model was trained from scratch")
        + (f" on the {dataset_name} dataset" if dataset_name else "")
        + f" with the **{trainer_name}** trainer of open_o3_video_tpu "
        "(TPU-native JAX).\n\n"
        "## Quick start\n\n```python\n"
        "from open_o3_video_tpu.models import load_model\n"
        f"params, cfg = load_model(\"{out_dir}\")\n```\n"
        + citation
    )
    with open(os.path.join(out_dir, "README.md"), "w") as f:
        f.write("\n".join(front) + "\n" + body)
