"""Checkpoint IO: Orbax sharded save/restore + HF-safetensors interop.

Replaces the reference's HF Trainer + DeepSpeed checkpointing
(SURVEY.md §5.4): ``save_steps``-style periodic saves, step resume, and
"gather 16-bit weights on save" == exporting the unsharded tree to
safetensors for released-checkpoint interop.
"""

from __future__ import annotations

import os
from typing import Any, Optional


def save_checkpoint(ckpt_dir: str, step: int, state: dict[str, Any]):
    """Async-capable Orbax save of {params, opt_state, step, ...}."""
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return path


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
    """Restore a checkpoint (latest step when unspecified)."""
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is not None:
            restored = ckptr.restore(path, item=target)
        else:
            restored = ckptr.restore(path)
    return restored, step


def export_safetensors(params: dict, cfg, out_dir: str):
    """Gather + export model weights to HF-convention safetensors
    (== zero3_gather_16bit_weights_on_model_save, local_scripts/zero3.json:33)."""
    from ..models.qwen25vl.params import save_safetensors

    os.makedirs(out_dir, exist_ok=True)
    save_safetensors(params, cfg, os.path.join(out_dir, "model.safetensors"))
