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
