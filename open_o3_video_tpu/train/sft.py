"""SFT trainer: cross-entropy on <think>/<answer> targets.

The TPU-native equivalent of MySFTTrainer + DeepSpeed ZeRO-2
(sft_multi_task.py:402-499, run_sft_video.sh): optax AdamW with the
reference hyperparameters (lr 1e-6, bf16, grad checkpointing, 1 sample per
data-parallel replica), FSDP param/optimizer sharding on the mesh, masked
labels (pad + visual tokens -> -100, sft_multi_task.py:387-398).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import family_forward
from ..models.qwen25vl import Qwen25VLConfig

IGNORE_INDEX = -100


@dataclasses.dataclass
class SFTConfig:
    """Defaults mirror run_sft_video.sh:13-35."""

    learning_rate: float = 1e-6
    weight_decay: float = 0.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    max_grad_norm: float = 1.0
    warmup_steps: int = 0
    total_steps: int = 10000
    lr_schedule: str = "constant"  # reference uses constant lr for SFT
    gradient_checkpointing: bool = True
    save_steps: int = 500
    logging_steps: int = 1
    # Bound live logits to (B, logp_chunk, vocab) via the scanned lm_head
    # (models/.../text.py per_token_logps_from_hidden). None = dense.
    logp_chunk: int | None = 512


def make_optimizer(cfg: SFTConfig) -> optax.GradientTransformation:
    if cfg.lr_schedule == "cosine":
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, cfg.warmup_steps, cfg.total_steps
        )
    else:
        schedule = optax.linear_schedule(
            cfg.learning_rate, cfg.learning_rate, 1
        ) if cfg.warmup_steps == 0 else optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps),
             optax.constant_schedule(cfg.learning_rate)],
            [cfg.warmup_steps],
        )
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(schedule, b1=cfg.adam_b1, b2=cfg.adam_b2, weight_decay=cfg.weight_decay),
    )


def sft_loss(
    params: dict,
    model_cfg: Qwen25VLConfig,
    batch: dict[str, Any],
    *,
    remat: bool = True,
    logp_chunk: int | None = None,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Next-token CE over positions whose label != IGNORE_INDEX.

    ``logp_chunk`` bounds live logits to (B, chunk, vocab) via the scanned
    lm_head — at 7B dims a full (B, L, vocab) float32 logits tensor is the
    step's memory hot spot."""
    from ..models.qwen25vl.text import per_token_logps_from_hidden

    hidden, _ = family_forward(
        params,
        model_cfg,
        batch["input_ids"],
        batch["position_ids"],
        pixel_patches=batch.get("pixel_patches"),
        grid_thw=batch.get("grid_thw"),
        vision_token_id=batch.get("vision_token_id"),
        pixel_values=batch.get("pixel_values"),
        vision_row_index=batch.get("vision_row_index"),
        attn_valid=batch.get("attn_valid"),
        remat=remat,
        return_hidden=True,
    )
    labels = batch["labels"]
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    token_logps = per_token_logps_from_hidden(
        params["text"], hidden[:, :-1], safe_labels, logp_chunk
    )
    denom = jnp.maximum(valid.sum(), 1)
    loss = jnp.where(valid, -token_logps, 0.0).sum() / denom
    return loss, {"loss": loss, "num_target_tokens": valid.sum()}


def make_train_step(model_cfg: Qwen25VLConfig, train_cfg: SFTConfig, optimizer):
    """(params, opt_state, batch) -> (params, opt_state, metrics).

    ``grid_thw`` / ``vision_token_id`` are host metadata (compile-time
    constants for the vision tower's segment spec), so the returned callable
    dispatches to one jitted program per (grid, keys) combination instead of
    tracing them as arrays.

    Under a mesh, params/opt_state arrive sharded (fsdp/tensor) and batch
    arrives sharded on the data axis; XLA GSPMD inserts the gradient psum
    (== the reference's NCCL all-reduce, SURVEY.md §5.8).
    """
    jitted: dict = {}

    def train_step(params, opt_state, batch):
        batch = dict(batch)
        grid = batch.pop("grid_thw", None)
        vis_tok = batch.pop("vision_token_id", None)
        grid_key = None if grid is None else tuple(map(tuple, np.asarray(grid).tolist()))
        key = (grid_key, vis_tok, tuple(sorted(batch.keys())))
        if key not in jitted:

            @jax.jit
            def fn(params, opt_state, batch, _grid=grid, _vt=vis_tok):
                full = {**batch, "grid_thw": _grid, "vision_token_id": _vt}
                (loss, aux), grads = jax.value_and_grad(
                    lambda p: sft_loss(
                        p, model_cfg, full,
                        remat=train_cfg.gradient_checkpointing,
                        logp_chunk=train_cfg.logp_chunk,
                    ),
                    has_aux=True,
                )(params)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                gnorm = optax.global_norm(grads)
                return params, opt_state, {**aux, "grad_norm": gnorm}

            jitted[key] = fn
        return jitted[key](params, opt_state, batch)

    return train_step


def make_lora_train_step(model_cfg: Qwen25VLConfig, train_cfg: SFTConfig,
                         optimizer, lora_scale: float):
    """(adapters, opt_state, batch, base_params) -> (adapters, opt_state, m).

    The PEFT path (reference: peft_config plumbed in sft_multi_task.py:479):
    gradients flow through the adapter tree ONLY — the frozen base (which
    may be int8, QLoRA-style) is a plain argument, so no base-sized
    gradient or optimizer buffers ever exist."""
    from .lora import apply_adapters

    jitted: dict = {}

    def train_step(adapters, opt_state, batch, base_params):
        batch = dict(batch)
        grid = batch.pop("grid_thw", None)
        vis_tok = batch.pop("vision_token_id", None)
        grid_key = None if grid is None else tuple(map(tuple, np.asarray(grid).tolist()))
        key = (grid_key, vis_tok, tuple(sorted(batch.keys())))
        if key not in jitted:

            @jax.jit
            def fn(adapters, opt_state, batch, base, _grid=grid, _vt=vis_tok):
                full = {**batch, "grid_thw": _grid, "vision_token_id": _vt}
                (loss, aux), grads = jax.value_and_grad(
                    lambda ad: sft_loss(
                        apply_adapters(base, ad, lora_scale), model_cfg, full,
                        remat=train_cfg.gradient_checkpointing,
                        logp_chunk=train_cfg.logp_chunk,
                    ),
                    has_aux=True,
                )(adapters)
                updates, opt_state = optimizer.update(grads, opt_state, adapters)
                adapters = optax.apply_updates(adapters, updates)
                gnorm = optax.global_norm(grads)
                return adapters, opt_state, {**aux, "grad_norm": gnorm}

            jitted[key] = fn
        return jitted[key](adapters, opt_state, batch, base_params)

    return train_step


def mask_labels(
    input_ids: np.ndarray,
    pad_token_id: int,
    visual_token_ids: tuple[int, ...],
) -> np.ndarray:
    """labels = input_ids with pad + visual tokens ignored.

    Reference: sft_multi_task.py:387-398 — which ids are "visual" is
    family-dependent (Qwen2-VL masks 151652/151653/151656, Qwen2.5-VL
    masks only the image token); pass data.sft_dataset.visual_mask_ids(cfg)
    for the reference-faithful set."""
    labels = input_ids.copy()
    labels[labels == pad_token_id] = IGNORE_INDEX
    for tok in visual_token_ids:
        labels[labels == tok] = IGNORE_INDEX
    return labels
