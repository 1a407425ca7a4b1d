"""Aria full model: vision tower -> projector -> MoE text decoder.

The text stack is the SHARED decoder (models/qwen25vl/text.py) — Aria's
llama-style rope is chunked M-RoPE with everything in the T section, and its
MoE MLP is the ``router`` branch of ``_mlp`` — so the inference engine,
trainers, and sharding rules apply unchanged. Reference consumption:
``AriaForConditionalGeneration`` in grpo_trainer.py:217/:240.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..qwen25vl.model import merge_vision_embeddings_by_index
from ..qwen25vl.text import logits_from_hidden, text_forward
from .config import AriaConfig
from .vision import projector, vision_tower


def get_image_features(params: dict, cfg: AriaConfig, pixel_values: jnp.ndarray) -> jnp.ndarray:
    """(n_images, C, H, W) -> (n_images * query_num, text_hidden) feature rows
    (HF AriaModel.get_image_features at vision_feature_layer=-1)."""
    states = vision_tower(params["visual"], cfg.vision, pixel_values)
    feats = projector(params, cfg, states)  # (n, q, Dt)
    return feats.reshape(-1, feats.shape[-1])


def get_rope_index(cfg: AriaConfig, input_ids: np.ndarray,
                   attention_mask: Optional[np.ndarray] = None):
    """Standard sequential positions broadcast to the (3, B, S) M-RoPE shape
    (identical axes == plain 1-D rope). Padding keeps position 1."""
    B, S = np.asarray(input_ids).shape
    if attention_mask is not None:
        pos = np.cumsum(attention_mask, axis=-1) - 1
        pos[attention_mask == 0] = 1
    else:
        pos = np.broadcast_to(np.arange(S)[None], (B, S))
    return np.broadcast_to(pos[None], (3, B, S)).copy()


def forward(
    params: dict,
    cfg: AriaConfig,
    input_ids: jnp.ndarray,  # (B, S)
    position_ids: Optional[jnp.ndarray] = None,  # (3, B, S)
    *,
    pixel_values: Optional[jnp.ndarray] = None,  # (n_images, C, H, W)
    vision_row_index: Optional[jnp.ndarray] = None,  # (B, S): pos -> feature row
    attn_valid: Optional[jnp.ndarray] = None,
    cache: Optional[dict] = None,
    cache_offset=0,
    seq_positions=None,
    remat: bool = False,
    return_hidden: bool = False,
):
    """Full forward -> (logits (B, S, vocab) float32, updated kv cache).

    ``vision_row_index`` lets G generations of one prompt share a single
    vision encode (the GSPO rollout layout, train/gspo.py) instead of the
    placeholder-mask cumsum, which assumes each row owns its own features.
    ``return_hidden=True`` skips the lm_head (see qwen25vl.forward)."""
    embeds = params["text"]["embed_tokens"][input_ids]
    if pixel_values is not None:
        feats = get_image_features(params, cfg, pixel_values)
        if vision_row_index is None:
            mask = input_ids == cfg.image_token_id
            vision_row_index = jnp.where(
                mask, jnp.cumsum(mask.reshape(-1)).reshape(mask.shape) - 1, -1
            )
        embeds = merge_vision_embeddings_by_index(embeds, feats, vision_row_index)
    if position_ids is None:
        B, S = input_ids.shape
        pos = jnp.arange(S)[None].repeat(B, axis=0) + cache_offset
        position_ids = jnp.broadcast_to(pos[None], (3, B, S))
    hidden, new_cache = text_forward(
        params["text"],
        cfg.text,
        embeds,
        position_ids,
        attn_valid=attn_valid,
        cache=cache,
        cache_offset=cache_offset,
        seq_positions=seq_positions,
        remat=remat,
    )
    if return_hidden:
        return hidden, new_cache
    return logits_from_hidden(params["text"], hidden), new_cache
