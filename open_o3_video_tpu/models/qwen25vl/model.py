"""Qwen2.5-VL full model: vision features scattered into the token stream.

``get_rope_index`` reproduces the HF 3D position computation (the reference
relies on it implicitly through transformers .generate / forward) as a
host-side numpy routine — it is data preparation, not device compute.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .config import Qwen25VLConfig
from .text import logits_from_hidden, text_forward
from .vision import compute_vision_spec, vision_forward


def get_rope_index(
    cfg: Qwen25VLConfig,
    input_ids: np.ndarray,  # (B, S)
    image_grid_thw: Optional[np.ndarray] = None,  # (num_images, 3)
    video_grid_thw: Optional[np.ndarray] = None,  # (num_videos, 3)
    second_per_grid_ts: Optional[Sequence[float]] = None,
    attention_mask: Optional[np.ndarray] = None,  # (B, S) 1=valid
) -> tuple[np.ndarray, np.ndarray]:
    """3D M-RoPE position ids (3, B, S) + per-row rope deltas (B, 1).

    Vision blocks get (t, h, w) grid positions (t scaled by tokens_per_second
    x second_per_grid); text runs sequentially from the running max + 1.
    Padding positions (attention_mask == 0) keep position 1, matching HF.
    """
    merge = cfg.vision.spatial_merge_size
    B, S = input_ids.shape
    if cfg.model_type in ("qwen3_vl", "qwen3_vl_moe") and video_grid_thw is not None:
        # Qwen3-VL separates frames with timestamp TEXT tokens
        # (<t1><vision_start><frame1><vision_end>...), so each video grid
        # splits into per-frame grids with t=1 (HF Qwen3VLModel.get_rope_index).
        video_grid_thw = np.asarray(video_grid_thw)
        video_grid_thw = np.repeat(video_grid_thw, video_grid_thw[:, 0], axis=0)
        video_grid_thw = video_grid_thw.copy()
        video_grid_thw[:, 0] = 1
    if image_grid_thw is None and video_grid_thw is None:
        if attention_mask is not None:
            pos = np.cumsum(attention_mask, axis=-1) - 1
            pos[attention_mask == 0] = 1
            position_ids = np.broadcast_to(pos[None], (3, B, S)).copy()
            deltas = position_ids.max(axis=(0, 2), keepdims=False) + 1 - S
            return position_ids, deltas.reshape(B, 1)
        pos = np.broadcast_to(np.arange(S)[None], (B, S))
        return np.broadcast_to(pos[None], (3, B, S)).copy(), np.zeros((B, 1), dtype=np.int64)

    position_ids = np.ones((3, B, S), dtype=np.int64)
    deltas = []
    image_index, video_index = 0, 0
    for i in range(B):
        row = input_ids[i]
        if attention_mask is not None:
            row = row[attention_mask[i] == 1]
        starts = np.where(row == cfg.vision_start_token_id)[0]
        # A vision_start with no following token (prompt truncated right on
        # the marker — truncation is a live upstream path here) opens no
        # vision block; drop it instead of indexing past the row.
        starts = starts[starts + 1 < len(row)]
        vision_tokens = row[starts + 1] if len(starts) else np.array([], dtype=row.dtype)
        image_nums = int((vision_tokens == cfg.image_token_id).sum())
        video_nums = int((vision_tokens == cfg.video_token_id).sum())
        tokens = row.tolist()
        pos_list = []
        st = 0
        remain_images, remain_videos = image_nums, video_nums
        for _ in range(image_nums + video_nums):
            ed_image = tokens.index(cfg.image_token_id, st) if (cfg.image_token_id in tokens[st:] and remain_images > 0) else len(tokens) + 1
            ed_video = tokens.index(cfg.video_token_id, st) if (cfg.video_token_id in tokens[st:] and remain_videos > 0) else len(tokens) + 1
            if ed_image < ed_video:
                t, h, w = image_grid_thw[image_index]
                second_per_grid = 0.0
                image_index += 1
                remain_images -= 1
                ed = ed_image
            else:
                t, h, w = video_grid_thw[video_index]
                second_per_grid = (
                    float(second_per_grid_ts[video_index]) if second_per_grid_ts is not None else 1.0
                )
                video_index += 1
                remain_videos -= 1
                ed = ed_video
            lt, lh, lw = int(t), int(h) // merge, int(w) // merge
            text_len = ed - st
            st_idx = int(pos_list[-1].max()) + 1 if pos_list else 0
            pos_list.append(np.broadcast_to(np.arange(text_len)[None], (3, text_len)) + st_idx)

            if cfg.model_type in ("qwen2_vl", "qwen3_vl", "qwen3_vl_moe"):
                # Qwen2-VL / Qwen3-VL: raw frame index, no tokens_per_second
                # scaling (Qwen3-VL grids are pre-split to t=1, so its
                # temporal index is always 0 — time lives in text tokens).
                t_index = np.arange(lt)[:, None].repeat(lh * lw, axis=1).flatten()
            else:
                # HF quirk preserved: second_per_grid is cast to the *integer*
                # dtype of the range tensor before the multiply, truncating
                # fractional intervals (0.5 -> 0).
                t_index = (
                    (np.arange(lt)[:, None] * int(second_per_grid) * cfg.vision.tokens_per_second)
                    .astype(np.int64)
                    .repeat(lh * lw, axis=1)
                    .flatten()
                )
            h_index = np.tile(np.arange(lh)[None, :, None], (lt, 1, lw)).flatten()
            w_index = np.tile(np.arange(lw)[None, None, :], (lt, lh, 1)).flatten()
            pos_list.append(np.stack([t_index, h_index, w_index]) + text_len + st_idx)
            st = ed + lt * lh * lw

        if st < len(tokens):
            st_idx = int(pos_list[-1].max()) + 1 if pos_list else 0
            text_len = len(tokens) - st
            pos_list.append(np.broadcast_to(np.arange(text_len)[None], (3, text_len)) + st_idx)

        positions = np.concatenate(pos_list, axis=1)
        if attention_mask is not None:
            position_ids[:, i, attention_mask[i] == 1] = positions
        else:
            position_ids[:, i, :] = positions
        deltas.append(int(positions.max()) + 1 - S)
    return position_ids, np.asarray(deltas, dtype=np.int64).reshape(B, 1)


def encode_vision(
    params: dict,
    cfg: Qwen25VLConfig,
    pixel_patches: jnp.ndarray,  # (S_patches, patch_dim)
    grid_thw: np.ndarray,  # (num, 3) — host values (static per bucket)
):
    """Vision tower -> merged embeddings (S_patches / merge_unit, hidden).

    Qwen3-VL additionally returns the deepstack feature tables:
    (embeddings, [per-tap (S/unit, hidden) tables])."""
    spec = compute_vision_spec([tuple(int(v) for v in g) for g in np.asarray(grid_thw)], cfg.vision)
    return vision_forward(params["visual"], pixel_patches, spec, cfg.vision)


def embed_tokens(params: dict, input_ids: jnp.ndarray) -> jnp.ndarray:
    return params["text"]["embed_tokens"][input_ids]


def merge_vision_embeddings(
    cfg: Qwen25VLConfig,
    input_ids: jnp.ndarray,  # (B, S)
    inputs_embeds: jnp.ndarray,  # (B, S, D)
    vision_embeds: jnp.ndarray,  # (num_vision_tokens, D)
    token_id: int,
) -> jnp.ndarray:
    """Scatter vision rows into placeholder token slots, in order.

    Static-shape friendly: builds a per-slot gather index via cumsum over the
    placeholder mask (placeholder count must equal vision rows, as the
    processor guarantees).
    """
    mask = (input_ids == token_id).reshape(-1)  # (B*S,)
    flat = inputs_embeds.reshape(-1, inputs_embeds.shape[-1])
    # n-th placeholder slot <- n-th vision row
    slot_rank = jnp.cumsum(mask) - 1
    gathered = vision_embeds[jnp.clip(slot_rank, 0, vision_embeds.shape[0] - 1)]
    out = jnp.where(mask[:, None], gathered.astype(flat.dtype), flat)
    return out.reshape(inputs_embeds.shape)


def merge_vision_embeddings_by_index(
    inputs_embeds: jnp.ndarray,  # (B, S, D)
    vision_embeds: jnp.ndarray,  # (num_vision_tokens, D)
    vision_row_index: jnp.ndarray,  # (B, S) int32; -1 for non-vision positions
) -> jnp.ndarray:
    """Scatter vision rows into token slots via an explicit index map.

    Unlike the cumsum-rank merge above, the mapping is supplied by the host,
    so several batch rows can SHARE vision rows — e.g. the G generations of
    one RL prompt reuse a single vision encoding instead of tiling pixel
    values xG as the reference does (grpo_trainer.py:601-609)."""
    flat_idx = vision_row_index.reshape(-1)
    flat = inputs_embeds.reshape(-1, inputs_embeds.shape[-1])
    gathered = vision_embeds[jnp.clip(flat_idx, 0, vision_embeds.shape[0] - 1)]
    out = jnp.where((flat_idx >= 0)[:, None], gathered.astype(flat.dtype), flat)
    return out.reshape(inputs_embeds.shape)


def build_vision_row_index(
    input_ids: np.ndarray,  # (B, S) host array
    token_id,  # int, or a per-row sequence of ints (mixed image/video batch)
    row_offsets: Sequence[Optional[int]],  # per row: vision-table offset, or
    # None for rows whose placeholders must NOT be mapped (degraded samples
    # running text-only — their placeholder tokens keep text embeddings).
) -> np.ndarray:
    """Host-side (B, S) int32 map: n-th placeholder of row b -> row_offsets[b]+n."""
    B, S = input_ids.shape
    toks = [token_id] * B if np.ndim(token_id) == 0 else list(token_id)
    idx = np.full((B, S), -1, dtype=np.int32)
    for b in range(B):
        if row_offsets[b] is None or toks[b] is None:
            continue
        pos = np.where(input_ids[b] == toks[b])[0]
        idx[b, pos] = row_offsets[b] + np.arange(len(pos), dtype=np.int32)
    return idx


def forward(
    params: dict,
    cfg: Qwen25VLConfig,
    input_ids: jnp.ndarray,  # (B, S)
    position_ids: jnp.ndarray,  # (3, B, S)
    *,
    pixel_patches: Optional[jnp.ndarray] = None,
    grid_thw: Optional[np.ndarray] = None,
    vision_token_id: Optional[int] = None,
    vision_row_index: Optional[jnp.ndarray] = None,
    attn_valid: Optional[jnp.ndarray] = None,
    cache: Optional[dict] = None,
    cache_offset=0,
    seq_positions=None,
    remat: bool = False,
    attn_impl: Optional[str] = None,
    return_hidden: bool = False,
) -> tuple[jnp.ndarray, Optional[dict]]:
    """Full forward -> (logits (B, S, vocab) float32, updated kv cache).

    ``return_hidden=True`` skips the lm_head and returns the final-norm
    hidden states instead — callers that only need logps over a SLICE of
    positions (GSPO scores just the completion region) project that slice
    themselves, avoiding a full (B, S, vocab) logits tensor."""
    embeds = embed_tokens(params, input_ids)
    deepstack = None
    ds_row_index = None
    if pixel_patches is not None:
        vis = encode_vision(params, cfg, pixel_patches, grid_thw)
        if isinstance(vis, tuple):  # Qwen3-VL deepstack taps
            vis, deepstack = vis
        if vision_row_index is not None:
            embeds = merge_vision_embeddings_by_index(embeds, vis, vision_row_index)
            ds_row_index = vision_row_index
        else:
            tok = vision_token_id if vision_token_id is not None else cfg.image_token_id
            embeds = merge_vision_embeddings(cfg, input_ids, embeds, vis, tok)
            if deepstack is not None:
                # Build the position->table-row map from the placeholder
                # mask (n-th placeholder <- n-th vision row).
                mask = input_ids == tok
                ds_row_index = jnp.where(
                    mask, jnp.cumsum(mask.reshape(-1)).reshape(mask.shape) - 1, -1
                )
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
        attn_impl=attn_impl,
        deepstack_embeds=deepstack,
        deepstack_row_index=ds_row_index,
    )
    if return_hidden:
        return hidden, new_cache
    return logits_from_hidden(params["text"], hidden), new_cache
