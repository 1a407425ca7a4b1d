"""Rotary position embeddings: 2D vision RoPE and multimodal (M-)RoPE.

M-RoPE splits the head dim into (temporal, height, width) sections and rotates
each with its own position stream; text tokens carry identical positions in
all three streams (reference behavior: HF Qwen2.5-VL; consumed by the
reference at grpo_trainer.py:211-219 via transformers).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def vision_rotary_table(head_dim: int, max_pos: int, theta: float = 10000.0) -> np.ndarray:
    """Per-axis frequency table for the ViT 2D RoPE: (max_pos, head_dim // 4).

    The vision rotary embedding is built with dim = head_dim // 2, giving
    head_dim // 4 frequencies per spatial axis; h and w halves are
    concatenated downstream.
    """
    dim = head_dim // 2
    inv_freq = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    seq = np.arange(max_pos, dtype=np.float32)
    return np.outer(seq, inv_freq)  # (max_pos, dim // 2)


def vision_pos_freqs(grid_thw: Sequence[tuple[int, int, int]], merge_size: int, head_dim: int) -> np.ndarray:
    """Rotary angle per vision patch, in merge-block order: (S, head_dim // 2).

    For each (t, h, w) grid, h/w position ids are laid out so that the four
    patches of every merge block are contiguous, matching the patchify order.
    """
    pos_ids = []
    for t, h, w in grid_thw:
        hh = np.arange(h).reshape(h, 1).repeat(w, axis=1)
        hh = (
            hh.reshape(h // merge_size, merge_size, w // merge_size, merge_size)
            .transpose(0, 2, 1, 3)
            .reshape(-1)
        )
        ww = np.arange(w).reshape(1, w).repeat(h, axis=0)
        ww = (
            ww.reshape(h // merge_size, merge_size, w // merge_size, merge_size)
            .transpose(0, 2, 1, 3)
            .reshape(-1)
        )
        pos = np.stack([hh, ww], axis=-1)  # (h*w, 2)
        pos_ids.append(np.tile(pos, (t, 1)))
    pos_ids = np.concatenate(pos_ids, axis=0)
    max_grid = max(max(h, w) for _, h, w in grid_thw)
    table = vision_rotary_table(head_dim, int(max_grid))
    freqs = table[pos_ids]  # (S, 2, dim//2)
    return freqs.reshape(freqs.shape[0], -1)  # (S, head_dim // 2)


def apply_rope_vision(q: jnp.ndarray, k: jnp.ndarray, freqs: jnp.ndarray):
    """Apply 2D RoPE to vision q/k of shape (..., S, H, D); freqs (S, D/2).

    Matches the reference float32 application then cast back.
    """
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (S, D)
    cos = jnp.cos(emb)[..., :, None, :]  # (S, 1, D)
    sin = jnp.sin(emb)[..., :, None, :]
    orig_dtype = q.dtype
    q, k = q.astype(jnp.float32), k.astype(jnp.float32)
    q = q * cos + rotate_half(q) * sin
    k = k * cos + rotate_half(k) * sin
    return q.astype(orig_dtype), k.astype(orig_dtype)


def mrope_cos_sin(
    position_ids: jnp.ndarray,  # (3, B, S) int
    head_dim: int,
    mrope_section: Sequence[int],
    theta: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin of shape (B, S, head_dim) with per-section axis selection.

    freqs per axis a: pos[a] x inv_freq -> (3, B, S, head_dim/2); duplicated to
    head_dim; then section s (of the doubled mrope_section) takes axis s % 3.
    """
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = position_ids.astype(jnp.float32)[..., None] * inv_freq  # (3, B, S, D/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (3, B, S, D)
    cos, sin = jnp.cos(emb), jnp.sin(emb)

    sections = list(mrope_section) * 2
    starts = np.cumsum([0] + sections[:-1])
    cos_parts = [
        cos[i % 3][..., int(s) : int(s) + int(w)] for i, (s, w) in enumerate(zip(starts, sections))
    ]
    sin_parts = [
        sin[i % 3][..., int(s) : int(s) + int(w)] for i, (s, w) in enumerate(zip(starts, sections))
    ]
    return jnp.concatenate(cos_parts, axis=-1), jnp.concatenate(sin_parts, axis=-1)


def mrope_cos_sin_interleaved(
    position_ids: jnp.ndarray,  # (3, B, S) int
    head_dim: int,
    mrope_section: Sequence[int],
    theta: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Qwen3-VL interleaved M-RoPE: frequency f takes the T axis by default,
    with f in {1, 4, 7, ...} (< 3*section_h, offset 1) taking H and
    f in {2, 5, 8, ...} (< 3*section_w, offset 2) taking W — preserving
    low->high frequency continuity within each axis (HF
    Qwen3VLTextRotaryEmbedding.apply_interleaved_mrope)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = position_ids.astype(jnp.float32)[..., None] * inv_freq  # (3, B, S, D/2)
    half = head_dim // 2
    axis_sel = np.zeros(half, dtype=np.int64)  # default: T
    idx = np.arange(half)
    axis_sel[(idx % 3 == 1) & (idx < 3 * int(mrope_section[1]))] = 1  # H
    axis_sel[(idx % 3 == 2) & (idx < 3 * int(mrope_section[2]))] = 2  # W
    sel = jnp.asarray(axis_sel)
    merged = jnp.where(
        sel == 0, freqs[0], jnp.where(sel == 1, freqs[1], freqs[2])
    )  # (B, S, D/2)
    emb = jnp.concatenate([merged, merged], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_mrope(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """Rotate q/k of shape (B, S, H, D) by cos/sin (B, S, D)."""
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    q_out = q * cos + rotate_half(q) * sin
    k_out = k * cos + rotate_half(k) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)
