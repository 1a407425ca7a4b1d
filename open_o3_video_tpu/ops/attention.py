"""Attention ops.

Two call patterns in the model:

- ``causal_attention``: GQA decoder attention with optional KV cache,
  float32 softmax accumulation. XLA path uses
  ``jax.nn.dot_product_attention`` (fused flash-style on TPU); a Pallas
  splash kernel can be substituted via ``impl="pallas"``.
- ``segment_attention``: bidirectional ViT attention over same-size
  segments (windows or per-image groups), batched with a padding mask —
  the static-shape TPU replacement for the reference's varlen
  ``cu_seqlens`` FlashAttention calls.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def causal_attention(
    q: jnp.ndarray,  # (B, S, Hq, D)
    k: jnp.ndarray,  # (B, T, Hkv, D)
    v: jnp.ndarray,  # (B, T, Hkv, D)
    *,
    q_positions: Optional[jnp.ndarray] = None,  # (B, S) absolute positions of queries
    kv_positions: Optional[jnp.ndarray] = None,  # (B, T) absolute positions of keys
    kv_mask: Optional[jnp.ndarray] = None,  # (B, T) validity of cache slots
    impl: str = "xla",
) -> jnp.ndarray:
    """Causal GQA attention; supports decode against a longer KV buffer.

    Causality: query at position p attends to keys with position <= p.
    When positions are omitted, q/k are assumed aligned ranges (prefill).
    """
    B, S, Hq, D = q.shape
    T, Hkv = k.shape[1], k.shape[2]
    if q_positions is None:
        q_positions = jnp.arange(S)[None, :].repeat(B, axis=0)
    if kv_positions is None:
        kv_positions = jnp.arange(T)[None, :].repeat(B, axis=0)

    mask = kv_positions[:, None, :] <= q_positions[:, :, None]  # (B, S, T)
    if kv_mask is not None:
        mask = mask & kv_mask[:, None, :]
    # Padding queries can end up with zero attendable keys (left padding);
    # fall back to self-attention so their outputs stay finite instead of
    # NaN-ing the softmax (their outputs are never read, but NaNs would
    # otherwise poison later layers through the KV path).
    self_mask = kv_positions[:, None, :] == q_positions[:, :, None]
    mask = jnp.where(mask.any(axis=-1, keepdims=True), mask, self_mask)
    mask = mask[:, None, :, :]  # (B, 1, S, T)

    if impl == "pallas":
        from .flash_attention import flash_attention_gqa

        return flash_attention_gqa(q, k, v, mask=mask)

    # XLA fused path: f32 logits, grouped kv broadcast.
    if Hq != Hkv:
        group = Hq // Hkv
        k = jnp.repeat(k, group, axis=2)
        v = jnp.repeat(v, group, axis=2)
    return jax.nn.dot_product_attention(q, k, v, mask=mask)


def segment_attention(
    q: jnp.ndarray,  # (N, W, H, D) — N segments of W tokens
    k: jnp.ndarray,
    v: jnp.ndarray,
    valid: jnp.ndarray,  # (N, W) bool — padding mask
) -> jnp.ndarray:
    """Bidirectional attention within each segment, masked for padding."""
    mask = (valid[:, None, :] & valid[:, :, None])[:, None, :, :]  # (N, 1, W, W)
    return jax.nn.dot_product_attention(q, k, v, mask=mask)
