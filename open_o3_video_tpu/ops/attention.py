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

import os

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)

# Decoder attention implementation: "auto" uses the Pallas flash kernel on
# TPU when shapes qualify, XLA fused attention otherwise. Override with
# O3V_ATTN_IMPL=xla|pallas|auto.
ATTN_IMPL = os.environ.get("O3V_ATTN_IMPL", "auto")


def _use_pallas(impl: str, head_dim: int) -> bool:
    if impl == "pallas":
        return True
    if impl == "xla":
        return False
    # auto: flash kernel wants lane-aligned head_dim and a real TPU backend.
    try:
        return jax.default_backend() == "tpu" and head_dim % 128 == 0
    except Exception:
        return False


def causal_attention(
    q: jnp.ndarray,  # (B, S, Hq, D)
    k: jnp.ndarray,  # (B, T, Hkv, D)
    v: jnp.ndarray,  # (B, T, Hkv, D)
    *,
    q_positions: Optional[jnp.ndarray] = None,  # (B, S) absolute positions of queries
    kv_positions: Optional[jnp.ndarray] = None,  # (B, T) absolute positions of keys
    kv_mask: Optional[jnp.ndarray] = None,  # (B, T) validity of cache slots
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Causal GQA attention; supports decode against a longer KV buffer.

    Causality: query at position p attends to keys with position <= p.
    When positions are omitted, q/k are assumed aligned ranges (prefill).

    Note: fully-masked (padding) queries return self-attention under the XLA
    path and zeros under the Pallas path — both finite, neither ever read.
    """
    B, S, Hq, D = q.shape
    T, Hkv = k.shape[1], k.shape[2]
    impl = impl or ATTN_IMPL
    if q_positions is None:
        q_positions = jnp.arange(S)[None, :].repeat(B, axis=0)
    if kv_positions is None:
        kv_positions = jnp.arange(T)[None, :].repeat(B, axis=0)

    if impl.startswith("ring"):
        # Context parallelism: q/k/v are the LOCAL sequence blocks of a
        # shard_map region manual over the named mesh axis, and positions
        # are global (parallel/context.py). Cacheless prefill only.
        from .ring_attention import ring_attention

        axis = impl.split(":", 1)[1] if ":" in impl else "context"
        return ring_attention(
            q, k, v, q_positions, kv_positions, kv_mask, axis_name=axis
        )

    if _use_pallas(impl, D):
        # The Pallas kernel assumes kv buffer index == kv position (true for
        # every cache layout in this codebase).
        from .flash_attention import flash_attention_gqa

        kv_valid = (
            kv_mask.astype(jnp.int32)
            if kv_mask is not None
            else jnp.ones((B, T), jnp.int32)
        )
        return flash_attention_gqa(q, k, v, q_positions.astype(jnp.int32), kv_valid)

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

    # XLA path: f32 logits. For SHORT queries (decode), GQA runs as a
    # grouped einsum so the KV heads are never materialized x(Hq/Hkv) — the
    # repeat would add ~1 GB/step of HBM traffic on the 7B (28 q / 4 kv
    # heads). For long queries the einsum's explicit (B,Hkv,G,S,T) f32
    # score tensor would dwarf the repeat cost (e.g. 60 GB at S=T=8192), so
    # prefill keeps the fused dot_product_attention with repeated KV.
    if Hq != Hkv and S <= 8:
        group = Hq // Hkv
        qg = q.reshape(B, S, Hkv, group, D)
        scores = jnp.einsum(
            "bshgd,bthd->bhgst", qg, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.asarray(D, jnp.float32))
        scores = jnp.where(mask[:, :, None, :, :], scores, -jnp.inf)  # (B,Hkv,G,S,T)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "bhgst,bthd->bshgd", probs.astype(q.dtype), v,
            preferred_element_type=jnp.float32,
        )
        return out.reshape(B, S, Hq, D).astype(q.dtype)
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
