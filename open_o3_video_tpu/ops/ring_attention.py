"""Ring attention: context-parallel causal attention over a mesh axis.

The reference has NO context parallelism — it budgets vision tokens and
relies on FlashAttention-2 on one GPU (SURVEY.md §5.7, vision_process.py:
288-295, grpo_trainer.py:569-578). This module is the idiomatic TPU
*extension* SURVEY §2.4 plans for the 16k-81k-token regimes: shard the
sequence dimension of activations over a ``context`` mesh axis and compute
exact causal attention by rotating KV blocks around the ICI ring with
``jax.lax.ppermute``, combining blocks with the online-softmax (flash)
recurrence. Peak per-device attention memory drops from O(S·T) to
O((S/n)·(T/n)) per step and activations from O(S) to O(S/n).

Runs inside a ``jax.shard_map`` region whose ``axis_names`` include the
context axis (parallel/context.py wires this); everything outside attention
in the decoder layer is position-local, so only this op communicates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Large-but-finite mask value: keeps exp()/max() NaN-free for rows whose
# every key is masked (left padding), unlike -inf.
_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


def ring_attention(
    q: jnp.ndarray,  # (B, Sq, Hq, D)   local query block
    k: jnp.ndarray,  # (B, Skv, Hkv, D) local key block
    v: jnp.ndarray,  # (B, Skv, Hkv, D) local value block
    q_positions: jnp.ndarray,  # (B, Sq) GLOBAL sequence positions of queries
    kv_positions: jnp.ndarray,  # (B, Skv) GLOBAL positions of the local keys
    kv_mask: jnp.ndarray | None,  # (B, Skv) validity of the local keys
    *,
    axis_name: str,
) -> jnp.ndarray:
    """Exact causal GQA attention with KV rotating around ``axis_name``.

    Positions must be GLOBAL (the caller shards them alongside the
    activations): causality is ``kv_position <= q_position``, evaluated
    block by block as KV blocks arrive from the ring, with the standard
    online-softmax running (max, denominator) combine — the same math as
    the flash kernel, at block granularity.

    Every device processes all ``n`` blocks, including blocks entirely in
    its causal future (their contribution is zero); at the 4-16 way CP
    sizes this targets, skipping them (zigzag schedules) saves less than it
    complicates, since ppermute cost is unchanged.

    Fully-masked (padding) query rows return zeros — finite, never read.
    """
    B, Sq, Hq, D = q.shape
    Skv, Hkv = k.shape[1], k.shape[2]
    group = Hq // Hkv
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    qg = q.reshape(B, Sq, Hkv, group, D)
    scale = 1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32))
    if kv_mask is None:
        kv_mask = jnp.ones((B, Skv), bool)

    # Accumulators are per-shard values (they derive from the local q
    # block): mark them varying over the ring axis so scan's carry typing
    # accepts the body's outputs.
    def _vary(x):
        return jax.lax.pcast(x, (axis_name,), to="varying")

    acc = _vary(jnp.zeros((B, Sq, Hkv, group, D), jnp.float32))
    m = _vary(jnp.full((B, Sq, Hkv, group), _NEG, jnp.float32))
    denom = _vary(jnp.zeros((B, Sq, Hkv, group), jnp.float32))

    def body(carry, _):
        k, v, kv_pos, kv_m, acc, m, denom = carry
        # (B, Sq, Hkv, group, Skv) f32 scores against the current block.
        s = (
            jnp.einsum("bshgd,bthd->bshgt", qg, k, preferred_element_type=jnp.float32)
            * scale
        )
        mask = (kv_pos[:, None, :] <= q_positions[:, :, None]) & kv_m[:, None, :]
        mask = mask[:, :, None, None, :]
        s = jnp.where(mask, s, _NEG)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        # where() (not bare exp) so an all-masked block stays exactly zero.
        p = jnp.where(mask, jnp.exp(s - m_new[..., None]), 0.0)
        alpha = jnp.exp(m - m_new)
        o_i = jnp.einsum(
            "bshgt,bthd->bshgd", p.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
        acc = acc * alpha[..., None] + o_i
        denom = denom * alpha + jnp.sum(p, axis=-1)
        k, v, kv_pos, kv_m = jax.tree.map(
            lambda x: jax.lax.ppermute(x, axis_name, perm), (k, v, kv_pos, kv_m)
        )
        return (k, v, kv_pos, kv_m, acc, m_new, denom), None

    carry = (k, v, kv_positions, kv_mask, acc, m, denom)
    (k, v, _, _, acc, m, denom), _ = jax.lax.scan(body, carry, None, length=n)
    out = acc / jnp.maximum(denom, 1e-20)[..., None]
    return out.reshape(B, Sq, Hq, D).astype(q.dtype)
