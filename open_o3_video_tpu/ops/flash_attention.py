"""Pallas TPU flash attention: causal GQA with padding masks.

The TPU-native replacement for the reference's FlashAttention-2 CUDA path
(setup.sh:6; attn_implementation flash_attention_2 in run_*_video.sh):
online-softmax tiling so attention never materializes the (S, T) score
matrix in HBM, with

- grouped KV heads (GQA) resolved by block index mapping (no repeat_kv),
- causality over explicit query positions (supports prefill AND cached
  decode against a longer KV buffer),
- a KV validity mask (left-padded batches, partially-filled caches),
- causal block skipping (KV tiles entirely above the diagonal do no work),
- float32 accumulation regardless of input dtype.

Layout: q (B, Sq, Hq, D), k/v (B, T, Hkv, D) — the model's native layout;
blocks are tiled over (batch, q-head, q-tile, kv-tile) with the kv-tile
dimension innermost so the VMEM running max/sum/accumulator scratch carries
across KV tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(np.finfo(np.float32).max)

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 512


def _kernel(
    q_pos_ref,  # (B, Bq) int32 — positions of this q tile, all batch rows
    kv_valid_ref,  # (B, Bk) int32 — validity of this kv tile, all batch rows
    q_ref,  # (1, 1, Bq, D)
    k_ref,  # (1, 1, Bk, D)
    v_ref,  # (1, 1, Bk, D)
    o_ref,  # (1, 1, Bq, D)
    m_scratch,  # (Bq, 1) f32
    l_scratch,  # (Bq, 1) f32
    acc_scratch,  # (Bq, D) f32
    *,
    scale: float,
    block_k: int,
    num_kv_blocks: int,
):
    b = pl.program_id(0)
    kb = pl.program_id(3)

    @pl.when(kb == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q_pos = q_pos_ref[b, :]  # (Bq,)
    kv_start = kb * block_k
    # Causal skip: this kv tile starts past every query position.
    q_pos_max = jnp.max(q_pos)

    @pl.when(kv_start <= q_pos_max)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)  # (Bq, D)
        k = k_ref[0, 0].astype(jnp.float32)  # (Bk, D)
        v = v_ref[0, 0].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (Bq, Bk)

        kv_pos = kv_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = (kv_pos <= q_pos[:, None]) & (kv_valid_ref[b, :][None, :] != 0)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scratch[:]  # (Bq, 1)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)

        p = jnp.exp(s - m_new)  # (Bq, Bk); rows with all-masked stay ~0
        alpha = jnp.exp(m_prev - m_new)  # (Bq, 1)

        l_scratch[:] = l_scratch[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_scratch[:] = m_new

    @pl.when(kb == num_kv_blocks - 1)
    def _finalize():
        l = l_scratch[:]
        # Fully-masked queries (padding) normalize against 1 instead of 0.
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scratch[:] / l_safe).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_k", "interpret"),
)
def flash_attention_gqa(
    q: jnp.ndarray,  # (B, Sq, Hq, D)
    k: jnp.ndarray,  # (B, T, Hkv, D)
    v: jnp.ndarray,  # (B, T, Hkv, D)
    q_positions: jnp.ndarray,  # (B, Sq) int32
    kv_valid: jnp.ndarray,  # (B, T) bool/int
    *,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jnp.ndarray:
    """Causal GQA flash attention. Returns (B, Sq, Hq, D) in q.dtype."""
    B, Sq, Hq, D = q.shape
    T, Hkv = k.shape[1], k.shape[2]
    group = Hq // Hkv
    scale = 1.0 / (D**0.5)

    block_q = min(block_q, max(Sq, 8))
    block_k = min(block_k, max(T, 128))

    # Pad sequence dims to block multiples (padding queries get position -1
    # so they attend nothing; padding keys get valid=0).
    Sq_p = -(-Sq // block_q) * block_q
    T_p = -(-T // block_k) * block_k
    if Sq_p != Sq:
        q = jnp.pad(q, ((0, 0), (0, Sq_p - Sq), (0, 0), (0, 0)))
        q_positions = jnp.pad(q_positions, ((0, 0), (0, Sq_p - Sq)), constant_values=-1)
    if T_p != T:
        k = jnp.pad(k, ((0, 0), (0, T_p - T), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, T_p - T), (0, 0), (0, 0)))
        kv_valid = jnp.pad(kv_valid, ((0, 0), (0, T_p - T)))

    # (B, H, S, D) layout for clean tiling.
    q_t = q.transpose(0, 2, 1, 3)
    k_t = k.transpose(0, 2, 1, 3)
    v_t = v.transpose(0, 2, 1, 3)
    q_positions = q_positions.astype(jnp.int32)
    kv_valid = kv_valid.astype(jnp.int32)

    num_q_blocks = Sq_p // block_q
    num_kv_blocks = T_p // block_k
    grid = (B, Hq, num_q_blocks, num_kv_blocks)

    kernel = functools.partial(
        _kernel, scale=scale, block_k=block_k, num_kv_blocks=num_kv_blocks
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                # Whole-batch rows per tile: TPU block rules require the
                # second-to-last dim to divide 8 or equal the array dim, so
                # (B, tile) with the row picked inside the kernel.
                pl.BlockSpec((B, block_q), lambda b, h, qb, kb: (0, qb)),
                pl.BlockSpec((B, block_k), lambda b, h, qb, kb: (0, kb)),
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, qb, kb: (b, h, qb, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, qb, kb: (b, h // group, kb, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, qb, kb: (b, h // group, kb, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, qb, kb: (b, h, qb, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, Sq_p, D), q.dtype),
        interpret=interpret,
    )(q_positions, kv_valid, q_t, k_t, v_t)

    return out.transpose(0, 2, 1, 3)[:, :Sq]
