"""Pallas decode attention: short queries against a LONG stored-dtype KV buffer.

The long-context serving bottleneck (BENCH_r04: 45 ms/tok at the 81920
envelope vs a ~15 ms/tok weights+KV roofline) was the XLA chunked-decode
path (`ops/attention.py:_decode_attention_chunked`): an fori_loop of tiny
einsums whose per-chunk cast + online-softmax bookkeeping ran far off the
HBM roofline. This kernel gives decode the same treatment the prefill
flash kernel got in round 4 (`ops/flash_attention.py`):

- **Stored-dtype KV streaming**: k/v refs arrive in the CACHE dtype
  (fp8 e4m3 / bf16 / f32) and are cast to the compute dtype PER TILE in
  VMEM — the whole-buffer O(T)-per-layer cast transient that forced the
  chunked XLA path to exist never materializes, and fp8 KV is read at
  1 byte/element off HBM.
- **GQA-grouped rows**: all `group * S` query rows of one KV head share
  each streamed KV tile (group=7 q heads per kv head on the 7B), so KV
  traffic is the GQA minimum: 2 * T * Hkv * D * itemsize per layer.
- **Fixed-m inference softmax**: decode is inference-only (no vjp), so
  the kernel skips the online max/rescale entirely — `p = exp(min(s, 60))`
  accumulated in f32, normalized once at the end (see
  `ops/flash_attention.py` for the clamp/underflow contract; logits are
  O(30) for real models and `O3V_ATTN_IMPL=xla` is the escape hatch).

Reference counterpart: vLLM's paged-attention CUDA decode kernels
(SURVEY §2.3); the serving contract is /root/reference/eval/
inference_example.py:18 (max_model_len=81920).

Causality follows the repo-wide cache-layout invariant: kv buffer index
== kv position for every written decode column (see
`ops/attention.py:113`), so the mask is `buffer_idx <= q_position` AND
the slot-validity mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOGIT_CLAMP = 60.0


def _decode_kernel(qpos_ref, valid_ref, q_ref, k_ref, v_ref, o_ref,
                   acc_ref, l_ref, *, block_k: int, T: int,
                   compute_dtype):
    kb = pl.program_id(2)
    nk = pl.num_programs(2)
    R, D = q_ref.shape[2], q_ref.shape[3]

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0, 0]  # (R, D) compute dtype, PRE-SCALED by 1/sqrt(D)
    k = k_ref[0, :, 0, :].astype(compute_dtype)  # (block_k, D) tile-local cast
    v = v_ref[0, :, 0, :].astype(compute_dtype)

    # mask: global kv index in-range + slot valid + causal vs per-row q pos
    idx = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
    col_ok = (idx < T) & (valid_ref[...] != 0)  # (1, block_k)
    qpos = qpos_ref[0, :]  # (R,) int32; pad rows carry -1 -> fully masked
    mask = col_ok & (idx <= qpos[:, None])  # (R, block_k)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (R, block_k)
    p = jnp.where(mask, jnp.exp(jnp.minimum(s, LOGIT_CLAMP)), 0.0)
    l_ref[...] += jnp.sum(p, axis=1, keepdims=True)
    # zero masked v lanes defensively: the tail tile's out-of-range columns
    # are uninitialized memory; 0 * NaN would poison the dot.
    v = jnp.where(col_ok.reshape(block_k, 1) != 0, v, 0)
    acc_ref[...] += jax.lax.dot_general(
        p.astype(compute_dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kb == nk - 1)
    def _finalize():
        l = l_ref[...]
        o_ref[0, 0] = (acc_ref[...] / jnp.where(l == 0.0, 1.0, l)).astype(
            o_ref.dtype
        )


@functools.partial(jax.jit, static_argnames=("block_k", "interpret"))
def decode_attention_gqa(
    q: jnp.ndarray,  # (B, S, Hq, D) compute dtype, S <= 8
    k: jnp.ndarray,  # (B, T, Hkv, D) STORED cache dtype (fp8/bf16/f32)
    v: jnp.ndarray,  # (B, T, Hkv, D)
    q_positions: jnp.ndarray,  # (B, S) int32 buffer-space positions
    kv_valid: jnp.ndarray,  # (B, T) slot validity (bool or int)
    *,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    B, S, Hq, D = q.shape
    T, Hkv = k.shape[1], k.shape[2]
    group = Hq // Hkv
    compute_dtype = q.dtype

    scale = 1.0 / (D ** 0.5)
    q = (q * scale).astype(compute_dtype)
    # rows = (group, S) per kv head; pad to the sublane quantum
    qg = (
        q.transpose(0, 2, 1, 3)  # (B, Hq, S, D)
        .reshape(B, Hkv, group * S, D)
    )
    R = group * S
    R_p = -(-R // 8) * 8
    if R_p != R:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, R_p - R), (0, 0)))
    qpos = jnp.broadcast_to(
        q_positions.astype(jnp.int32)[:, None, :], (B, group, S)
    ).reshape(B, R)
    if R_p != R:
        qpos = jnp.pad(qpos, ((0, 0), (0, R_p - R)), constant_values=-1)

    nk = -(-T // block_k)
    grid = (B, Hkv, nk)
    out = pl.pallas_call(
        functools.partial(
            _decode_kernel, block_k=block_k, T=T, compute_dtype=compute_dtype
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R_p), lambda b, hk, kb: (b, 0)),
            pl.BlockSpec((1, block_k), lambda b, hk, kb: (b, kb)),
            pl.BlockSpec((1, 1, R_p, D), lambda b, hk, kb: (b, hk, 0, 0)),
            pl.BlockSpec((1, block_k, 1, D), lambda b, hk, kb: (b, kb, hk, 0)),
            pl.BlockSpec((1, block_k, 1, D), lambda b, hk, kb: (b, kb, hk, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, R_p, D), lambda b, hk, kb: (b, hk, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, R_p, D), compute_dtype),
        scratch_shapes=[
            pltpu.VMEM((R_p, D), jnp.float32),
            pltpu.VMEM((R_p, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qpos, kv_valid.astype(jnp.int32), qg, k, v)
    out = out[:, :, :R, :].reshape(B, Hkv, group, S, D)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, S, Hq, D)
