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
- **One KV stream for all heads**: the (Hkv, D) head/lane dims are
  collapsed into the lane axis, so each (block_k, Hkv*D) tile is fetched
  from HBM ONCE and every KV head's slice is consumed inside the kernel
  (per-head static lane slices at 128-aligned offsets). Combined with
  GQA-grouped query rows (group=7 q heads per kv head on the 7B), KV
  traffic is the GQA minimum: 2 * T * Hkv * D * itemsize per layer.
  The head-collapsed layout is also what Mosaic's block-shape rule
  requires: a per-head (1, block_k, 1, D) block of the native
  (B, T, Hkv, D) cache has an un-tileable (1, D) trailing shape, while
  (block_k, Hkv*D) tiles are (8k-multiple, 128-multiple) aligned.
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
                   acc_ref, l_ref, *, block_k: int, T: int, Hkv: int,
                   D: int, compute_dtype):
    kb = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        l_ref[...] = jnp.zeros_like(l_ref)

    kv_k = k_ref[0]  # (block_k, Hkv*D) STORED dtype
    kv_v = v_ref[0]
    idx = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
    col_ok = (idx < T) & (valid_ref[0, 0][None, :] != 0)  # (1, block_k)
    qpos = qpos_ref[0, 0]  # (R_p,) int32; pad rows carry -1 -> fully masked
    mask = col_ok & (idx <= qpos[:, None])  # (R_p, block_k)
    # Column-vector validity for zeroing v's masked sublanes (0 * NaN would
    # poison the p@v dot). Built from 32-bit values: Mosaic only supports
    # non-no-op minor-dim insertion (the (block_k,) -> (block_k, 1)
    # reshape) for 32-bit types, so the i1 mask can't be transposed.
    idx_col = kb * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_k, 1), 0
    )
    vcol = (idx_col < T) & (valid_ref[0, 0].reshape(block_k, 1) != 0)

    for hk in range(Hkv):  # unrolled: every head reuses the SAME kv tile
        q = q_ref[0, hk]  # (R_p, D) compute dtype, PRE-SCALED by 1/sqrt(D)
        k = kv_k[:, hk * D:(hk + 1) * D].astype(compute_dtype)
        v = kv_v[:, hk * D:(hk + 1) * D].astype(compute_dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (R_p, block_k)
        p = jnp.where(mask, jnp.exp(jnp.minimum(s, LOGIT_CLAMP)), 0.0)
        l_ref[hk] += jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_ref[hk].shape
        )
        # zero masked v sublanes defensively: the tail tile's out-of-range
        # columns are uninitialized memory (see vcol above).
        v = jnp.where(vcol, v, 0)
        acc_ref[hk] += jax.lax.dot_general(
            p.astype(compute_dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kb == nk - 1)
    def _finalize():
        l = l_ref[...]  # (Hkv, R_p, D) — every lane holds the row sum
        o_ref[0] = (acc_ref[...] / jnp.where(l == 0.0, 1.0, l)).astype(
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

    # head/lane collapse: contiguous (B, T, Hkv, D) -> (B, T, Hkv*D) is a
    # free view, so the kernel streams ONE tile per (b, kb) for all heads.
    kr = k.reshape(B, T, Hkv * D)
    vr = v.reshape(B, T, Hkv * D)

    nk = -(-T // block_k)
    grid = (B, nk)
    out = pl.pallas_call(
        functools.partial(
            _decode_kernel, block_k=block_k, T=T, Hkv=Hkv, D=D,
            compute_dtype=compute_dtype,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, R_p), lambda b, kb: (b, 0, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, kb: (b, 0, kb)),
            pl.BlockSpec((1, Hkv, R_p, D), lambda b, kb: (b, 0, 0, 0)),
            pl.BlockSpec((1, block_k, Hkv * D), lambda b, kb: (b, kb, 0)),
            pl.BlockSpec((1, block_k, Hkv * D), lambda b, kb: (b, kb, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hkv, R_p, D), lambda b, kb: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, R_p, D), compute_dtype),
        scratch_shapes=[
            pltpu.VMEM((Hkv, R_p, D), jnp.float32),
            pltpu.VMEM((Hkv, R_p, D), jnp.float32),
        ],
        interpret=interpret,
    )(qpos[:, None, :], kv_valid.astype(jnp.int32)[:, None, :], qg, kr, vr)
    out = out[:, :, :R, :].reshape(B, Hkv, group, S, D)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, S, Hq, D)
