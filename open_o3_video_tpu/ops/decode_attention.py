"""Pallas decode attention: short queries against a LONG stored-dtype KV buffer.

The long-context serving bottleneck (BENCH_r04: 45 ms/tok at the 81920
envelope vs a ~15 ms/tok weights+KV roofline) was the XLA chunked-decode
path (`ops/attention.py:_decode_attention_chunked`): an fori_loop of tiny
einsums whose per-chunk cast + online-softmax bookkeeping ran far off the
HBM roofline. This kernel gives decode the same treatment the prefill
flash kernel got in round 4 (`ops/flash_attention.py`), with two extra
design points measured on the v5e (all timings below are floor-corrected:
a single program execution through the axon tunnel costs ~24 ms wall
regardless of device time, so per-call numbers come from 280-call
in-program loops):

- **Stored-dtype KV streaming**: k/v refs arrive in the CACHE dtype
  (fp8 e4m3 / bf16 / f32) and are decoded to the compute dtype PER TILE
  in VMEM — the whole-buffer O(T)-per-layer cast transient that forced
  the chunked XLA path to exist never materializes, and fp8 KV is read
  at 1 byte/element off HBM. Mosaic's automatic block pipelining streams
  the (block_k, Hkv*D) tiles at 480-730 GB/s — a manually double-buffered
  DMA ring was tried and measured SLOWER (0.26 vs 0.17 ms/layer), so the
  automatic spec stays.
- **Manual fp8 decode**: v5e has no native fp8 — XLA's `convert` of
  e4m3 emulates at ~50 VPU ops/element, which measured ~1.1 ms per layer
  per decode step on the 81920 arena (the cast alone ~10x the DMA cost).
  The kernel instead bit-relocates e4m3 into f32 fields with ~6 native
  32-bit VPU ops (widen, two masked shifts, or, bitcast, convert to
  bf16; 16-bit shifts/multiplies don't legalize on v5e). The K path even
  skips the 2^120 exponent-rebase multiply: the query is pre-scaled by
  2^120 outside the kernel and the MXU's f32 product exponents cancel
  exactly. Deviations from XLA's convert, both documented and
  pinned in tests/test_decode_attention_kernel.py: e4m3 DENORMALS
  (|x| <= 0.013671875) flush to zero — the rebase multiply reads a
  bf16-denormal bit pattern and TPUs flush denormal inputs (an absolute
  error <= 2^-6 on values whose attention contribution is already
  negligible, and far smaller than the fixed-m clamp contract); e4m3fn
  NaN (0x7f/0xff) decodes to +-480 — KV caches never hold NaN. All
  normal values decode bit-exactly.
- **Block-diagonal GQA: one MXU dot for ALL heads.** Per-head lane
  slices of a (block_k, Hkv*D) tile ran 2*Hkv latency-bound
  (8, 128)x(128, block_k) dots plus per-head VMEM slice copies per tile.
  Instead the wrapper builds a block-diagonal query (R2=Hkv*R_p rows,
  head h's rows occupy lane slice h*D:(h+1)*D, zeros elsewhere), so one
  (R2, Hkv*D)x(Hkv*D, block_k) dot computes every head's scores — the
  zero lanes contract away. p @ v_tile then fills (R2, Hkv*D) where row
  r of head h holds its true output in lane slice h*D:(h+1)*D (other
  lanes are cross-head garbage, never read): the finalize step extracts
  the per-head slices once. KV traffic is the GQA minimum:
  2*T*Hkv*D*itemsize per layer, each tile fetched from HBM exactly once
  for all heads.
- **Fixed-m inference softmax**: decode is inference-only (no vjp), so
  the kernel skips the online max/rescale entirely — `p = exp(min(s, 60))`
  accumulated in f32, normalized once at the end (see
  `ops/flash_attention.py` for the clamp/underflow contract; logits are
  O(30) for real models and `O3V_ATTN_IMPL=xla` is the escape hatch).

Net effect at the 81920-token fp8 arena: 0.17 ms/layer/step (485 GB/s
effective KV stream incl. decode) vs ~1.24 ms for the original per-head
kernel with XLA's emulated cast — the 28-layer decode attention drops
from ~35 ms to ~5 ms per token, next to an ~11.6 ms int8 weight stream.

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


def _decode_tile(ref, compute_dtype, stored_fp8: bool, rebase: bool):
    """Load one (block_k, Hkv*D) tile and decode to the compute dtype.

    fp8 tiles arrive bitcast to uint8 (see wrapper) and are decoded with
    native 32-bit ops (16-bit shifts/multiplies don't legalize on v5e
    Mosaic): relocate sign/exponent/mantissa into f32 fields, bitcast,
    convert to bf16 — the result is the true value scaled by 2^-120
    (e4m3 bias 7 vs f32 bias 127). ``rebase=True`` multiplies the scale
    back in (exact); the K path instead leaves it folded into the
    pre-scaled query (see wrapper), saving one f32 op per element on the
    hot path. Everything else is a plain (cheap) convert."""
    x = ref[0]
    if not stored_fp8:
        return x.astype(compute_dtype)
    u32 = x.astype(jnp.uint32)  # zero-extended byte
    bits = ((u32 & 0x7F) << 20) | ((u32 & 0x80) << 24)
    y = jax.lax.bitcast_convert_type(bits, jnp.float32)  # true * 2^-120
    if rebase:
        y = y * jnp.float32(2.0 ** 120)
    return y.astype(compute_dtype)


def _decode_kernel(qpos_ref, valid_ref, q_ref, k_ref, v_ref, o_ref,
                   acc_ref, l_ref, *, block_k: int, T: int, Hkv: int,
                   R_p: int, D: int, compute_dtype, stored_fp8: bool):
    kb = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        l_ref[...] = jnp.zeros_like(l_ref)

    # (block_k, Hkv*D); K stays scaled by 2^-120 under fp8 — the wrapper
    # pre-scales q by 2^120, and the MXU's f32 product exponents cancel
    # exactly, so the logits are unchanged.
    k = _decode_tile(k_ref, compute_dtype, stored_fp8, rebase=False)
    v = _decode_tile(v_ref, compute_dtype, stored_fp8, rebase=True)

    idx = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
    col_ok = (idx < T) & (valid_ref[0, 0][None, :] != 0)  # (1, block_k)
    qpos = qpos_ref[0, 0]  # (R2,) int32; pad rows carry -1 -> fully masked
    mask = col_ok & (idx <= qpos[:, None])  # (R2, block_k)
    # Column-vector validity for zeroing v's masked sublanes (a bf16/f32
    # cache's uninitialized tail could hold NaN patterns; 0 * NaN would
    # poison the p@v dot). Built from 32-bit values: Mosaic only supports
    # non-no-op minor-dim insertion for 32-bit types, so the i1 row mask
    # can't be transposed.
    idx_col = kb * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_k, 1), 0
    )
    vcol = (idx_col < T) & (valid_ref[0, 0].reshape(block_k, 1) != 0)
    v = jnp.where(vcol, v, 0)

    q = q_ref[0]  # (R2, Hkv*D) block-diagonal, PRE-SCALED by 1/sqrt(D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (R2, block_k)
    p = jnp.where(mask, jnp.exp(jnp.minimum(s, LOGIT_CLAMP)), 0.0)
    l_ref[...] += jnp.broadcast_to(
        jnp.sum(p, axis=1, keepdims=True), l_ref.shape
    )
    acc_ref[...] += jax.lax.dot_general(
        p.astype(compute_dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (R2, Hkv*D): row r of head h is valid only in lanes h*D:(h+1)*D

    @pl.when(kb == nk - 1)
    def _finalize():
        l = l_ref[...]  # (R2, D) — every lane holds the row sum
        for hk in range(Hkv):  # static per-head extraction, once per b
            r0 = hk * R_p
            o_ref[0, hk] = (
                acc_ref[r0:r0 + R_p, hk * D:(hk + 1) * D]
                / jnp.where(l[r0:r0 + R_p] == 0.0, 1.0, l[r0:r0 + R_p])
            ).astype(o_ref.dtype)


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

    stored_fp8 = k.dtype == jnp.float8_e4m3fn
    scale = 1.0 / (D ** 0.5)
    if stored_fp8:
        # fold the kernel's skipped 2^120 K-decode rebase into q: bf16
        # exponents add exactly in the MXU's f32 products, and |q| * 2^120
        # stays far below bf16 max (2^127-ish) for softmax-scaled queries.
        scale = scale * (2.0 ** 120)
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

    # Block-diagonal query: head h's R_p rows live in lane slice
    # h*D:(h+1)*D so one dot against the full (block_k, Hkv*D) tile
    # computes every head (see module docstring). R2 x Hkv*D is tiny
    # (<= 256 x 512 bf16 = 256 KB).
    HD = Hkv * D
    R2 = Hkv * R_p
    q_bd = jnp.zeros((B, R2, HD), compute_dtype)
    for h in range(Hkv):
        q_bd = q_bd.at[:, h * R_p:(h + 1) * R_p, h * D:(h + 1) * D].set(
            qg[:, h]
        )
    qpos_bd = jnp.tile(qpos, (1, Hkv))  # (B, R2), head-major rows

    # head/lane collapse: contiguous (B, T, Hkv, D) -> (B, T, Hkv*D) is a
    # free view, so the kernel streams ONE tile per (b, kb) for all heads.
    if stored_fp8:
        # the kernel decodes e4m3 with native int ops; hand it raw bytes
        kr = jax.lax.bitcast_convert_type(k, jnp.uint8).reshape(B, T, HD)
        vr = jax.lax.bitcast_convert_type(v, jnp.uint8).reshape(B, T, HD)
    else:
        kr = k.reshape(B, T, HD)
        vr = v.reshape(B, T, HD)

    nk = -(-T // block_k)
    out = pl.pallas_call(
        functools.partial(
            _decode_kernel, block_k=block_k, T=T, Hkv=Hkv, R_p=R_p, D=D,
            compute_dtype=compute_dtype, stored_fp8=stored_fp8,
        ),
        grid=(B, nk),
        in_specs=[
            pl.BlockSpec((1, 1, R2), lambda b, kb: (b, 0, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, kb: (b, 0, kb)),
            pl.BlockSpec((1, R2, HD), lambda b, kb: (b, 0, 0)),
            pl.BlockSpec((1, block_k, HD), lambda b, kb: (b, kb, 0)),
            pl.BlockSpec((1, block_k, HD), lambda b, kb: (b, kb, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hkv, R_p, D), lambda b, kb: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, R_p, D), compute_dtype),
        scratch_shapes=[
            pltpu.VMEM((R2, HD), jnp.float32),
            pltpu.VMEM((R2, D), jnp.float32),
        ],
        interpret=interpret,
    )(qpos_bd[:, None, :], kv_valid.astype(jnp.int32)[:, None, :],
      q_bd, kr, vr)
    out = out[:, :, :R, :].reshape(B, Hkv, group, S, D)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, S, Hq, D)
