"""Pallas decode attention: short queries against a LONG stored-dtype KV buffer.

The long-context serving bottleneck (BENCH_r04: 45 ms/tok at the 81920
envelope vs a ~15 ms/tok weights+KV roofline) was the XLA chunked-decode
path (`ops/attention.py:_decode_attention_chunked`): an fori_loop of tiny
einsums whose per-chunk cast + online-softmax bookkeeping ran far off the
HBM roofline. This kernel gives decode the same treatment the prefill
flash kernel got in round 4 (`ops/flash_attention.py`), with design
points measured on the v5e. (Measurement note: a single program execution
through the axon tunnel costs ~24 ms wall regardless of device time —
every per-call number here comes from 280-call in-program loops with the
floor subtracted, driven on CACHE-SHAPED loop carries, not loop-invariant
arrays, because XLA hoists layout conversions of invariants out of the
loop and flatters the kernel.)

- **Stored-dtype KV streaming**: k/v refs arrive in the CACHE dtype
  (fp8 e4m3 / bf16 / f32) and are decoded to the compute dtype PER TILE
  in VMEM — the whole-buffer O(T)-per-layer cast transient that forced
  the chunked XLA path to exist never materializes, and fp8 KV is read
  at 1 byte/element off HBM.
- **Manual fp8 decode, inside the kernel**: v5e has no native fp8 —
  XLA's `convert` of e4m3 emulates at ~50 VPU ops/element (~1.1 ms per
  layer per decode step on the 81920 arena, ~10x the DMA cost). The
  kernel bit-relocates e4m3 into f32 fields with ~6 native 32-bit VPU
  ops (widen, two masked shifts, or, bitcast, convert to bf16; 16-bit
  shifts/multiplies don't legalize on v5e), applied to the raw bytes of
  the f8 ref (in-kernel bitcast — an XLA-level f8->u8 bitcast on the
  cache costs a real pass over the buffer). The K path skips the 2^120
  exponent-rebase multiply: the query is pre-scaled by 2^120 outside the
  kernel and the MXU's f32 product exponents cancel exactly. Deviations
  from XLA's convert, documented and pinned in
  tests/test_decode_attention_kernel.py: e4m3 DENORMALS
  (|x| <= 0.013671875) flush to ZERO — the rebase reads an f32-denormal
  bit pattern and both TPU and XLA-CPU (FTZ) flush it (absolute error
  <= 2^-6 on values whose attention contribution is negligible, far
  smaller than the fixed-m clamp contract); e4m3fn NaN (0x7f/0xff)
  decodes to +-480 — KV caches never hold NaN. Normals are bit-exact.
- **Interleaved-row GQA: the cache's OWN byte order, one dot for all
  heads.** The (B, T, Hkv, D) cache is viewed as (B, T*Hkv, D) — a
  middle-dim merge with identical byte order — and each (blockC =
  block_k*Hkv, D) tile is consumed AS STORED: one
  (R2, D) x (D, blockC) dot scores every query row against every (t, h)
  key row, and the mask keeps only columns whose h matches the query
  row's head (plus validity + causality on t = col // Hkv). p @ v_tile
  then yields each row's true output directly. Alternatives measured on
  a mutated cache carry: per-head (1, block_k, 1, D) blocks don't
  lower (un-tileable trailing shape); (1, block_k, Hkv, D) blocks force
  sublane-padded VMEM tiles (0.59 ms/call); an XLA-level
  bitcast+reshape to (B, T, Hkv*D) costs a full extra pass over the
  buffer per call (1.1 ms/call). The interleaved view runs 0.37 ms/call
  in cache-carry context and 0.15 ms/call standalone — the residual
  ~0.2 ms is the while-loop carry's layout copy at the custom-call
  boundary, removable only by storing the arena merged. KV traffic is
  the GQA minimum: 2*T*Hkv*D*itemsize per layer, each tile fetched from
  HBM exactly once for all heads.
- **Fixed-m inference softmax**: decode is inference-only (no vjp), so
  the kernel skips the online max/rescale entirely — `p = exp(min(s, 60))`
  accumulated in f32, normalized once at the end (see
  `ops/flash_attention.py` for the clamp/underflow contract; logits are
  O(30) for real models and `O3V_ATTN_IMPL=xla` is the escape hatch).

Net effect at the 81920-token fp8 arena: ~0.37 ms/layer/step in-engine
vs ~1.24 ms for a per-head kernel with XLA's emulated cast — the
28-layer decode attention drops from ~35 ms to ~10 ms per token, next
to an ~11.6 ms int8 weight stream.

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


def _decode_tile(x, compute_dtype, stored_fp8: bool, rebase: bool):
    """Decode one loaded KV tile to the compute dtype (see module doc)."""
    if not stored_fp8:
        return x.astype(compute_dtype)
    u8 = jax.lax.bitcast_convert_type(x, jnp.uint8)
    u32 = u8.astype(jnp.uint32)  # zero-extended byte
    bits = ((u32 & 0x7F) << 20) | ((u32 & 0x80) << 24)
    y = jax.lax.bitcast_convert_type(bits, jnp.float32)  # true * 2^-120
    if rebase:
        y = y * jnp.float32(2.0 ** 120)
    return y.astype(compute_dtype)


def _decode_kernel(qpos_ref, valid_ref, q_ref, k_ref, v_ref, o_ref,
                   acc_ref, l_ref, *, block_k: int, T: int, Hkv: int,
                   R_p: int, D: int, compute_dtype, stored_fp8: bool,
                   stacked: bool = False):
    blockC = block_k * Hkv
    kb = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        l_ref[...] = jnp.zeros_like(l_ref)

    # (blockC, D) rows interleaved (t, h), exactly as the cache stores
    # them. K stays scaled by 2^-120 under fp8 — the wrapper pre-scales q
    # by 2^120 and the MXU's f32 product exponents cancel exactly.
    k_tile = k_ref[0, 0] if stacked else k_ref[0]
    v_tile = v_ref[0, 0] if stacked else v_ref[0]
    k = _decode_tile(k_tile, compute_dtype, stored_fp8, rebase=False)
    v = _decode_tile(v_tile, compute_dtype, stored_fp8, rebase=True)

    cidx = jax.lax.broadcasted_iota(jnp.int32, (1, blockC), 1)
    t_of = kb * block_k + cidx // Hkv  # global t of each key row
    h_of = cidx - (cidx // Hkv) * Hkv  # its kv head
    # valid arrives pre-expanded to (t, h) rows (wrapper: repeat x Hkv)
    col_ok = (t_of < T) & (valid_ref[0, 0][None, :] != 0)  # (1, blockC)
    qpos = qpos_ref[0, 0]  # (R2,) int32; pad rows carry -1 -> fully masked
    R2 = q_ref.shape[1]  # block shape is static at trace time
    rows_h = jax.lax.broadcasted_iota(jnp.int32, (R2, 1), 0) // R_p
    mask = col_ok & (t_of <= qpos[:, None]) & (h_of == rows_h)
    # Column-vector validity for zeroing v's masked sublanes (a bf16/f32
    # cache's uninitialized tail could hold NaN patterns; 0 * NaN would
    # poison the p@v dot). Built from 32-bit values: Mosaic only supports
    # non-no-op minor-dim insertion for 32-bit types.
    cidxc = jax.lax.broadcasted_iota(jnp.int32, (blockC, 1), 0)
    t_col = kb * block_k + cidxc // Hkv
    vcol = (t_col < T) & (valid_ref[0, 0].reshape(blockC, 1) != 0)
    v = jnp.where(vcol, v, 0)

    q = q_ref[0]  # (R2, D) head-major query rows, PRE-SCALED by 1/sqrt(D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (R2, blockC)
    p = jnp.where(mask, jnp.exp(jnp.minimum(s, LOGIT_CLAMP)), 0.0)
    l_ref[...] += jnp.broadcast_to(
        jnp.sum(p, axis=1, keepdims=True), l_ref.shape
    )
    acc_ref[...] += jax.lax.dot_general(
        p.astype(compute_dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (R2, D): cross-head columns are masked, so rows are already exact

    @pl.when(kb == nk - 1)
    def _finalize():
        l = l_ref[...]  # (R2, D) — every lane holds the row sum
        o_ref[0] = (acc_ref[...] / jnp.where(l == 0.0, 1.0, l)).astype(
            o_ref.dtype
        )


@functools.partial(jax.jit, static_argnames=("block_k", "interpret", "layer"))
def decode_attention_gqa(
    q: jnp.ndarray,  # (B, S, Hq, D) compute dtype, S <= 8
    k: jnp.ndarray,  # (B, T, Hkv, D) STORED cache dtype — or the STACKED
    v: jnp.ndarray,  # (L, B, T, Hkv, D) cache with `layer` set (see below)
    q_positions: jnp.ndarray,  # (B, S) int32 buffer-space positions
    kv_valid: jnp.ndarray,  # (B, T) slot validity (bool or int)
    *,
    block_k: int = 1024,
    interpret: bool = False,
    layer: int | None = None,
) -> jnp.ndarray:
    """``layer`` (static): k/v are the model's full stacked
    (L, B, T, Hkv, D) cache and the kernel reads only that layer's blocks
    via its index map. This exists because a custom call's operands must
    be whole buffers — passing `cache[layer]` materializes an O(T) slice
    copy PER LAYER per decode step (~11 ms/token at the 81920 arena),
    while the stacked operand is the carried buffer itself."""
    B, S, Hq, D = q.shape
    if layer is None:
        T, Hkv = k.shape[1], k.shape[2]
    else:
        T, Hkv = k.shape[2], k.shape[3]
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
    # query rows head-major: head h occupies rows h*R_p .. h*R_p + R - 1
    qg = (
        q.transpose(0, 2, 1, 3)  # (B, Hq, S, D)
        .reshape(B, Hkv, group * S, D)
    )
    R = group * S
    R_p = -(-R // 8) * 8
    if R_p != R:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, R_p - R), (0, 0)))
    R2 = Hkv * R_p
    q2 = qg.reshape(B, R2, D)
    qpos = jnp.broadcast_to(
        q_positions.astype(jnp.int32)[:, None, :], (B, group, S)
    ).reshape(B, R)
    if R_p != R:
        qpos = jnp.pad(qpos, ((0, 0), (0, R_p - R)), constant_values=-1)
    qpos_hm = jnp.tile(qpos, (1, Hkv))  # (B, R2) head-major rows

    # cache's own byte order: (..., T, Hkv, D) -> (..., T*Hkv, D) is a
    # middle-dim merge (free view); valid expands to the same row space
    blockC = block_k * Hkv
    if layer is None:
        kr = k.reshape(B, T * Hkv, D)
        vr = v.reshape(B, T * Hkv, D)
        kv_spec = pl.BlockSpec((1, blockC, D), lambda b, kb: (b, kb, 0))
    else:
        L = k.shape[0]
        kr = k.reshape(L, B, T * Hkv, D)
        vr = v.reshape(L, B, T * Hkv, D)
        kv_spec = pl.BlockSpec(
            (1, 1, blockC, D), lambda b, kb: (layer, b, kb, 0)
        )
    kv_specs = [kv_spec, kv_spec]
    valid_e = jnp.repeat(kv_valid.astype(jnp.int32), Hkv, axis=1)
    nk = -(-T // block_k)
    out = pl.pallas_call(
        functools.partial(
            _decode_kernel, block_k=block_k, T=T, Hkv=Hkv, R_p=R_p, D=D,
            compute_dtype=compute_dtype, stored_fp8=stored_fp8,
            stacked=layer is not None,
        ),
        grid=(B, nk),
        in_specs=[
            pl.BlockSpec((1, 1, R2), lambda b, kb: (b, 0, 0)),
            pl.BlockSpec((1, 1, blockC), lambda b, kb: (b, 0, kb)),
            pl.BlockSpec((1, R2, D), lambda b, kb: (b, 0, 0)),
        ] + kv_specs,
        out_specs=pl.BlockSpec((1, R2, D), lambda b, kb: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, R2, D), compute_dtype),
        scratch_shapes=[
            pltpu.VMEM((R2, D), jnp.float32),
            pltpu.VMEM((R2, D), jnp.float32),
        ],
        interpret=interpret,
    )(qpos_hm[:, None, :], valid_e[:, None, :], q2, kr, vr)
    out = out.reshape(B, Hkv, R_p, D)[:, :, :R, :]
    out = out.reshape(B, Hkv, group, S, D)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, S, Hq, D)
