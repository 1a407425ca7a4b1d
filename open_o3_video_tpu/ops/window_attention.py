"""Pallas TPU kernel for ViT windowed (segment) attention.

The vision tower's attention runs over many small independent segments —
8x8-patch windows of W=64 tokens (or whole frames, W=h*w, for the global
layers) — batched as (N, W, H, D) with a padding mask. The XLA lowering of
this shape is ~2% efficient on TPU: W=64/D=80 matmuls use a quarter of an
MXU tile, and the (N, H, W, W) float32 softmax intermediates round-trip
HBM between every fused region. Measured on v5e at the bench geometry
(S=61440 patches, 32 blocks), the attention mechanism cost ~780 ms against
~590 ms for ALL of the tower's linear layers (67% MFU) — despite carrying
~1% of the FLOPs.

This kernel keeps whole windows resident in VMEM: one program computes
scores + masked softmax + the value contraction for a (block_windows x
block_heads) tile, so HBM sees exactly one read of q/k/v and one write of
the output per layer. No online softmax is needed — a full window always
fits in VMEM — which also makes the backward an exact in-VMEM recompute
(dv/dp/ds/dq/dk per window), FlashAttention-style but without the LSE
plumbing. Replaces the varlen cu_seqlens FlashAttention calls of the
reference's HF vision tower (SURVEY §2.3; window partition at
transformers Qwen2.5-VL get_window_index).

Layout contract: q/k/v (N, W, H, D), valid (N, W) — ``segment_attention``'s
native shapes. ``valid`` is either a bool padding mask or int32 SEGMENT IDS
(0 = pad): tokens attend iff their ids match and are nonzero, which lets the
packed window layout place several small edge windows in one W-token row
(VisionSpec packing — cuts pad inflation from ~33% to ~4% at production
grids). A bool mask is the special case of ids in {0, 1}. Padded rows
(id == 0) produce garbage outputs that the caller's scatter-back never
reads; masked softmax uses a finite NEG_INF so fully-masked rows stay
NaN-free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG_INF = -0.7 * float(np.finfo(np.float32).max)

import contextlib
import contextvars
import os

_VMEM_BUDGET = int(os.environ.get("O3V_WINATTN_VMEM_MB", "8")) * 1024 * 1024
# Hard ceiling for a single (gn=1, gh=1) program tile of the un-fused
# kernel. _block_shape shrinks the grid but never splits W inside a
# window, so one oversized whole-frame segment cannot compile at all.
# Measured on v5e: W=1920 (tile ~31 MB) compiles, W=2047 (~36 MB) fails
# Mosaic — 24 MB keeps margin. Beyond it segment_attention falls back to
# the XLA path (which handled these shapes before the kernel existed).
_MAX_TILE = int(os.environ.get("O3V_WINATTN_MAX_TILE_MB", "24")) * 1024 * 1024

# Inference-scope flag: the backward holds ~2x the tensors, so the fused
# eligibility check is conservative by default. Serving paths (the engine)
# never differentiate the tower — inside this scope the fits check uses
# the forward-only footprint, fusing frame-sized segments the bwd budget
# would reject. ContextVar (not os.environ) so a GSPO process can serve
# rollouts with the relaxed budget while its training trace, built outside
# the scope, keeps the backward-safe one.
_INFERENCE_SCOPE = contextvars.ContextVar("o3v_vit_inference", default=False)


@contextlib.contextmanager
def vit_inference_scope():
    """Trace vision towers without backward-VMEM headroom (serving only)."""
    token = _INFERENCE_SCOPE.set(True)
    try:
        yield
    finally:
        _INFERENCE_SCOPE.reset(token)


def window_attention_fits(w: int, h: int, d: int) -> bool:
    """Whether the un-fused kernel can compile at segment width ``w``."""
    d_pad = max(d, 128)
    w_pad = max(w, 128)
    per_wh = 4 * w * d_pad * 2 + 2 * w * w_pad * 4
    return per_wh <= _MAX_TILE


def _block_shape(n: int, w: int, h: int, d: int) -> tuple[int, int]:
    """(block_windows, block_heads) sized to the VMEM budget.

    Accounts for Mosaic lane padding: last dims pad to 128 lanes, so a
    (.., W, D) tile costs W * max(D, 128) lanes regardless of D=80."""
    d_pad = max(d, 128)
    w_pad = max(w, 128)
    # per (window, head): q+k+v+o bf16 tiles + two f32 score tiles
    per_wh = 4 * w * d_pad * 2 + 2 * w * w_pad * 4
    gn_gh = max(1, _VMEM_BUDGET // per_wh)
    gh = h
    while gh > 1 and (h % gh or gh > gn_gh):
        gh -= 1
    gn = max(1, min(n, gn_gh // gh))
    return gn, gh


def _seg_mask(val, gn, gh, w):
    """(Gn, 1, W) int32 segment ids -> (Gn*Gh, Wq, Wk) bool attention mask.

    Pairwise id equality (nonzero) — for 0/1 ids this reduces to the plain
    key-side padding mask; distinct ids keep packed windows independent."""
    g = jnp.broadcast_to(val, (gn, gh, w)).reshape(gn * gh, w)
    return (g[:, :, None] == g[:, None, :]) & (g[:, None, :] != 0)


def _fwd_kernel(valid_ref, q_ref, k_ref, v_ref, o_ref, *, scale, exact):
    # Mosaic matmuls support one batch dim: fold (Gn, Gh) -> B.
    gn, gh, w, d = q_ref.shape
    b = gn * gh
    q = q_ref[...].reshape(b, w, d)
    k = k_ref[...].reshape(b, w, d)
    v = v_ref[...].reshape(b, w, d)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (B, Wq, Wk)
    s = jnp.where(_seg_mask(valid_ref[...], gn, gh, w), s, NEG_INF)
    if exact:
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / l).astype(v.dtype)
        o = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    else:
        # Fixed m == 0 (see ops/flash_attention.py _fwd_kernel): the max
        # tree and the per-element subtract are pure VPU cost; a 60.0 clamp
        # keeps exp/l/acc far from overflow (p <= e^60 ~ 1e26, bf16 max
        # 3.4e38; real attention logits are O(30)). Normalization moves
        # AFTER the value dot so exp feeds the MXU directly. Fully-masked
        # pad rows have l == 0 (exp(NEG_INF) == 0) -> guarded to emit 0,
        # not NaN, so pad lanes stay finite through later layers.
        #
        # Underflow side of the contract: a VALID row whose logits are ALL
        # below ~-87 (exp underflows f32 to 0) also hits l == 0 and emits 0
        # where exact shift-invariant softmax would return a weighted
        # average. Post-rope ViT logits are O(+-30) so this envelope is
        # unreachable in practice; training and O3V_ATTN_IMPL=xla use the
        # exact max-subtracted softmax, which has no such envelope.
        p = jnp.exp(jnp.minimum(s, 60.0))
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o = o / jnp.where(l == 0.0, 1.0, l)
    o_ref[...] = o.reshape(gn, gh, w, d).astype(o_ref.dtype)


def _bwd_kernel(valid_ref, q_ref, k_ref, v_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale):
    gn, gh, w, d = q_ref.shape
    b = gn * gh
    q = q_ref[...].reshape(b, w, d)
    k = k_ref[...].reshape(b, w, d)
    v = v_ref[...].reshape(b, w, d)
    do = do_ref[...].reshape(b, w, d).astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    s = jnp.where(_seg_mask(valid_ref[...], gn, gh, w), s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    p = e / l  # (B, Wq, Wk) f32
    # dv = p^T do : contract over the query axis (1)
    dv = jax.lax.dot_general(
        p.astype(do.dtype), do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # dp = do v^T : contract over D
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    dq = jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # dk = ds^T q : contract over the query axis (1)
    dk = jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dq_ref[...] = dq.reshape(gn, gh, w, d).astype(dq_ref.dtype)
    dk_ref[...] = dk.reshape(gn, gh, w, d).astype(dk_ref.dtype)
    dv_ref[...] = dv.reshape(gn, gh, w, d).astype(dv_ref.dtype)


def _prep(q, gn):
    """(N, W, H, D) -> (N_pad, H, W, D), N padded to a multiple of gn.
    ``valid`` is padded separately at each call site (different dtype/rank)."""
    n = q.shape[0]
    n_pad = -(-n // gn) * gn
    qt = q.transpose(0, 2, 1, 3)
    if n_pad != n:
        qt = jnp.pad(qt, ((0, n_pad - n), (0, 0), (0, 0), (0, 0)))
    return qt, n_pad


def _resolve_interpret(interpret):
    """None -> env default (O3V_PALLAS_INTERPRET=1 runs kernels in interpret
    mode, letting CPU tests exercise the dispatch paths end to end)."""
    if interpret is None:
        return os.environ.get("O3V_PALLAS_INTERPRET", "0") == "1"
    return interpret


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def window_attention(q, k, v, valid, interpret=None):
    """Bidirectional masked attention within same-size segments.

    q/k/v: (N, W, H, D); valid: (N, W) bool padding mask or int32 segment
    ids (0 = pad; tokens attend iff ids match — the packed window layout).
    Returns (N, W, H, D) in the input dtype. Padded (invalid) rows return
    unspecified values. Inference calls run the fixed-m softmax forward;
    anything under jax.grad runs the exact max-subtracted forward (the two
    agree to input-dtype rounding while logits stay under the 60.0 clamp)."""
    out, _ = _fwd(q, k, v, valid, interpret, exact=False)
    return out


def _fwd(q, k, v, valid, interpret, exact=True):
    interpret = _resolve_interpret(interpret)
    n, w, h, d = q.shape
    scale = d ** -0.5
    gn, gh = _block_shape(n, w, h, d)
    qt, n_pad = _prep(q, gn)
    kt, _ = _prep(k, gn)
    vt, _ = _prep(v, gn)
    val = jnp.pad(valid.astype(jnp.int32), ((0, n_pad - n), (0, 0)))[:, None, :]

    grid = (n_pad // gn, h // gh)
    tile = ((gn, gh, w, d), lambda i, j: (i, j, 0, 0))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, exact=exact),
        grid=grid,
        in_specs=[
            pl.BlockSpec((gn, 1, w), lambda i, j: (i, 0, 0)),
            pl.BlockSpec(*tile),
            pl.BlockSpec(*tile),
            pl.BlockSpec(*tile),
        ],
        out_specs=pl.BlockSpec(*tile),
        out_shape=jax.ShapeDtypeStruct((n_pad, h, w, d), q.dtype),
        interpret=interpret,
    )(val, qt, kt, vt)
    out = out[:n].transpose(0, 2, 1, 3)
    return out, (q, k, v, valid)


def _fwd_vjp(q, k, v, valid, interpret):
    return _fwd(q, k, v, valid, interpret, exact=True)


def _bwd_vjp(interpret, res, g):
    interpret = _resolve_interpret(interpret)
    q, k, v, valid = res
    n, w, h, d = q.shape
    scale = d ** -0.5
    gn, gh = _block_shape(n, w, h, d)
    # backward holds ~2x the tensors of forward; halve the window block
    gn = max(1, gn // 2)
    qt, n_pad = _prep(q, gn)
    kt, _ = _prep(k, gn)
    vt, _ = _prep(v, gn)
    gt, _ = _prep(g, gn)
    val = jnp.pad(valid.astype(jnp.int32), ((0, n_pad - n), (0, 0)))[:, None, :]

    grid = (n_pad // gn, h // gh)
    tile = ((gn, gh, w, d), lambda i, j: (i, j, 0, 0))
    shape = jax.ShapeDtypeStruct((n_pad, h, w, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((gn, 1, w), lambda i, j: (i, 0, 0)),
            pl.BlockSpec(*tile),
            pl.BlockSpec(*tile),
            pl.BlockSpec(*tile),
            pl.BlockSpec(*tile),
        ],
        out_specs=[pl.BlockSpec(*tile)] * 3,
        out_shape=[shape] * 3,
        interpret=interpret,
    )(val, qt, kt, vt, gt)
    untrans = lambda x: x[:n].transpose(0, 2, 1, 3)
    return untrans(dq), untrans(dk), untrans(dv), None


window_attention.defvjp(_fwd_vjp, _bwd_vjp)


# ---------------------------------------------------------------------------
# Fused rope + window attention
#
# Measured in-context on v5e (scripts/profile_vision.py, 32 blocks,
# S=61440): the un-fused chain  qkv-slice -> f32 rope -> pallas attention
# cost ~31 ms/layer even though the attention kernel alone runs in ~4 ms —
# the rope's f32 (S, H, D) intermediates and the (N,W,H,D) relayouts
# around the pallas_call boundary each force full HBM round trips. This
# kernel consumes the RAW qkv projection output (N, W, 3*H*D) — the exact
# layout the matmul produces — applies rope per head on the VMEM tile,
# runs masked window attention, and emits (N, W, H*D), the exact layout
# the output projection wants. One HBM read of qkv + one write of attn per
# layer; no XLA-side transposes, slices, or f32 intermediates survive.
# ---------------------------------------------------------------------------


def _fused_per_window_bytes(w: int, h: int, d: int, bwd: bool) -> int:
    d_pad = max(d, 128)
    w_pad = max(w, 128)
    hd = h * d
    per_w = (4 if bwd else 2) * 3 * hd * w * 2  # qkv in (+ dqkv out, dout in)
    per_w += 2 * w * hd * 2  # out tile (+ rounding slack)
    per_w += 4 * w * d_pad * 4  # cos/sin f32
    per_w += (4 if bwd else 3) * w * w_pad * 4  # per-head score transients
    return per_w


def fused_window_fits(
    w: int, heads: int, d: int, bwd: "bool | None" = None
) -> bool:
    """Whether a fused-kernel program at segment width ``w`` fits VMEM.

    Large whole-frame segments (Qwen2-VL full attention, the ViT's global
    layers at high resolutions) can exceed the ~16 MB/core VMEM at gn=1;
    callers fall back to the un-fused window kernel for those layers.
    ``bwd`` guards the training path (the backward holds ~2x the tensors);
    default: backward-safe, unless tracing under ``vit_inference_scope``."""
    if bwd is None:
        bwd = not _INFERENCE_SCOPE.get()
    return _fused_per_window_bytes(w, heads, d, bwd) <= _VMEM_BUDGET


def _fused_block_shape(n: int, w: int, h: int, d: int, bwd: bool) -> int:
    """windows-per-program for the fused kernel, sized to the VMEM budget."""
    gn = max(1, _VMEM_BUDGET // _fused_per_window_bytes(w, h, d, bwd))
    return min(n, gn)


def _rope_tile(x, cos, sin, d):
    x1 = x[..., : d // 2]
    x2 = x[..., d // 2 :]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rot * sin


def _fused_fwd_kernel(valid_ref, qkv_ref, cos_ref, sin_ref, o_ref, *, heads,
                      scale, exact):
    gn, w, three_hd = qkv_ref.shape
    hd = three_hd // 3
    d = hd // heads
    cos = cos_ref[...]  # (gn, w, d) f32
    sin = sin_ref[...]
    mask = _seg_mask(valid_ref[...], gn, 1, w)  # (gn, Wq, Wk)
    outs = []
    for h in range(heads):
        q = qkv_ref[:, :, h * d : (h + 1) * d].astype(jnp.float32)
        k = qkv_ref[:, :, hd + h * d : hd + (h + 1) * d].astype(jnp.float32)
        v = qkv_ref[:, :, 2 * hd + h * d : 2 * hd + (h + 1) * d]
        # rope in f32, cast back to the compute dtype (reference semantics)
        q = _rope_tile(q, cos, sin, d).astype(v.dtype)
        k = _rope_tile(k, cos, sin, d).astype(v.dtype)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (gn, Wq, Wk)
        s = jnp.where(mask, s, NEG_INF)
        if exact:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
            o = jax.lax.dot_general(
                p, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        else:
            # Fixed m == 0 inference softmax (see _fwd_kernel): drops the
            # max tree + subtract; exp feeds the MXU unnormalized and the
            # division lands on the (W, D) output. l == 0 (fully-masked pad
            # rows) guarded to 0 output.
            p = jnp.exp(jnp.minimum(s, 60.0))
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            o = o / jnp.where(l == 0.0, 1.0, l)
        outs.append(o.astype(o_ref.dtype))
    # single aligned full-tile store (per-head lane offsets are 80-wide and
    # would otherwise be unaligned partial stores)
    o_ref[...] = jnp.concatenate(outs, axis=-1)


def _fused_bwd_kernel(valid_ref, qkv_ref, cos_ref, sin_ref, do_ref, dqkv_ref,
                      *, heads, scale):
    gn, w, three_hd = qkv_ref.shape
    hd = three_hd // 3
    d = hd // heads
    cos = cos_ref[...]
    sin = sin_ref[...]
    mask = _seg_mask(valid_ref[...], gn, 1, w)
    dqs, dks, dvs = [], [], []
    for h in range(heads):
        q0 = qkv_ref[:, :, h * d : (h + 1) * d].astype(jnp.float32)
        k0 = qkv_ref[:, :, hd + h * d : hd + (h + 1) * d].astype(jnp.float32)
        v = qkv_ref[:, :, 2 * hd + h * d : 2 * hd + (h + 1) * d]
        q = _rope_tile(q0, cos, sin, d).astype(v.dtype)
        k = _rope_tile(k0, cos, sin, d).astype(v.dtype)
        do = do_ref[:, :, h * d : (h + 1) * d].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        s = jnp.where(mask, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # (gn, Wq, Wk) f32
        dv = jax.lax.dot_general(
            p.astype(do.dtype), do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
        dqr = jax.lax.dot_general(
            ds, k.astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dkr = jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # rope transpose: y = x*cos + rot(x)*sin, rot([x1,x2]) = [-x2, x1]
        # => dx = dy*cos + rot_inv(dy*sin), rot_inv([y1,y2]) = [y2, -y1]
        def rope_t(dy):
            a = dy * sin
            a1 = a[..., : d // 2]
            a2 = a[..., d // 2 :]
            return dy * cos + jnp.concatenate([a2, -a1], axis=-1)

        dqs.append(rope_t(dqr).astype(dqkv_ref.dtype))
        dks.append(rope_t(dkr).astype(dqkv_ref.dtype))
        dvs.append(dv.astype(dqkv_ref.dtype))
    dqkv_ref[...] = jnp.concatenate(dqs + dks + dvs, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_window_attention(qkv, cos, sin, valid, heads, interpret=None):
    """Rope + bidirectional masked window attention in one kernel.

    qkv: (N, W, 3*H*D) — raw qkv projection output over contiguous W-token
    segments (the padded ViT window layout; see VisionSpec.padded_index).
    cos/sin: (N, W, D) float32 rotary tables (cos(emb), sin(emb) with
    emb = concat([freqs, freqs], -1)). valid: (N, W) bool padding mask or
    int32 segment ids (0 = pad; tokens attend iff ids match — the packed
    window layout places several small edge windows in one row).
    Returns (N, W, H*D) in the qkv dtype; invalid rows are unspecified.
    Inference calls run the fixed-m softmax forward; anything under
    jax.grad runs the exact max-subtracted forward (agreement to
    input-dtype rounding while logits stay under the 60.0 clamp).
    """
    out, _ = _fused_fwd(qkv, cos, sin, valid, heads, interpret, exact=False)
    return out


def _fused_fwd(qkv, cos, sin, valid, heads, interpret, exact=True):
    interpret = _resolve_interpret(interpret)
    n, w, three_hd = qkv.shape
    hd = three_hd // 3
    d = hd // heads
    gn = _fused_block_shape(n, w, heads, d, bwd=False)
    n_pad = -(-n // gn) * gn
    if n_pad != n:
        qkv = jnp.pad(qkv, ((0, n_pad - n), (0, 0), (0, 0)))
        cos = jnp.pad(cos, ((0, n_pad - n), (0, 0), (0, 0)))
        sin = jnp.pad(sin, ((0, n_pad - n), (0, 0), (0, 0)))
    val = jnp.pad(valid.astype(jnp.int32), ((0, n_pad - n), (0, 0)))[:, None, :]

    out = pl.pallas_call(
        functools.partial(
            _fused_fwd_kernel, heads=heads, scale=d ** -0.5, exact=exact
        ),
        grid=(n_pad // gn,),
        in_specs=[
            pl.BlockSpec((gn, 1, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((gn, w, three_hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((gn, w, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((gn, w, d), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((gn, w, hd), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, w, hd), qkv.dtype),
        interpret=interpret,
    )(val, qkv, cos, sin)
    return out[:n], (qkv[:n], cos[:n], sin[:n], valid)


def _fused_fwd_vjp(qkv, cos, sin, valid, heads, interpret):
    return _fused_fwd(qkv, cos, sin, valid, heads, interpret, exact=True)


def _fused_bwd_vjp(heads, interpret, res, g):
    interpret = _resolve_interpret(interpret)
    qkv, cos, sin, valid = res
    n, w, three_hd = qkv.shape
    hd = three_hd // 3
    d = hd // heads
    gn = _fused_block_shape(n, w, heads, d, bwd=True)
    n_pad = -(-n // gn) * gn
    if n_pad != n:
        qkv = jnp.pad(qkv, ((0, n_pad - n), (0, 0), (0, 0)))
        cos = jnp.pad(cos, ((0, n_pad - n), (0, 0), (0, 0)))
        sin = jnp.pad(sin, ((0, n_pad - n), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, n_pad - n), (0, 0), (0, 0)))
    val = jnp.pad(valid.astype(jnp.int32), ((0, n_pad - n), (0, 0)))[:, None, :]

    dqkv = pl.pallas_call(
        functools.partial(_fused_bwd_kernel, heads=heads, scale=d ** -0.5),
        grid=(n_pad // gn,),
        in_specs=[
            pl.BlockSpec((gn, 1, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((gn, w, three_hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((gn, w, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((gn, w, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((gn, w, hd), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((gn, w, three_hd), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, w, three_hd), qkv.dtype),
        interpret=interpret,
    )(val, qkv, cos, sin, g)
    return dqkv[:n], None, None, None


fused_window_attention.defvjp(_fused_fwd_vjp, _fused_bwd_vjp)
