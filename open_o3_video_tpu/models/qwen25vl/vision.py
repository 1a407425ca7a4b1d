"""Qwen2.5-VL vision tower in JAX.

TPU-first design notes
----------------------
The reference runs varlen FlashAttention over ``cu_seqlens`` windows (HF
Qwen2.5-VL). Dynamic segment lengths don't map to XLA, so we precompute a
**static segment spec** on the host per grid configuration: the window
permutation groups every attention segment (8x8-patch window, or whole image
for the 4 global layers) into contiguous runs, which we batch as a dense
(num_segments, max_segment) tensor with a padding mask. All shapes are static
per grid bucket; XLA compiles one program per bucket and every matmul stays
on the MXU.
"""

from __future__ import annotations

import dataclasses

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import segment_attention, use_pallas_window
from ...ops.quant import dense
from ...ops.rope import apply_rope_vision, vision_pos_freqs
from .config import VisionConfig


@dataclasses.dataclass(frozen=True)
class FusedSeg:
    """Per-layer plan for the fused rope+attention kernel (padded layout).

    The sequence is padded so every segment is a contiguous ``w``-token run;
    cos/sin are the rotary tables pre-shaped to (N, w, head_dim) and valid
    is the (N, w) padding mask — bool, or int32 segment ids when several
    packed windows share a row (see ops/window_attention.py
    fused_window_attention)."""

    w: int
    cos: jnp.ndarray  # (N, w, head_dim) f32
    sin: jnp.ndarray  # (N, w, head_dim) f32
    valid: jnp.ndarray  # (N, w) bool or int32 segment ids


@dataclasses.dataclass(frozen=True)
class SegmentSpec:
    """Static gather/scatter plan for batched segment attention."""

    indices: np.ndarray  # (N, W) int32 — position of each segment slot in the sequence
    valid: np.ndarray  # (N, W) bool — padding mask
    seg_ids: np.ndarray  # (S,) int32 — segment of each sequence position
    offsets: np.ndarray  # (S,) int32 — slot of each sequence position


def _make_segment_spec(seg_sizes: np.ndarray, valid_mask: "np.ndarray | None" = None) -> SegmentSpec:
    """Contiguous segments (sizes summing to S) -> static batched layout.

    ``valid_mask`` (length S) marks positions that are themselves padding
    inside the segments (the padded window layout's pad rows) so they stay
    masked as attention keys."""
    n = len(seg_sizes)
    w = int(seg_sizes.max())
    s = int(seg_sizes.sum())
    indices = np.zeros((n, w), dtype=np.int32)
    valid = np.zeros((n, w), dtype=bool)
    seg_ids = np.zeros(s, dtype=np.int32)
    offsets = np.zeros(s, dtype=np.int32)
    pos = 0
    for i, size in enumerate(seg_sizes):
        size = int(size)
        indices[i, :size] = np.arange(pos, pos + size)
        valid[i, :size] = (
            True if valid_mask is None else valid_mask[pos : pos + size]
        )
        seg_ids[pos : pos + size] = i
        offsets[pos : pos + size] = np.arange(size)
        pos += size
    return SegmentSpec(indices=indices, valid=valid, seg_ids=seg_ids, offsets=offsets)


@dataclasses.dataclass(frozen=True)
class VisionSpec:
    """Everything shape-dependent, computed once per grid_thw on the host."""

    window_index: np.ndarray  # (S_merged,) permutation of merge blocks
    reverse_index: np.ndarray  # (S_merged,) inverse permutation
    window_seg: SegmentSpec  # segments for windowed layers (over reordered seq)
    full_seg: SegmentSpec  # segments for global layers (over reordered seq)
    freqs: np.ndarray  # (S, head_dim//2) rotary angles, reordered
    seq_len: int
    # Qwen3-VL learned pos embed: bilinear interpolation plan from the
    # (side x side) table to each grid, in patch order (HF
    # fast_pos_embed_interpolate). None for the other families.
    pos_idx: "np.ndarray | None" = None  # (4, S) int32 table rows
    pos_w: "np.ndarray | None" = None  # (4, S) float32 corner weights
    # Padded window layout (uniform grids only): every window padded to
    # exactly ``win_w`` tokens so per-layer segmentation is a free reshape
    # instead of a gather. Measured on v5e, the per-layer (S,H,D) gather +
    # transpose around the attention cost ~19 ms/layer — ~60% of the whole
    # tower — while the attention itself (Pallas window kernel) runs in
    # ~2.5 ms. One entry gather + one exit gather replace 2*depth of them.
    padded_index: "np.ndarray | None" = None  # (S_pad,) int32 source row
    padded_valid: "np.ndarray | None" = None  # (S_pad,) bool
    # int32 per-row segment id (0 = pad): >1 values appear when several
    # small edge windows are PACKED into one win_w row (first-fit
    # decreasing, per frame) — windowed layers mask attention by id
    # equality so the packed windows stay independent. Packing cuts the
    # pad-row inflation from ~33% (up to 80% at small frames) to ~4%.
    padded_gids: "np.ndarray | None" = None  # (S_pad,) int32
    padded_freqs: "np.ndarray | None" = None  # (S_pad, head_dim//2)
    win_w: int = 0  # padded window length (unmerged tokens)
    frame_w: int = 0  # padded per-frame length (0 = heterogeneous frames)
    merged_out_index: "np.ndarray | None" = None  # (S_merged,) exit gather
    # Global layers over the padded sequence when frames are heterogeneous
    # (frame_w == 0): masked segment attention instead of a free reshape.
    full_seg_pad: "SegmentSpec | None" = None


def _pos_interp_plan(grid_thw, side: int, merge: int):
    """(4, S) table indices + bilinear weights, merge-block patch order."""
    idx_all, w_all = [], []
    for t, h, w in grid_thw:
        t, h, w = int(t), int(h), int(w)
        h_idxs = np.linspace(0, side - 1, h)
        w_idxs = np.linspace(0, side - 1, w)
        hf = h_idxs.astype(np.int64)
        wf = w_idxs.astype(np.int64)
        hc = np.clip(hf + 1, None, side - 1)
        wc = np.clip(wf + 1, None, side - 1)
        dh = h_idxs - hf
        dw = w_idxs - wf
        idx = np.stack(
            [
                (hf[:, None] * side + wf[None, :]),
                (hf[:, None] * side + wc[None, :]),
                (hc[:, None] * side + wf[None, :]),
                (hc[:, None] * side + wc[None, :]),
            ]
        )  # (4, h, w)
        wgt = np.stack(
            [
                (1 - dh)[:, None] * (1 - dw)[None, :],
                (1 - dh)[:, None] * dw[None, :],
                dh[:, None] * (1 - dw)[None, :],
                dh[:, None] * dw[None, :],
            ]
        )
        # Row-major (h, w) -> merge-block patch order, repeated per frame.
        def to_patch_order(a):
            a = a.reshape(4, h // merge, merge, w // merge, merge)
            a = a.transpose(0, 1, 3, 2, 4).reshape(4, h * w)
            return np.tile(a, (1, t))

        idx_all.append(to_patch_order(idx))
        w_all.append(to_patch_order(wgt))
    return (
        np.concatenate(idx_all, axis=1).astype(np.int32),
        np.concatenate(w_all, axis=1).astype(np.float32),
    )


def compute_vision_spec(grid_thw: Sequence[tuple[int, int, int]], cfg: VisionConfig) -> VisionSpec:
    """Host-side plan: window permutation + segment layouts + rotary angles.

    Mirrors the reference's get_window_index / rot_pos_emb / cu_seqlens logic
    (HF Qwen2.5-VL vision tower) but emits static dense layouts.
    """
    merge = cfg.spatial_merge_size
    unit = cfg.merge_unit

    if not cfg.use_windows:
        # Qwen2-VL / Qwen3-VL: no window partition — the sequence keeps its
        # original order and EVERY layer attends within per-frame (h*w)
        # segments (HF cu_seqlens = repeat_interleave(h*w, t)).
        seq_len = int(sum(t * h * w for t, h, w in grid_thw))
        full_sizes = [int(h) * int(w) for t, h, w in grid_thw for _ in range(int(t))]
        ident = np.arange(seq_len // unit, dtype=np.int32)
        full_seg = _make_segment_spec(np.asarray(full_sizes, dtype=np.int64))
        freqs = vision_pos_freqs(grid_thw, merge, cfg.head_dim).astype(np.float32)
        pos_idx = pos_w = None
        if cfg.num_position_embeddings:
            side = int(cfg.num_position_embeddings ** 0.5)
            pos_idx, pos_w = _pos_interp_plan(grid_thw, side, merge)
        padded = {}
        if len(set(full_sizes)) == 1:
            # Uniform grids: per-frame segments are already contiguous,
            # equal-length runs — the "padded" layout is the identity (no
            # pad rows), enabling the fused rope+attention kernel.
            fw = int(full_sizes[0])
            padded = dict(
                padded_index=np.arange(seq_len, dtype=np.int32),
                padded_valid=np.ones(seq_len, dtype=bool),
                padded_gids=np.ones(seq_len, dtype=np.int32),
                padded_freqs=freqs,
                win_w=fw,
                frame_w=fw,
                merged_out_index=np.arange(seq_len // unit, dtype=np.int32),
            )
        return VisionSpec(
            window_index=ident,
            reverse_index=ident,
            window_seg=full_seg,
            full_seg=full_seg,
            freqs=freqs,
            seq_len=seq_len,
            pos_idx=pos_idx,
            pos_w=pos_w,
            **padded,
        )

    win = cfg.window_patches // merge  # window side in merged positions (112/14/2 = 4)

    window_index = []
    window_sizes = []  # per-window size in unmerged patches
    full_sizes = []  # per (grid, t) segment size in unmerged patches
    frame_win_counts = []  # per (grid, t) count of nonzero windows
    offset = 0
    for t, h, w in grid_thw:
        lh, lw = h // merge, w // merge
        index = np.arange(t * lh * lw).reshape(t, lh, lw)
        # The reference pads by win - (l % win), adding a full empty window
        # row/col when l divides win; those empty windows become zero-size
        # segments and are dropped below, so behavior matches.
        pad_h = win - lh % win
        pad_w = win - lw % win
        nwh = (lh + pad_h) // win
        nww = (lw + pad_w) // win
        padded = np.full((t, lh + pad_h, lw + pad_w), -100, dtype=np.int64)
        padded[:, :lh, :lw] = index
        padded = padded.reshape(t, nwh, win, nww, win).transpose(0, 1, 3, 2, 4)
        padded = padded.reshape(t, nwh * nww, win, win)
        seqlens = (padded != -100).sum(axis=(2, 3)).reshape(-1)
        flat = padded.reshape(-1)
        window_index.append(flat[flat != -100] + offset)
        window_sizes.extend(int(s) * unit for s in seqlens if s > 0)
        full_sizes.extend([h * w] * t)
        frame_win_counts.extend(
            int(c) for c in (seqlens.reshape(t, -1) > 0).sum(axis=1)
        )
        offset += t * lh * lw
    window_index = np.concatenate(window_index).astype(np.int32)
    reverse_index = np.argsort(window_index).astype(np.int32)

    seq_len = int(sum(t * h * w for t, h, w in grid_thw))
    window_seg = _make_segment_spec(np.asarray(window_sizes, dtype=np.int64))
    full_seg = _make_segment_spec(np.asarray(full_sizes, dtype=np.int64))

    freqs = vision_pos_freqs(grid_thw, merge, cfg.head_dim)  # (S, hd//2)
    # Reorder angles the same way hidden states are reordered: by merge blocks.
    freqs = freqs.reshape(seq_len // unit, unit, -1)[window_index].reshape(seq_len, -1)
    freqs = freqs.astype(np.float32)

    # Padded layout: windows are placed into win_w_m-merged-slot rows (pad
    # slots marked -1). Window sizes and pads are multiples of the merge
    # unit, so merge blocks stay intact. Windows are win x win merged
    # positions for EVERY grid, so this works for heterogeneous-resolution
    # batches too (the case every real eval batch hits) — only the
    # whole-frame global layers then need the masked-SegmentSpec fallback
    # (full_seg_pad) instead of a free reshape.
    #
    # By default several small edge windows are PACKED into one row
    # (first-fit decreasing, per frame so frames stay contiguous bin runs
    # for the global layers); per-row segment ids keep them independent in
    # the attention mask. At the production 18x24-patch grid this cuts the
    # pad inflation from 33% (9 windows of 64/64/.../16/16/16 tokens -> 9
    # rows) to 3.7% (7 rows). O3V_VIT_PACK=0 restores one-window-per-row;
    # O3V_VIT_PACK=k>=2 multiplies the row capacity, packing k FULL windows
    # per row: a 64-token window's (Wq, Wk) score tile pads to 128 lanes on
    # the VPU either way, so wider rows cost no extra vector work while the
    # attention dots tile the 128x128 MXU k^2x better and the row count
    # (pallas grid) shrinks kx.
    import os as _os

    # Default capacity 2: measured on v5e at the bench geometry (32 blocks,
    # S=61440, scripts/profile_vision.py) 754 -> 718 ms tower; the adaptive
    # fallback below keeps ragged grids at capacity 1. Parse defensively:
    # invalid / empty / negative values fall back to the default rather
    # than raising at spec-build time deep inside a serving call.
    _raw_pack = _os.environ.get("O3V_VIT_PACK", "")
    try:
        packf = max(int(_raw_pack), 0) if _raw_pack.strip() else 2
    except ValueError:
        packf = 2
    sizes_m = [s // unit for s in window_sizes]
    starts_m = np.zeros(len(sizes_m), dtype=np.int64)
    np.cumsum(sizes_m[:-1], out=starts_m[1:])

    def _pack_bins(cap_m: int, pack: bool):
        bins: list[list[int]] = []  # window indices per row
        bin_frame_counts = []  # rows per frame (global-layer segment sizes)
        wpos = 0
        for count in frame_win_counts:
            frame_wins = range(wpos, wpos + count)
            wpos += count
            if pack:
                frame_bins: list[list] = []  # [remaining_capacity, [win_idx]]
                for i in sorted(frame_wins, key=lambda i: (-sizes_m[i], i)):
                    for b in frame_bins:
                        if b[0] >= sizes_m[i]:
                            b[0] -= sizes_m[i]
                            b[1].append(i)
                            break
                    else:
                        frame_bins.append([cap_m - sizes_m[i], [i]])
                # Canonical order: windows ascending within a bin, bins by
                # their first window — when packing merges nothing the layout
                # is then IDENTICAL to the sequential one (same program,
                # bit-identical accumulation order in the global layers).
                for b in frame_bins:
                    b[1].sort()
                frame_bins.sort(key=lambda b: b[1][0])
            else:
                frame_bins = [[0, [i]] for i in frame_wins]
            bins.extend(b[1] for b in frame_bins)
            bin_frame_counts.append(len(frame_bins))
        return bins, bin_frame_counts

    win_w_m = win * win * max(packf, 1)
    bins, bin_frame_counts = _pack_bins(win_w_m, packf != 0)
    if packf > 1:
        # Wider rows only pay off when they don't inflate the padded
        # sequence: PAD rows ride through every linear in the tower, so a
        # half-empty wide bin (ragged grids) costs more in the MLPs than
        # the packed attention dots save. Uniform full-window grids (the
        # bench/serving geometry) pack with zero slot growth.
        #
        # The decision is deliberately BATCH-GLOBAL: every row in the
        # padded layout shares one width (the pallas grid is uniform), so
        # one ragged frame in a mixed-resolution batch reverts the whole
        # batch to capacity 1. Correctness is unaffected; callers that
        # care about the perf cliff should bucket frames by grid shape
        # before batching (the engine's shape-bucketing already does).
        bins1, counts1 = _pack_bins(win * win, True)
        if len(bins) * win_w_m > len(bins1) * win * win:
            win_w_m = win * win
            bins, bin_frame_counts = bins1, counts1

    n_bins = len(bins)
    pad_blocks = np.full(n_bins * win_w_m, -1, dtype=np.int64)
    gid_blocks = np.zeros(n_bins * win_w_m, dtype=np.int32)
    for bi, wins in enumerate(bins):
        off = bi * win_w_m
        for gi, wi in enumerate(wins):
            s = sizes_m[wi]
            pad_blocks[off : off + s] = np.arange(starts_m[wi], starts_m[wi] + s)
            gid_blocks[off : off + s] = gi + 1
            off += s
    s_pad = n_bins * win_w_m * unit
    j = np.arange(s_pad)
    blk = pad_blocks[j // unit]
    valid = blk >= 0
    gids = gid_blocks[j // unit]
    src_blk = np.where(valid, blk, 0)
    # row-level source through the window permutation
    padded_index = (window_index[src_blk].astype(np.int64) * unit
                    + j % unit).astype(np.int32)
    padded_freqs = np.where(
        valid[:, None], freqs[src_blk * unit + j % unit], 0.0
    ).astype(np.float32)
    # exit gather: original merged block -> its padded-merged slot
    merged_out_index = np.empty(seq_len // unit, dtype=np.int32)
    jm = np.arange(n_bins * win_w_m)
    real = pad_blocks >= 0
    merged_out_index[window_index[pad_blocks[real]]] = jm[real]
    uniform = len({(int(h), int(w), int(t)) for t, h, w in grid_thw}) == 1
    padded = dict(
        padded_index=padded_index,
        padded_valid=valid,
        padded_gids=gids,
        padded_freqs=padded_freqs,
        win_w=win_w_m * unit,
        merged_out_index=merged_out_index,
    )
    if uniform:
        assert len(set(bin_frame_counts)) == 1
        padded["frame_w"] = bin_frame_counts[0] * win_w_m * unit
    else:
        # Heterogeneous frames: global layers run masked segment attention
        # over the padded sequence (frames are contiguous row runs).
        frame_pad_sizes = (
            np.asarray(bin_frame_counts, dtype=np.int64) * win_w_m * unit
        )
        padded["full_seg_pad"] = _make_segment_spec(
            frame_pad_sizes, valid_mask=valid
        )

    return VisionSpec(
        window_index=window_index,
        reverse_index=reverse_index,
        window_seg=window_seg,
        full_seg=full_seg,
        freqs=freqs,
        seq_len=seq_len,
        **padded,
    )


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    x = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    return (x * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Qwen2-VL vision norm (HF Qwen2VLVisionBlock uses LayerNorm, eps 1e-6)."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    return (x * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def _norm(params: dict, name: str, x: jnp.ndarray, cfg: VisionConfig) -> jnp.ndarray:
    if cfg.norm_type == "layernorm":
        return layer_norm(x, params[name], params[name + "_b"])
    return rms_norm(x, params[name])


def _segmented_attention(q, k, v, spec):
    """(S, H, D) q/k/v -> segment-batched bidirectional attention -> (S, H, D).

    ``spec`` is either a SegmentSpec (gather/scatter layout, heterogeneous
    grids) or a ``(w, valid)`` tuple for the padded layout, where the
    sequence is already padded so segments are contiguous w-token runs —
    the (N, W) batching is then a free reshape."""
    if not isinstance(spec, SegmentSpec):
        w, valid = spec
        S, H, D = q.shape
        qs, ks, vs = (x.reshape(S // w, w, H, D) for x in (q, k, v))
        return segment_attention(qs, ks, vs, valid).reshape(S, H, D)
    indices = jnp.asarray(spec.indices)
    valid = jnp.asarray(spec.valid)
    qs, ks, vs = (x[indices] for x in (q, k, v))  # (N, W, H, D)
    out = segment_attention(qs, ks, vs, valid)
    return out[jnp.asarray(spec.seg_ids), jnp.asarray(spec.offsets)]  # (S, H, D)


def _block(params: dict, x: jnp.ndarray, freqs: jnp.ndarray, spec, cfg: VisionConfig):
    h = _norm(params, "norm1", x, cfg)
    qkv = dense(h, params["qkv_w"]) + params["qkv_b"]
    S = x.shape[0]
    if isinstance(spec, FusedSeg):
        from ...ops.window_attention import fused_window_attention

        attn = fused_window_attention(
            qkv.reshape(S // spec.w, spec.w, -1),
            spec.cos, spec.sin, spec.valid, cfg.num_heads,
        ).reshape(S, cfg.hidden_size)
    else:
        qkv = qkv.reshape(S, 3, cfg.num_heads, cfg.head_dim)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        q, k = apply_rope_vision(q, k, freqs)
        attn = _segmented_attention(q, k, v, spec).reshape(S, cfg.hidden_size)
    x = x + (dense(attn, params["proj_w"]) + params["proj_b"])

    h = _norm(params, "norm2", x, cfg)
    if cfg.act_type == "quickgelu":
        # Qwen2-VL VisionMlp: fc1 -> quick_gelu -> fc2.
        a = dense(h, params["fc1_w"]) + params["fc1_b"]
        a = a * jax.nn.sigmoid(1.702 * a)
        x = x + (dense(a, params["fc2_w"]) + params["fc2_b"])
    elif cfg.act_type == "gelu_tanh":
        # Qwen3-VL VisionMLP: linear_fc1 -> gelu_pytorch_tanh -> linear_fc2.
        a = dense(h, params["fc1_w"]) + params["fc1_b"]
        a = jax.nn.gelu(a, approximate=True)
        x = x + (dense(a, params["fc2_w"]) + params["fc2_b"])
    else:
        gate = jax.nn.silu(dense(h, params["gate_w"]) + params["gate_b"])
        up = dense(h, params["up_w"]) + params["up_b"]
        x = x + (dense(gate * up, params["down_w"]) + params["down_b"])
    return x


def _merger(m: dict, x: jnp.ndarray, cfg: VisionConfig, postshuffle: bool) -> jnp.ndarray:
    """Patch merger: norm -> merge_unit concat -> fc1 -> GELU -> fc2.

    ``postshuffle`` (Qwen3-VL deepstack mergers) norms AFTER the merge
    reshape (over unit*hidden), the main merger before it (over hidden)."""
    S = x.shape[0]
    unit = cfg.merge_unit
    if postshuffle:
        h = x.reshape(S // unit, unit * cfg.hidden_size)
        h = layer_norm(h, m["ln_q"], m["ln_q_b"])
    else:
        h = _norm(m, "ln_q", x, cfg).reshape(S // unit, unit * cfg.hidden_size)
    h = jax.nn.gelu(h @ m["fc1_w"] + m["fc1_b"], approximate=False)
    return h @ m["fc2_w"] + m["fc2_b"]  # (S/unit, out)


def vision_forward(
    params: dict, patches: jnp.ndarray, spec: VisionSpec, cfg: VisionConfig
) -> "jnp.ndarray | tuple[jnp.ndarray, list[jnp.ndarray]]":
    """patches (S, patch_dim) -> merged vision embeddings (S / merge_unit, out_dim).

    Output rows are in the original (pre-window-permutation) merged order,
    ready to scatter into the text embedding stream. For Qwen3-VL (deepstack
    indexes configured) returns (embeddings, [deepstack features]) — one
    extra (S / merge_unit, out_dim) table per tapped block, injected into
    the early decoder layers by the text side.
    """
    x = patches.astype(params["patch_embed"].dtype) @ params["patch_embed"]  # (S, D)
    if cfg.patch_embed_bias:
        x = x + params["patch_embed_b"]
    S = spec.seq_len
    unit = cfg.merge_unit

    if spec.pos_idx is not None:
        # Qwen3-VL: bilinearly interpolated learned pos embed (the 4-corner
        # gather plan is host-precomputed per grid).
        pe = params["pos_embed"].astype(jnp.float32)
        idx = jnp.asarray(spec.pos_idx)
        wgt = jnp.asarray(spec.pos_w)
        pos = jnp.einsum("cs,csd->sd", wgt, pe[idx])
        x = x + pos.astype(x.dtype)

    import os

    # Layout selection, measured on v5e (scripts/profile_vision.py, 32
    # blocks, S=61440, in-context ablations):
    #   gather + XLA attention          1380 ms   (r2 baseline)
    #   gather + Pallas window kernel   1281 ms
    #   padded + Pallas (un-fused)      1530 ms   <- rope's f32 (S,H,D)
    #       intermediates and the pallas_call boundary relayouts cost more
    #       than the gathers they replace (pad_qkv 528 / pad_rope 778 /
    #       pad_full_norope 864 ms decomposition)
    #   padded + FUSED rope+attention   one qkv read, one attn write/layer
    # So: padded layout is used exactly when the fused kernel will consume
    # it (Pallas dispatch active), unless forced via O3V_VIT_PADDED=0/1.
    # O3V_VIT_FUSED=0 keeps the padded layout but uses the un-fused path
    # (ablation/debugging).
    from ...ops.window_attention import fused_window_fits

    forced = os.environ.get("O3V_VIT_PADDED")
    fused = (
        spec.padded_index is not None
        and use_pallas_window()
        and os.environ.get("O3V_VIT_FUSED", "1") != "0"
        and fused_window_fits(spec.win_w, cfg.num_heads, cfg.head_dim)
    )
    padded = (
        spec.padded_index is not None
        and (forced != "0" if forced is not None else fused)
    )
    fused = fused and padded
    # Whole-frame (global) segments can exceed VMEM at large resolutions or
    # be heterogeneous (frame_w == 0, mixed-resolution batches); those
    # layers then fall back to masked segment attention over the padded
    # sequence while the 8x8 windowed layers stay fused.
    fuse_frames = fused and spec.frame_w > 0 and (
        spec.frame_w == spec.win_w
        or fused_window_fits(spec.frame_w, cfg.num_heads, cfg.head_dim)
    )
    if padded:
        # Padded window layout: ONE gather applies the window permutation
        # AND pads every window to win_w tokens; per-layer segmentation is
        # then a reshape (see VisionSpec.padded_index). Pad rows are zeroed
        # here, masked as attention keys, and never gathered back out.
        valid_np = spec.padded_valid
        # Windowed layers mask by per-row segment id (packed layout: several
        # edge windows share a row); global layers attend across the whole
        # frame, so they mask by validity only.
        gids_np = spec.padded_gids
        x = x[jnp.asarray(spec.padded_index)]
        x = jnp.where(jnp.asarray(valid_np)[:, None], x, 0)
        freqs = jnp.asarray(spec.padded_freqs)
        if fused:
            # Host-precomputed rotary tables in the kernel's layout: emb =
            # concat([freqs, freqs]) -> cos/sin (S_pad, head_dim), reshaped
            # per segment width. One pair of constants for the whole tower.
            emb = np.concatenate([spec.padded_freqs, spec.padded_freqs], -1)
            cos_np = np.cos(emb).astype(np.float32)
            sin_np = np.sin(emb).astype(np.float32)

            def _fused_seg(w, ids_np):
                return FusedSeg(
                    w=w,
                    cos=jnp.asarray(cos_np.reshape(-1, w, cos_np.shape[-1])),
                    sin=jnp.asarray(sin_np.reshape(-1, w, sin_np.shape[-1])),
                    valid=jnp.asarray(ids_np.reshape(-1, w)),
                )

            win_seg = _fused_seg(spec.win_w, gids_np)
            if spec.frame_w == spec.win_w and gids_np.max() <= 1:
                # one window per row AND per frame — identical mask
                full_seg = win_seg
            elif fuse_frames:
                full_seg = _fused_seg(spec.frame_w, valid_np)
            elif spec.frame_w > 0:
                full_seg = (
                    spec.frame_w,
                    jnp.asarray(valid_np.reshape(-1, spec.frame_w)),
                )
            else:
                full_seg = spec.full_seg_pad
        else:
            win_seg = (spec.win_w, jnp.asarray(gids_np.reshape(-1, spec.win_w)))
            if spec.frame_w > 0:
                full_seg = (
                    spec.frame_w,
                    jnp.asarray(valid_np.reshape(-1, spec.frame_w)),
                )
            else:
                full_seg = spec.full_seg_pad
    else:
        window_index = jnp.asarray(spec.window_index)
        x = x.reshape(S // unit, unit, -1)[window_index].reshape(S, -1)
        freqs = jnp.asarray(spec.freqs)
        win_seg = spec.window_seg
        full_seg = spec.full_seg

    deepstack: list[jnp.ndarray] = []
    for i in range(cfg.depth):
        seg = full_seg if i in cfg.fullatt_block_indexes else win_seg
        x = _block(params["blocks"][i], x, freqs, seg, cfg)
        if i in cfg.deepstack_visual_indexes:
            j = cfg.deepstack_visual_indexes.index(i)
            tap = _merger(params["deepstack"][j], x, cfg, postshuffle=True)
            if padded:
                tap = tap[jnp.asarray(spec.merged_out_index)]
            deepstack.append(tap)

    h = _merger(params["merger"], x, cfg, postshuffle=False)
    h = h[jnp.asarray(spec.merged_out_index if padded else spec.reverse_index)]
    if cfg.deepstack_visual_indexes:
        return h, deepstack
    return h
