"""Qwen2.5-VL text decoder in JAX: GQA + M-RoPE, prefill and cached decode.

Functional over a param pytree. Causality is driven by *sequence* positions
(cache_position); M-RoPE 3-axis positions only rotate q/k. Supports
left-padded batches via an attention validity mask, matching the reference's
left-padding inference convention (grpo_trainer.py:569-578).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...ops.attention import causal_attention
from ...ops.quant import dense
from ...ops.rope import apply_mrope, mrope_cos_sin, mrope_cos_sin_interleaved
from .config import TextConfig
from .vision import rms_norm


def init_kv_cache(cfg: TextConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> dict:
    shape = (cfg.num_hidden_layers, batch, max_len, cfg.num_key_value_heads, cfg.head_dim)
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
    }


def _attention_layer(
    p: dict,
    cfg: TextConfig,
    x: jnp.ndarray,  # (B, S, D)
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    seq_positions: jnp.ndarray,  # (B, S) absolute sequence positions of these tokens
    kv_mask: Optional[jnp.ndarray],
    cache: Optional[dict],
    layer_idx: int,
    cache_offset,
    attn_impl: Optional[str] = None,
    kv_positions: Optional[jnp.ndarray] = None,  # (B, T) explicit key positions
):
    B, S, _ = x.shape
    q = dense(x, p["q_w"]).reshape(B, S, cfg.num_attention_heads, cfg.head_dim)
    k = dense(x, p["k_w"]).reshape(B, S, cfg.num_key_value_heads, cfg.head_dim)
    v = dense(x, p["v_w"]).reshape(B, S, cfg.num_key_value_heads, cfg.head_dim)
    if cfg.attention_bias:
        q = q + p["q_b"].reshape(cfg.num_attention_heads, cfg.head_dim)
        k = k + p["k_b"].reshape(cfg.num_key_value_heads, cfg.head_dim)
        v = v + p["v_b"].reshape(cfg.num_key_value_heads, cfg.head_dim)
    if cfg.use_qk_norm:
        # Qwen3: per-head-dim RMSNorm on q/k BEFORE rope.
        q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, p["k_norm"], cfg.rms_norm_eps)
    q, k = apply_mrope(q, k, cos, sin)

    if cache is not None:
        # Single-slice update at a scalar offset — the only cache-update
        # form XLA keeps in place on TPU (a per-row scatter measured ~200x
        # slower; the engine's ring-buffer decode exists to keep ALL rows
        # writing at one shared column). The update writes the FULL
        # (L, B, T, Hkv, D) stacked array (layer_idx is static): the old
        # per-layer-slice update + jnp.stack at the end of text_forward
        # rebuilt the whole cache every call — invisible at short context,
        # but ~4.7 GB of copies per decode STEP at the 81920 fp8 arena
        # (~11 ms/token, measured as the gap between the decode kernel's
        # in-context cost and the engine's step time).
        ck = jax.lax.dynamic_update_slice(
            cache["k"], k.astype(cache["k"].dtype)[None],
            (layer_idx, 0, cache_offset, 0, 0),
        )
        cv = jax.lax.dynamic_update_slice(
            cache["v"], v.astype(cache["v"].dtype)[None],
            (layer_idx, 0, cache_offset, 0, 0),
        )
        k_cache = ck[layer_idx]
        v_cache = cv[layer_idx]
        new_cache = (ck, cv)
        T = k_cache.shape[1]
        if kv_positions is None:
            # Default layout: buffer slot == sequence position; slots past
            # the write head are invalid.
            kv_positions_full = jnp.arange(T)[None, :].repeat(B, axis=0)
            cache_valid = jnp.arange(T)[None, :] < jnp.reshape(
                jnp.asarray(cache_offset) + S, (-1, 1)
            )
            full_kv_mask = cache_valid if kv_mask is None else (kv_mask & cache_valid)
        else:
            # Explicit positions (ring-buffer decode): kv_mask must fully
            # describe slot validity. Passing zeros makes validity the only
            # mask — correct for single-token decode queries, whose valid
            # slots are by construction all earlier tokens of the same row.
            kv_positions_full = kv_positions
            full_kv_mask = kv_mask
        # The cache stays in its STORED dtype here; causal_attention casts
        # per path (block-locally in the long-context chunked decode, where
        # an eager O(T) cast per layer is the memory hazard).
        # Stacked-cache form: XLA paths read the (free) layer slice; the
        # Pallas long-context decode kernel indexes the layer in its block
        # map so the multi-GB carried buffer is its operand directly.
        out = causal_attention(
            q,
            ck,
            cv,
            q_positions=seq_positions,
            kv_positions=kv_positions_full,
            kv_mask=full_kv_mask,
            impl=attn_impl,
            stacked_layer=layer_idx,
        )
    else:
        new_cache = None
        out = causal_attention(
            q, k, v, q_positions=seq_positions, kv_positions=seq_positions,
            kv_mask=kv_mask, impl=attn_impl,
        )

    out = out.reshape(B, S, cfg.num_attention_heads * cfg.head_dim)
    return dense(out, p["o_w"]), new_cache


def _mlp(p: dict, x: jnp.ndarray, cfg: Optional[TextConfig] = None) -> jnp.ndarray:
    if "router" in p:
        return _moe_mlp(p, cfg, x)
    return dense(jax.nn.silu(dense(x, p["gate_w"])) * dense(x, p["up_w"]), p["down_w"])


def _moe_mlp(p: dict, cfg: TextConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Aria MoE layer: routed top-k experts + always-on shared experts
    (HF AriaTextMoELayer).

    TPU-first dispatch: instead of the reference's token permutation +
    grouped GEMM (dynamic shapes), every expert runs as one batched einsum
    over the (E, D, F) weight stack and a dense (N, E) combine matrix does
    the top-k weighting — static shapes, MXU-friendly, and EXPERT PARALLEL
    under GSPMD: the expert axis of moe_fc1/moe_fc2 is sharded over the
    ``tensor`` mesh axis (parallel/mesh.py rules), so each chip computes
    only its local experts and the combine contraction inserts the psum.
    """
    D = x.shape[-1]
    flat = x.reshape(-1, D)
    logits = dense(flat, p["router"]).astype(jnp.float32)  # (N, E)
    if cfg.moe_routing == "softmax_topk_norm":
        # Qwen3-VL-MoE: softmax over ALL experts, take top-k, re-normalize.
        probs = jax.nn.softmax(logits, axis=-1)
        scores, top_idx = jax.lax.top_k(probs, cfg.moe_topk)
        scores = scores / scores.sum(axis=-1, keepdims=True)
    else:
        # Aria: top-k logits, softmax over the top-k only.
        top_logits, top_idx = jax.lax.top_k(logits, cfg.moe_topk)
        scores = jax.nn.softmax(top_logits, axis=-1)
    combine = (
        jax.nn.one_hot(top_idx, cfg.moe_num_experts, dtype=flat.dtype)
        * scores.astype(flat.dtype)[..., None]
    ).sum(axis=1)  # (N, E)
    h = jnp.einsum("nd,edf->enf", flat, p["moe_fc1"])  # (E, N, 2F)
    proj, gate = jnp.split(h, 2, axis=-1)
    h = jax.nn.silu(proj) * gate
    h = jnp.einsum("enf,efd->end", h, p["moe_fc2"])  # (E, N, D)
    routed = jnp.einsum("ne,end->nd", combine, h)
    if "gate_w" in p:  # Aria's always-on shared experts
        routed = routed + dense(
            jax.nn.silu(dense(flat, p["gate_w"])) * dense(flat, p["up_w"]),
            p["down_w"],
        )
    return routed.reshape(x.shape)


def text_forward(
    params: dict,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,  # (B, S, D)
    position_ids: jnp.ndarray,  # (3, B, S) m-rope positions
    *,
    seq_positions: Optional[jnp.ndarray] = None,  # (B, S); default arange+offset
    attn_valid: Optional[jnp.ndarray] = None,  # (B, total_len) validity (left padding)
    cache: Optional[dict] = None,
    cache_offset=0,
    kv_positions: Optional[jnp.ndarray] = None,
    remat: bool = False,
    attn_impl: Optional[str] = None,
    deepstack_embeds: Optional[list] = None,
    deepstack_row_index: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, Optional[dict]]:
    """Returns (hidden_states (B, S, D) after final norm, updated cache).

    ``remat=True`` rematerializes each decoder layer on the backward pass
    (== the reference's gradient_checkpointing, run_sft_video.sh:24).
    ``attn_impl``: None=auto (Pallas flash on TPU when head_dim is
    lane-aligned, XLA otherwise); the flash kernel has a custom VJP so
    training paths use it too.
    ``deepstack_embeds`` (Qwen3-VL): list of (n_vis, D) feature tables
    added into the hidden states at vision-token positions after decoder
    layer i (i < len(list)); ``deepstack_row_index`` is the (B, S) map of
    position -> table row (-1 = not a vision token)."""
    B, S, _ = inputs_embeds.shape
    if seq_positions is None:
        seq_positions = jnp.arange(S)[None, :].repeat(B, axis=0) + cache_offset

    rope_fn = mrope_cos_sin_interleaved if cfg.mrope_interleaved else mrope_cos_sin
    cos, sin = rope_fn(position_ids, cfg.head_dim, cfg.mrope_section, cfg.rope_theta)
    cos = cos.astype(inputs_embeds.dtype)
    sin = sin.astype(inputs_embeds.dtype)

    def layer_fn(layer, x, lcache, layer_idx):
        h = rms_norm(x, layer["input_norm"], cfg.rms_norm_eps)
        attn_out, layer_cache = _attention_layer(
            layer, cfg, h, cos, sin, seq_positions, attn_valid, lcache,
            layer_idx, cache_offset, attn_impl, kv_positions,
        )
        x = x + attn_out
        h = rms_norm(x, layer["post_norm"], cfg.rms_norm_eps)
        x = x + _mlp(layer, h, cfg)
        return x, layer_cache

    if remat:
        layer_fn = jax.checkpoint(layer_fn, static_argnums=(3,))

    # The stacked cache arrays THREAD through the layer loop (each layer's
    # single-column write updates the full (L, ...) array in place); the
    # old collect-slices-and-stack pattern copied the entire cache per
    # call — see the note in _attention_layer.
    x = inputs_embeds
    cur_cache = cache
    for i, layer in enumerate(params["layers"]):
        x, layer_cache = layer_fn(layer, x, cur_cache, i)
        if deepstack_embeds is not None and i < len(deepstack_embeds):
            # Qwen3-VL deepstack: add the i-th tapped vision features at
            # vision-token positions (HF Qwen3VLTextModel._deepstack_process).
            tbl = deepstack_embeds[i]
            flat_idx = deepstack_row_index.reshape(-1)
            add = tbl[jnp.clip(flat_idx, 0, tbl.shape[0] - 1)]
            add = jnp.where((flat_idx >= 0)[:, None], add.astype(x.dtype), 0)
            x = x + add.reshape(x.shape)
        if layer_cache is not None:
            cur_cache = {"k": layer_cache[0], "v": layer_cache[1]}

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return x, (cur_cache if cache is not None else None)


def logits_from_hidden(params: dict, hidden: jnp.ndarray) -> jnp.ndarray:
    """Project final hidden states to vocabulary logits (float32)."""
    return dense(hidden, params["lm_head"]).astype(jnp.float32)


def per_token_logps_from_hidden(
    params: dict,
    hidden: jnp.ndarray,  # (B, S, D) final-norm hidden states
    targets: jnp.ndarray,  # (B, S) token ids these positions predict
    chunk: Optional[int] = None,
) -> jnp.ndarray:
    """log P(targets | hidden) (B, S) float32 without materializing the full
    (B, S, vocab) logits.

    The RL memory hot spot (SURVEY §7 "generation inside the training
    step"): at 7B dims a (4, 768, 152064) float32 logit + log_softmax pair
    is ~3.7 GB of transients next to 9.5 GB of int8 weights on a 16 GB
    chip. ``chunk`` bounds the live logits to (B, chunk, vocab) via a
    scanned, rematerialized lm_head: backward recomputes each chunk's
    logits from the (tiny) hidden slice instead of storing them — the
    TPU-shaped equivalent of the reference's row-wise logp loop
    (grpo_trainer.py:371-384, which loops to "cap memory" the same way).
    """
    if chunk is None or hidden.shape[1] <= chunk:
        logp = jax.nn.log_softmax(logits_from_hidden(params, hidden), axis=-1)
        return jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    B, S, D = hidden.shape
    pad = (-S) % chunk
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        targets = jnp.pad(targets, ((0, 0), (0, pad)))
    n = (S + pad) // chunk
    h = hidden.reshape(B, n, chunk, D).swapaxes(0, 1)  # (n, B, chunk, D)
    t = targets.reshape(B, n, chunk).swapaxes(0, 1)

    @jax.checkpoint
    def step(_, ht):
        h_, t_ = ht
        logp = jax.nn.log_softmax(logits_from_hidden(params, h_), axis=-1)
        return None, jnp.take_along_axis(logp, t_[..., None], axis=-1)[..., 0]

    _, out = jax.lax.scan(step, None, (h, t))
    out = out.swapaxes(0, 1).reshape(B, S + pad)
    return out[:, :S]
