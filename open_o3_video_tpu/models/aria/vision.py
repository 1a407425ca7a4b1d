"""Aria vision tower (Idefics3/SigLIP-style ViT) + cross-attention projector.

Architecture reference: HF ``Idefics3VisionTransformer`` (conv patch embed,
learned per-position embedding, pre-LN bidirectional blocks) feeding HF
``AriaProjector`` (learned query bank -> cross-attention over patch
features -> MLP into the text embedding space). The reference consumes this
via ``AriaForConditionalGeneration`` (grpo_trainer.py:217, :240).

TPU notes: images are fixed-size squares (the Aria processor emits
``image_size`` x ``image_size`` crops), so every shape is static — patch
embedding is one reshaped matmul, attention is dense bidirectional over
``(image_size/patch)^2`` patches, and the projector's query count is a
host-side table lookup (``patch_to_query``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..qwen25vl.vision import layer_norm
from .config import AriaConfig, AriaVisionConfig


def patchify_images(images, patch_size: int):
    """(B, C, H, W) float images -> (B, n_patches, C*ps*ps) patch rows.

    Row-major patch order, channel-major within a patch — matching the
    flattened Conv2d(kernel=stride=ps) weight layout."""
    B, C, H, W = images.shape
    gh, gw = H // patch_size, W // patch_size
    x = images.reshape(B, C, gh, patch_size, gw, patch_size)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # (B, gh, gw, C, ps, ps)
    return x.reshape(B, gh * gw, C * patch_size * patch_size)


def _attention(q, k, v, num_heads: int):
    """Dense bidirectional MHA; q/k/v (B, S, D)."""
    B, S, D = q.shape
    hd = D // num_heads

    def split(x):
        return x.reshape(B, -1, num_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd**-0.5)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    return out.transpose(0, 2, 1, 3).reshape(B, -1, D)


def vision_tower(params: dict, cfg: AriaVisionConfig, images: jnp.ndarray) -> jnp.ndarray:
    """(B, C, H, W) -> last encoder layer hidden states (B, n_patches, D).

    Matches HF ``vision_feature_layer=-1``: the LAST layer output, before
    the tower's (unused) post_layernorm."""
    ps = cfg.patch_size
    B, _, H, W = images.shape
    gh, gw = H // ps, W // ps
    x = patchify_images(images, ps) @ params["patch_embed"] + params["patch_embed_b"]

    # Learned pos embed, bucketized fractional coords (Idefics3VisionEmbeddings;
    # full-image case — the Aria processor emits fixed-size square crops).
    # NOTE: transformers 4.57.x computes frac = i/g * (1 - 1e-6) and then
    # bucketizes; newer HF revisions switched to arange(0, 1-1e-6, 1/g), which
    # yields DIFFERENT buckets (e.g. [0,1] vs [0,0] at g=nps=2). We match the
    # pinned/installed 4.57 semantics, verified by tests/test_aria.py parity.
    nps = cfg.num_patches_per_side
    eps = 1e-6
    frac_h = jnp.arange(gh) / gh * (1 - eps)
    frac_w = jnp.arange(gw) / gw * (1 - eps)
    bucket_h = jnp.floor(frac_h * nps).astype(jnp.int32)
    bucket_w = jnp.floor(frac_w * nps).astype(jnp.int32)
    pos_ids = (bucket_h[:, None] * nps + bucket_w[None, :]).reshape(-1)
    x = x + params["pos_embed"][pos_ids]

    for blk in params["blocks"]:
        h = layer_norm(x, blk["norm1"], blk["norm1_b"], cfg.layer_norm_eps)
        q = h @ blk["q_w"] + blk["q_b"]
        k = h @ blk["k_w"] + blk["k_b"]
        v = h @ blk["v_w"] + blk["v_b"]
        attn = _attention(q, k, v, cfg.num_attention_heads)
        x = x + (attn @ blk["out_w"] + blk["out_b"])
        h = layer_norm(x, blk["norm2"], blk["norm2_b"], cfg.layer_norm_eps)
        h = jax.nn.gelu(h @ blk["fc1_w"] + blk["fc1_b"], approximate=True)
        x = x + (h @ blk["fc2_w"] + blk["fc2_b"])
    return x


def projector(params: dict, cfg: AriaConfig, patch_states: jnp.ndarray) -> jnp.ndarray:
    """(B, n_patches, Dv) -> (B, query_num, Dt) text-space image features.

    HF AriaProjector: learned queries -> pre-projections -> a full
    nn.MultiheadAttention (its OWN in/out projections on top of the q/k/v
    pre-projections — a quirk of the published architecture, reproduced
    exactly) -> linear -> LN -> gelu-tanh MLP."""
    p = params["projector"]
    B, n_patches, Dv = patch_states.shape
    q_num = cfg.query_num(n_patches)
    heads = cfg.vision.num_attention_heads

    # Projector norms are plain nn.LayerNorm -> torch default eps 1e-5
    # (the tower's use Idefics3's layer_norm_eps instead).
    LN_EPS = 1e-5
    queries = jnp.broadcast_to(p["query"][:q_num], (B, q_num, Dv))
    q = layer_norm(queries, p["ln_q"], p["ln_q_b"], LN_EPS) @ p["q_w"]
    kv = layer_norm(patch_states, p["ln_kv"], p["ln_kv_b"], LN_EPS)
    k = kv @ p["k_w"]
    v = kv @ p["v_w"]
    # nn.MultiheadAttention's packed in/out projections.
    q = q @ p["mha_q_w"] + p["mha_q_b"]
    k = k @ p["mha_k_w"] + p["mha_k_b"]
    v = v @ p["mha_v_w"] + p["mha_v_b"]
    attn = _attention(q, k, v, heads)
    attn = attn @ p["mha_out_w"] + p["mha_out_b"]
    attn = attn @ p["lin_w"] + p["lin_b"]
    h = layer_norm(attn, p["ln_ff"], p["ln_ff_b"], LN_EPS)
    h = jax.nn.gelu(h @ p["ff_in_w"], approximate=True)
    return h @ p["ff_out_w"]
