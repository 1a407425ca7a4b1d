"""Parameter pytree: random init + HF safetensors import.

Tree layout (all linear weights stored input-major, i.e. ``x @ W``):

visual:
  patch_embed (patch_dim, D)
  blocks[i]: norm1, qkv_w, qkv_b, proj_w, proj_b, norm2,
             gate_w/b, up_w/b, down_w/b
  merger: ln_q, fc1_w/b, fc2_w/b
text:
  embed_tokens (vocab, D)
  layers[i]: input_norm, q_w/b, k_w/b, v_w/b, o_w, post_norm,
             gate_w, up_w, down_w
  final_norm, lm_head (D, vocab)
"""

from __future__ import annotations

import json
import os
from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from .config import Qwen25VLConfig


def init(
    cfg: Qwen25VLConfig,
    seed: int = 0,
    quantize_text: bool = False,
    quantize_vision: bool = False,
) -> dict:
    """Random normal(0.02) init, matching the HF initializer scale.

    Weights are generated on-device with jax.random (host numpy generation
    of the 0.5B-element embedding tables takes minutes; on device it's ms).

    ``quantize_text=True`` int8-quantizes each decoder layer *as it is
    built*, so a full 7B never materializes in bf16 — required to stand up
    the 28-layer model on a single 16 GB chip. ``quantize_vision=True``
    does the same for ViT block matmuls (the w8a8 prefill path).
    """
    std = 0.02
    v, t = cfg.vision, cfg.text
    dt = cfg.dtype
    key = jax.random.PRNGKey(seed)
    counter = [0]

    def w(*shape):
        counter[0] += 1
        return (std * jax.random.normal(jax.random.fold_in(key, counter[0]), shape)).astype(dt)

    def maybe_q(leaf, enabled=None):
        mode = quantize_text if enabled is None else enabled
        if not mode:
            return leaf
        return _quantize_leaf(leaf, mode)

    def vw(*shape):
        return maybe_q(w(*shape), enabled=quantize_vision)

    def zeros(*shape):
        return jnp.zeros(shape, dtype=dt)

    def ones(*shape):
        return jnp.ones(shape, dtype=dt)

    def block():
        b = {
            "norm1": ones(v.hidden_size),
            "qkv_w": vw(v.hidden_size, 3 * v.hidden_size),
            "qkv_b": zeros(3 * v.hidden_size),
            "proj_w": vw(v.hidden_size, v.hidden_size),
            "proj_b": zeros(v.hidden_size),
            "norm2": ones(v.hidden_size),
        }
        if v.act_type in ("quickgelu", "gelu_tanh"):  # Qwen2/Qwen3-VL fc1/fc2
            b.update(
                fc1_w=vw(v.hidden_size, v.intermediate_size),
                fc1_b=zeros(v.intermediate_size),
                fc2_w=vw(v.intermediate_size, v.hidden_size),
                fc2_b=zeros(v.hidden_size),
            )
        else:
            b.update(
                gate_w=vw(v.hidden_size, v.intermediate_size),
                gate_b=zeros(v.intermediate_size),
                up_w=vw(v.hidden_size, v.intermediate_size),
                up_b=zeros(v.intermediate_size),
                down_w=vw(v.intermediate_size, v.hidden_size),
                down_b=zeros(v.hidden_size),
            )
        if v.norm_type == "layernorm":  # Qwen2-VL LayerNorm biases
            b.update(norm1_b=zeros(v.hidden_size), norm2_b=zeros(v.hidden_size))
        return b

    def merger(postshuffle: bool = False):
        m = {
            "ln_q": ones(
                v.hidden_size * v.merge_unit if postshuffle else v.hidden_size
            ),
            "fc1_w": w(v.hidden_size * v.merge_unit, v.hidden_size * v.merge_unit),
            "fc1_b": zeros(v.hidden_size * v.merge_unit),
            "fc2_w": w(v.hidden_size * v.merge_unit, v.out_hidden_size),
            "fc2_b": zeros(v.out_hidden_size),
        }
        if v.norm_type == "layernorm":
            m["ln_q_b"] = zeros(
                v.hidden_size * v.merge_unit if postshuffle else v.hidden_size
            )
        return m

    visual = {
        "patch_embed": w(v.patch_dim, v.hidden_size),
        "blocks": [block() for _ in range(v.depth)],
        "merger": merger(),
    }
    if v.patch_embed_bias:
        visual["patch_embed_b"] = zeros(v.hidden_size)
    if v.num_position_embeddings:
        visual["pos_embed"] = w(v.num_position_embeddings, v.hidden_size)
    if v.deepstack_visual_indexes:
        visual["deepstack"] = [
            merger(postshuffle=True) for _ in v.deepstack_visual_indexes
        ]
    moe_f = t.moe_intermediate_size or t.intermediate_size
    layers = []
    for _ in range(t.num_hidden_layers):
        layer = {
            "input_norm": ones(t.hidden_size),
            "q_w": maybe_q(w(t.hidden_size, t.num_attention_heads * t.head_dim)),
            "k_w": maybe_q(w(t.hidden_size, t.num_key_value_heads * t.head_dim)),
            "v_w": maybe_q(w(t.hidden_size, t.num_key_value_heads * t.head_dim)),
            "o_w": maybe_q(w(t.num_attention_heads * t.head_dim, t.hidden_size)),
            "post_norm": ones(t.hidden_size),
        }
        if t.moe_num_experts:
            # Qwen3-VL-MoE: routed experts only (no shared-experts SwiGLU)
            layer.update(
                router=w(t.hidden_size, t.moe_num_experts),
                moe_fc1=w(t.moe_num_experts, t.hidden_size, 2 * moe_f),
                moe_fc2=w(t.moe_num_experts, moe_f, t.hidden_size),
            )
        else:
            layer.update(
                gate_w=maybe_q(w(t.hidden_size, t.intermediate_size)),
                up_w=maybe_q(w(t.hidden_size, t.intermediate_size)),
                down_w=maybe_q(w(t.intermediate_size, t.hidden_size)),
            )
        if t.attention_bias:
            layer["q_b"] = zeros(t.num_attention_heads * t.head_dim)
            layer["k_b"] = zeros(t.num_key_value_heads * t.head_dim)
            layer["v_b"] = zeros(t.num_key_value_heads * t.head_dim)
        if t.use_qk_norm:
            layer["q_norm"] = ones(t.head_dim)
            layer["k_norm"] = ones(t.head_dim)
        layers.append(layer)
    text = {
        "embed_tokens": w(t.vocab_size, t.hidden_size),
        "layers": layers,
        "final_norm": ones(t.hidden_size),
        "lm_head": maybe_q(w(t.hidden_size, t.vocab_size)),
    }
    return {"visual": visual, "text": text}


# --------------------------------------------------------------------------
# HF import
# --------------------------------------------------------------------------


def _normalize_key(key: str) -> str:
    """Map the several released checkpoint prefixes onto one scheme:
    text weights -> 'language_model.', vision -> 'visual.'."""
    if key.startswith("model.language_model."):
        return "language_model." + key[len("model.language_model.") :]
    if key.startswith("model.visual."):
        return "visual." + key[len("model.visual.") :]
    if key.startswith("model."):
        return "language_model." + key[len("model.") :]
    return key  # visual.*, lm_head.*


_QUANT_TEXT_LEAVES = frozenset(
    {"q_w", "k_w", "v_w", "o_w", "gate_w", "up_w", "down_w", "lm_head"}
)


def _quantize_leaf(leaf, mode):
    """int8/int4 quantization of one matmul weight; ``mode`` is True/"int8"
    for per-channel int8 or "int4" for group-128 packed int4 (falling back
    to int8 when the in-dim does not divide the group)."""
    if mode == "int4" and leaf.shape[0] % 128 == 0:
        from ...ops.int4 import quantize_weight_int4

        out = quantize_weight_int4(leaf, group=128)
    else:
        from ...ops.quant import quantize_weight

        out = quantize_weight(leaf)
    if not isinstance(leaf, jax.core.Tracer):
        # Free the bf16 original eagerly (a full 7B must never coexist with
        # its quantized copy on a 16 GB chip); no-op under tracing so the
        # init stays eval_shape-able (scripts/hbm_feasibility.py).
        leaf.delete()
    return out

# ViT block matmuls (attention + all three MLP variants). Quantizing these
# matters for COMPUTE (w8a8 prefill, ops/quant.py a8_acts), not HBM; the
# patch embed and merger stay bf16.
_QUANT_VISION_LEAVES = frozenset(
    {"qkv_w", "proj_w", "fc1_w", "fc2_w", "gate_w", "up_w", "down_w"}
)


def from_named_arrays(
    named: Iterator[tuple[str, np.ndarray]],
    cfg: Qwen25VLConfig,
    quantize_text: bool = False,
    quantize_vision: bool = False,
) -> dict:
    """Build the param tree from (hf_name, numpy array) pairs.

    ``quantize_text=True`` int8-quantizes each decoder matmul weight AS IT
    STREAMS IN, so loading the released 7B checkpoint never materializes a
    full bf16 decoder on-chip (same leaves as ``init(quantize_text=True)``).
    ``quantize_vision=True`` does the same for the ViT block matmuls.
    """
    v, t = cfg.vision, cfg.text
    dt = cfg.dtype
    params = init_empty(cfg)

    def put(path: list, value: np.ndarray, transpose: bool = False):
        arr = value.T if transpose else value
        leaf = jnp.asarray(arr, dtype=dt)
        if (
            quantize_text
            and path[0] == "text"
            and path[-1] in _QUANT_TEXT_LEAVES
        ):
            leaf = _quantize_leaf(leaf, quantize_text)
        elif (
            quantize_vision
            and path[0] == "visual"
            and len(path) > 2
            and path[1] == "blocks"
            and path[-1] in _QUANT_VISION_LEAVES
        ):
            leaf = _quantize_leaf(leaf, quantize_vision)
        node = params
        for p in path[:-1]:
            node = node[p]
        node[path[-1]] = leaf

    tied_embed = None
    saw_lm_head = False
    for raw_key, arr in named:
        key = _normalize_key(raw_key)
        if key == "language_model.embed_tokens.weight":
            put(["text", "embed_tokens"], arr)
            tied_embed = arr
        elif key == "language_model.norm.weight":
            put(["text", "final_norm"], arr)
        elif key == "lm_head.weight":
            put(["text", "lm_head"], arr, transpose=True)
            saw_lm_head = True
        elif key.startswith("language_model.layers."):
            parts = key.split(".")
            i = int(parts[2])
            rest = ".".join(parts[3:])
            layer = ["text", "layers", i]
            mapping = {
                "input_layernorm.weight": ("input_norm", False),
                "post_attention_layernorm.weight": ("post_norm", False),
                "self_attn.q_proj.weight": ("q_w", True),
                "self_attn.q_proj.bias": ("q_b", False),
                "self_attn.k_proj.weight": ("k_w", True),
                "self_attn.k_proj.bias": ("k_b", False),
                "self_attn.v_proj.weight": ("v_w", True),
                "self_attn.v_proj.bias": ("v_b", False),
                "self_attn.o_proj.weight": ("o_w", True),
                # Qwen3: per-head-dim q/k RMSNorm
                "self_attn.q_norm.weight": ("q_norm", False),
                "self_attn.k_norm.weight": ("k_norm", False),
                "mlp.gate_proj.weight": ("gate_w", True),
                "mlp.up_proj.weight": ("up_w", True),
                "mlp.down_proj.weight": ("down_w", True),
                # Qwen3-VL-MoE sparse block (experts are bare nn.Parameters;
                # (E, D, 2F) / (E, F, D) are already input-major per expert)
                "mlp.gate.weight": ("router", True),
                "mlp.experts.gate_up_proj": ("moe_fc1", False),
                "mlp.experts.down_proj": ("moe_fc2", False),
            }
            if rest in mapping:
                name, tr = mapping[rest]
                put(layer + [name], arr, transpose=tr)
        elif key == "visual.patch_embed.proj.weight":
            # Conv3d (D, C, tps, psz, psz) with full-kernel stride == linear
            # over the flattened patch: reshape then transpose to (patch_dim, D).
            put(["visual", "patch_embed"], arr.reshape(arr.shape[0], -1), transpose=True)
        elif key == "visual.patch_embed.proj.bias":
            put(["visual", "patch_embed_b"], arr)
        elif key == "visual.pos_embed.weight":
            put(["visual", "pos_embed"], arr)
        elif key.startswith("visual.deepstack_merger_list."):
            parts = key.split(".")
            j = int(parts[2])
            rest = ".".join(parts[3:])
            mapping = {
                "norm.weight": ("ln_q", False),
                "norm.bias": ("ln_q_b", False),
                "linear_fc1.weight": ("fc1_w", True),
                "linear_fc1.bias": ("fc1_b", False),
                "linear_fc2.weight": ("fc2_w", True),
                "linear_fc2.bias": ("fc2_b", False),
            }
            if rest in mapping:
                name, tr = mapping[rest]
                put(["visual", "deepstack", j, name], arr, transpose=tr)
        elif key.startswith("visual.blocks."):
            parts = key.split(".")
            i = int(parts[2])
            rest = ".".join(parts[3:])
            layer = ["visual", "blocks", i]
            mapping = {
                "norm1.weight": ("norm1", False),
                "norm2.weight": ("norm2", False),
                # Qwen2-VL LayerNorm biases (Qwen2.5-VL's RMSNorm has none)
                "norm1.bias": ("norm1_b", False),
                "norm2.bias": ("norm2_b", False),
                "attn.qkv.weight": ("qkv_w", True),
                "attn.qkv.bias": ("qkv_b", False),
                "attn.proj.weight": ("proj_w", True),
                "attn.proj.bias": ("proj_b", False),
                "mlp.gate_proj.weight": ("gate_w", True),
                "mlp.gate_proj.bias": ("gate_b", False),
                "mlp.up_proj.weight": ("up_w", True),
                "mlp.up_proj.bias": ("up_b", False),
                "mlp.down_proj.weight": ("down_w", True),
                "mlp.down_proj.bias": ("down_b", False),
                # Qwen2-VL VisionMlp
                "mlp.fc1.weight": ("fc1_w", True),
                "mlp.fc1.bias": ("fc1_b", False),
                "mlp.fc2.weight": ("fc2_w", True),
                "mlp.fc2.bias": ("fc2_b", False),
                # Qwen3-VL VisionMLP
                "mlp.linear_fc1.weight": ("fc1_w", True),
                "mlp.linear_fc1.bias": ("fc1_b", False),
                "mlp.linear_fc2.weight": ("fc2_w", True),
                "mlp.linear_fc2.bias": ("fc2_b", False),
            }
            if rest in mapping:
                name, tr = mapping[rest]
                put(layer + [name], arr, transpose=tr)
        elif key in ("visual.merger.ln_q.weight", "visual.merger.norm.weight"):
            put(["visual", "merger", "ln_q"], arr)
        elif key in ("visual.merger.ln_q.bias", "visual.merger.norm.bias"):
            put(["visual", "merger", "ln_q_b"], arr)
        elif key == "visual.merger.linear_fc1.weight":
            put(["visual", "merger", "fc1_w"], arr, transpose=True)
        elif key == "visual.merger.linear_fc1.bias":
            put(["visual", "merger", "fc1_b"], arr)
        elif key == "visual.merger.linear_fc2.weight":
            put(["visual", "merger", "fc2_w"], arr, transpose=True)
        elif key == "visual.merger.linear_fc2.bias":
            put(["visual", "merger", "fc2_b"], arr)
        elif key == "visual.merger.mlp.0.weight":
            put(["visual", "merger", "fc1_w"], arr, transpose=True)
        elif key == "visual.merger.mlp.0.bias":
            put(["visual", "merger", "fc1_b"], arr)
        elif key == "visual.merger.mlp.2.weight":
            put(["visual", "merger", "fc2_w"], arr, transpose=True)
        elif key == "visual.merger.mlp.2.bias":
            put(["visual", "merger", "fc2_b"], arr)
        # rotary inv_freq buffers etc. are derived, not loaded

    if not saw_lm_head:
        if tied_embed is None:
            raise ValueError("checkpoint has neither lm_head.weight nor embed_tokens.weight")
        put(["text", "lm_head"], tied_embed, transpose=True)

    # Text-only checkpoints (e.g. the Qwen2.5-72B judge, eval_all.sh:18) have
    # no vision tower; drop the empty branch rather than failing the check.
    if params["visual"]["patch_embed"] is None:
        params["visual"] = None

    _check_complete(params)
    return params


def init_empty(cfg: Qwen25VLConfig) -> dict:
    """Tree with the right structure and None leaves (filled by the loader)."""
    v, t = cfg.vision, cfg.text
    block_keys = ["norm1", "qkv_w", "qkv_b", "proj_w", "proj_b", "norm2"]
    if v.act_type in ("quickgelu", "gelu_tanh"):
        block_keys += ["fc1_w", "fc1_b", "fc2_w", "fc2_b"]
    else:
        block_keys += ["gate_w", "gate_b", "up_w", "up_b", "down_w", "down_b"]
    merger_keys = ["ln_q", "fc1_w", "fc1_b", "fc2_w", "fc2_b"]
    if v.norm_type == "layernorm":
        block_keys += ["norm1_b", "norm2_b"]
        merger_keys += ["ln_q_b"]
    visual = {
        "patch_embed": None,
        "blocks": [{k: None for k in block_keys} for _ in range(v.depth)],
        "merger": {k: None for k in merger_keys},
    }
    if v.patch_embed_bias:
        visual["patch_embed_b"] = None
    if v.num_position_embeddings:
        visual["pos_embed"] = None
    if v.deepstack_visual_indexes:
        visual["deepstack"] = [
            {k: None for k in merger_keys} for _ in v.deepstack_visual_indexes
        ]
    layer_keys = ["input_norm", "q_w", "k_w", "v_w", "o_w", "post_norm"]
    if t.moe_num_experts:
        layer_keys += ["router", "moe_fc1", "moe_fc2"]
    else:
        layer_keys += ["gate_w", "up_w", "down_w"]
    if t.attention_bias:
        layer_keys += ["q_b", "k_b", "v_b"]
    if t.use_qk_norm:
        layer_keys += ["q_norm", "k_norm"]
    return {
        "visual": visual,
        "text": {
            "embed_tokens": None,
            "layers": [
                {k: None for k in layer_keys}
                for _ in range(t.num_hidden_layers)
            ],
            "final_norm": None,
            "lm_head": None,
        },
    }


def _check_complete(params: Any, path: str = ""):
    if path == ".visual" and params is None:
        return  # text-only checkpoint
    if isinstance(params, dict):
        for k, val in params.items():
            _check_complete(val, f"{path}.{k}")
    elif isinstance(params, list):
        for i, val in enumerate(params):
            _check_complete(val, f"{path}[{i}]")
    elif params is None:
        raise ValueError(f"missing parameter: {path}")


def from_torch_state_dict(
    state_dict,
    cfg: Qwen25VLConfig,
    quantize_text: bool = False,
    quantize_vision: bool = False,
) -> dict:
    """Import from an in-memory torch state dict (tests / conversions)."""
    def gen():
        for key, tensor in state_dict.items():
            yield key, tensor.detach().to("cpu").float().numpy()

    return from_named_arrays(
        gen(), cfg, quantize_text=quantize_text, quantize_vision=quantize_vision
    )


def iter_safetensors(model_dir: str) -> Iterator[tuple[str, np.ndarray]]:
    """Yield (name, array) across a model dir's safetensors shards
    (index-file order when present). Shared by every family's loader."""
    from safetensors import safe_open

    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        shards = sorted(set(index["weight_map"].values()))
    else:
        shards = [f for f in os.listdir(model_dir) if f.endswith(".safetensors")]
    for shard in shards:
        with safe_open(os.path.join(model_dir, shard), framework="numpy") as f:
            for key in f.keys():
                yield key, f.get_tensor(key)


def load_pretrained(
    model_dir: str,
    cfg: Qwen25VLConfig | None = None,
    quantize_text: bool = False,
    quantize_vision: bool = False,
) -> tuple[dict, Qwen25VLConfig]:
    """Load from an HF model directory of safetensors shards.

    ``quantize_text=True`` streams each decoder matmul to int8 during the
    shard read — the full 7B loads into ~9.5 GB instead of 16.6 GB bf16
    (which would not fit a single 16 GB chip alongside a KV cache).
    ``quantize_vision=True`` streams the ViT block matmuls to int8 (pairs
    with the engine's a8_prefill for 2x MXU throughput in the tower)."""
    if cfg is None:
        cfg = Qwen25VLConfig.from_pretrained(model_dir)
    return (
        from_named_arrays(
            iter_safetensors(model_dir), cfg,
            quantize_text=quantize_text, quantize_vision=quantize_vision,
        ),
        cfg,
    )


def save_safetensors(params: dict, cfg: Qwen25VLConfig, out_path: str):
    """Export the param tree back to HF-convention safetensors (one file)."""
    from safetensors.numpy import save_file

    flat: dict[str, np.ndarray] = {}

    def to_np(x):
        return np.ascontiguousarray(np.asarray(jax.device_get(x), dtype=np.float32))

    def to_np_t(x):
        # safetensors serializes the raw buffer; transposed views must be
        # materialized or the transpose is silently lost.
        return np.ascontiguousarray(to_np(x).T)

    t = params["text"]
    flat["model.embed_tokens.weight"] = to_np(t["embed_tokens"])
    flat["model.norm.weight"] = to_np(t["final_norm"])
    flat["lm_head.weight"] = to_np_t(t["lm_head"])
    for i, layer in enumerate(t["layers"]):
        p = f"model.layers.{i}."
        flat[p + "input_layernorm.weight"] = to_np(layer["input_norm"])
        flat[p + "post_attention_layernorm.weight"] = to_np(layer["post_norm"])
        flat[p + "self_attn.q_proj.weight"] = to_np_t(layer["q_w"])
        flat[p + "self_attn.k_proj.weight"] = to_np_t(layer["k_w"])
        flat[p + "self_attn.v_proj.weight"] = to_np_t(layer["v_w"])
        if "q_b" in layer:
            flat[p + "self_attn.q_proj.bias"] = to_np(layer["q_b"])
            flat[p + "self_attn.k_proj.bias"] = to_np(layer["k_b"])
            flat[p + "self_attn.v_proj.bias"] = to_np(layer["v_b"])
        if "q_norm" in layer:
            flat[p + "self_attn.q_norm.weight"] = to_np(layer["q_norm"])
            flat[p + "self_attn.k_norm.weight"] = to_np(layer["k_norm"])
        flat[p + "self_attn.o_proj.weight"] = to_np_t(layer["o_w"])
        if "router" in layer:
            flat[p + "mlp.gate.weight"] = to_np_t(layer["router"])
            flat[p + "mlp.experts.gate_up_proj"] = to_np(layer["moe_fc1"])
            flat[p + "mlp.experts.down_proj"] = to_np(layer["moe_fc2"])
        else:
            flat[p + "mlp.gate_proj.weight"] = to_np_t(layer["gate_w"])
            flat[p + "mlp.up_proj.weight"] = to_np_t(layer["up_w"])
            flat[p + "mlp.down_proj.weight"] = to_np_t(layer["down_w"])

    vis = params["visual"]
    v = cfg.vision
    qwen3 = v.act_type == "gelu_tanh"
    flat["visual.patch_embed.proj.weight"] = (
        to_np_t(vis["patch_embed"]).reshape(
            v.hidden_size, v.in_channels, v.temporal_patch_size, v.patch_size, v.patch_size
        )
    )
    if v.patch_embed_bias:
        flat["visual.patch_embed.proj.bias"] = to_np(vis["patch_embed_b"])
    if v.num_position_embeddings:
        flat["visual.pos_embed.weight"] = to_np(vis["pos_embed"])
    for i, b in enumerate(vis["blocks"]):
        p = f"visual.blocks.{i}."
        flat[p + "norm1.weight"] = to_np(b["norm1"])
        flat[p + "norm2.weight"] = to_np(b["norm2"])
        if v.norm_type == "layernorm":
            flat[p + "norm1.bias"] = to_np(b["norm1_b"])
            flat[p + "norm2.bias"] = to_np(b["norm2_b"])
        flat[p + "attn.qkv.weight"] = to_np_t(b["qkv_w"])
        flat[p + "attn.qkv.bias"] = to_np(b["qkv_b"])
        flat[p + "attn.proj.weight"] = to_np_t(b["proj_w"])
        flat[p + "attn.proj.bias"] = to_np(b["proj_b"])
        if qwen3:
            flat[p + "mlp.linear_fc1.weight"] = to_np_t(b["fc1_w"])
            flat[p + "mlp.linear_fc1.bias"] = to_np(b["fc1_b"])
            flat[p + "mlp.linear_fc2.weight"] = to_np_t(b["fc2_w"])
            flat[p + "mlp.linear_fc2.bias"] = to_np(b["fc2_b"])
        elif v.act_type == "quickgelu":
            flat[p + "mlp.fc1.weight"] = to_np_t(b["fc1_w"])
            flat[p + "mlp.fc1.bias"] = to_np(b["fc1_b"])
            flat[p + "mlp.fc2.weight"] = to_np_t(b["fc2_w"])
            flat[p + "mlp.fc2.bias"] = to_np(b["fc2_b"])
        else:
            flat[p + "mlp.gate_proj.weight"] = to_np_t(b["gate_w"])
            flat[p + "mlp.gate_proj.bias"] = to_np(b["gate_b"])
            flat[p + "mlp.up_proj.weight"] = to_np_t(b["up_w"])
            flat[p + "mlp.up_proj.bias"] = to_np(b["up_b"])
            flat[p + "mlp.down_proj.weight"] = to_np_t(b["down_w"])
            flat[p + "mlp.down_proj.bias"] = to_np(b["down_b"])

    def save_merger(prefix: str, m: dict):
        if qwen3:
            flat[prefix + "norm.weight"] = to_np(m["ln_q"])
            flat[prefix + "norm.bias"] = to_np(m["ln_q_b"])
            flat[prefix + "linear_fc1.weight"] = to_np_t(m["fc1_w"])
            flat[prefix + "linear_fc1.bias"] = to_np(m["fc1_b"])
            flat[prefix + "linear_fc2.weight"] = to_np_t(m["fc2_w"])
            flat[prefix + "linear_fc2.bias"] = to_np(m["fc2_b"])
        else:
            flat[prefix + "ln_q.weight"] = to_np(m["ln_q"])
            if v.norm_type == "layernorm":
                flat[prefix + "ln_q.bias"] = to_np(m["ln_q_b"])
            flat[prefix + "mlp.0.weight"] = to_np_t(m["fc1_w"])
            flat[prefix + "mlp.0.bias"] = to_np(m["fc1_b"])
            flat[prefix + "mlp.2.weight"] = to_np_t(m["fc2_w"])
            flat[prefix + "mlp.2.bias"] = to_np(m["fc2_b"])

    save_merger("visual.merger.", vis["merger"])
    for j, m in enumerate(vis.get("deepstack", []) or []):
        save_merger(f"visual.deepstack_merger_list.{j}.", m)
    save_file(flat, out_path)
