"""Aria parameter pytree: random init + HF safetensors import/export.

Text weights use the SAME tree layout as the shared decoder
(qwen25vl/params.py) plus the MoE leaves per layer:
``router`` (D, E), ``moe_fc1`` (E, D, 2F), ``moe_fc2`` (E, F, D), with the
shared-experts SwiGLU reusing ``gate_w/up_w/down_w``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..qwen25vl.params import _check_complete, iter_safetensors
from .config import AriaConfig


def init(cfg: AriaConfig, seed: int = 0) -> dict:
    std = 0.02
    v, t = cfg.vision, cfg.text
    dt = cfg.dtype
    key = jax.random.PRNGKey(seed)
    counter = [0]

    def w(*shape):
        counter[0] += 1
        return (std * jax.random.normal(jax.random.fold_in(key, counter[0]), shape)).astype(dt)

    def zeros(*shape):
        return jnp.zeros(shape, dtype=dt)

    def ones(*shape):
        return jnp.ones(shape, dtype=dt)

    D = v.hidden_size
    patch_dim = v.in_channels * v.patch_size**2
    visual = {
        "patch_embed": w(patch_dim, D),
        "patch_embed_b": zeros(D),
        "pos_embed": w(v.num_patches_per_side**2, D),
        "blocks": [
            {
                "norm1": ones(D), "norm1_b": zeros(D),
                "q_w": w(D, D), "q_b": zeros(D),
                "k_w": w(D, D), "k_b": zeros(D),
                "v_w": w(D, D), "v_b": zeros(D),
                "out_w": w(D, D), "out_b": zeros(D),
                "norm2": ones(D), "norm2_b": zeros(D),
                "fc1_w": w(D, v.intermediate_size), "fc1_b": zeros(v.intermediate_size),
                "fc2_w": w(v.intermediate_size, D), "fc2_b": zeros(D),
            }
            for _ in range(v.num_hidden_layers)
        ],
    }
    projector = {
        "query": w(cfg.max_query_num, D),
        "ln_q": ones(D), "ln_q_b": zeros(D),
        "ln_kv": ones(D), "ln_kv_b": zeros(D),
        "q_w": w(D, D), "k_w": w(D, D), "v_w": w(D, D),
        "mha_q_w": w(D, D), "mha_q_b": zeros(D),
        "mha_k_w": w(D, D), "mha_k_b": zeros(D),
        "mha_v_w": w(D, D), "mha_v_b": zeros(D),
        "mha_out_w": w(D, D), "mha_out_b": zeros(D),
        "lin_w": w(D, D), "lin_b": zeros(D),
        "ln_ff": ones(D), "ln_ff_b": zeros(D),
        "ff_in_w": w(D, t.hidden_size),
        "ff_out_w": w(t.hidden_size, t.hidden_size),
    }

    F = t.intermediate_size
    Fs = F * t.moe_num_shared_experts
    layers = []
    for _ in range(t.num_hidden_layers):
        layers.append(
            {
                "input_norm": ones(t.hidden_size),
                "q_w": w(t.hidden_size, t.num_attention_heads * t.head_dim),
                "k_w": w(t.hidden_size, t.num_key_value_heads * t.head_dim),
                "v_w": w(t.hidden_size, t.num_key_value_heads * t.head_dim),
                "o_w": w(t.num_attention_heads * t.head_dim, t.hidden_size),
                "post_norm": ones(t.hidden_size),
                "router": w(t.hidden_size, t.moe_num_experts),
                "moe_fc1": w(t.moe_num_experts, t.hidden_size, 2 * F),
                "moe_fc2": w(t.moe_num_experts, F, t.hidden_size),
                "gate_w": w(t.hidden_size, Fs),
                "up_w": w(t.hidden_size, Fs),
                "down_w": w(Fs, t.hidden_size),
            }
        )
    text = {
        "embed_tokens": w(t.vocab_size, t.hidden_size),
        "layers": layers,
        "final_norm": ones(t.hidden_size),
        "lm_head": w(t.hidden_size, t.vocab_size),
    }
    return {"visual": visual, "projector": projector, "text": text}


def init_empty(cfg: AriaConfig) -> dict:
    """Tree with the right structure and None leaves (filled by the loader)."""
    v, t = cfg.vision, cfg.text
    block_keys = ("norm1", "norm1_b", "q_w", "q_b", "k_w", "k_b", "v_w", "v_b",
                  "out_w", "out_b", "norm2", "norm2_b", "fc1_w", "fc1_b",
                  "fc2_w", "fc2_b")
    proj_keys = ("query", "ln_q", "ln_q_b", "ln_kv", "ln_kv_b", "q_w", "k_w",
                 "v_w", "mha_q_w", "mha_q_b", "mha_k_w", "mha_k_b", "mha_v_w",
                 "mha_v_b", "mha_out_w", "mha_out_b", "lin_w", "lin_b",
                 "ln_ff", "ln_ff_b", "ff_in_w", "ff_out_w")
    layer_keys = ("input_norm", "q_w", "k_w", "v_w", "o_w", "post_norm",
                  "router", "moe_fc1", "moe_fc2", "gate_w", "up_w", "down_w")
    return {
        "visual": {
            "patch_embed": None, "patch_embed_b": None, "pos_embed": None,
            "blocks": [{k: None for k in block_keys} for _ in range(v.num_hidden_layers)],
        },
        "projector": {k: None for k in proj_keys},
        "text": {
            "embed_tokens": None,
            "layers": [{k: None for k in layer_keys} for _ in range(t.num_hidden_layers)],
            "final_norm": None,
            "lm_head": None,
        },
    }


def from_named_arrays(named: Iterator[tuple[str, np.ndarray]], cfg: AriaConfig) -> dict:
    params = init_empty(cfg)
    dt = cfg.dtype
    D = cfg.vision.hidden_size

    def put(path: list, value, transpose: bool = False):
        arr = value.T if transpose else value
        node = params
        for p in path[:-1]:
            node = node[p]
        node[path[-1]] = jnp.asarray(np.ascontiguousarray(arr), dtype=dt)

    tied_embed = None
    saw_lm_head = False
    for raw_key, arr in named:
        key = raw_key
        for pref in ("model.",):
            if key.startswith(pref):
                key = key[len(pref):]
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
            mapping = {
                "input_layernorm.weight": ("input_norm", False),
                "post_attention_layernorm.weight": ("post_norm", False),
                "self_attn.q_proj.weight": ("q_w", True),
                "self_attn.k_proj.weight": ("k_w", True),
                "self_attn.v_proj.weight": ("v_w", True),
                "self_attn.o_proj.weight": ("o_w", True),
                "mlp.router.weight": ("router", True),
                # (E, D, 2F) / (E, F, D): already input-major per expert.
                "mlp.experts.fc1.weight": ("moe_fc1", False),
                "mlp.experts.fc2.weight": ("moe_fc2", False),
                "mlp.shared_experts.gate_proj.weight": ("gate_w", True),
                "mlp.shared_experts.up_proj.weight": ("up_w", True),
                "mlp.shared_experts.down_proj.weight": ("down_w", True),
            }
            if rest in mapping:
                name, tr = mapping[rest]
                put(["text", "layers", i, name], arr, transpose=tr)
        elif key == "vision_tower.embeddings.patch_embedding.weight":
            put(["visual", "patch_embed"], arr.reshape(arr.shape[0], -1), transpose=True)
        elif key == "vision_tower.embeddings.patch_embedding.bias":
            put(["visual", "patch_embed_b"], arr)
        elif key == "vision_tower.embeddings.position_embedding.weight":
            put(["visual", "pos_embed"], arr)
        elif key.startswith("vision_tower.encoder.layers."):
            parts = key.split(".")
            i = int(parts[3])
            rest = ".".join(parts[4:])
            mapping = {
                "layer_norm1.weight": ("norm1", False),
                "layer_norm1.bias": ("norm1_b", False),
                "layer_norm2.weight": ("norm2", False),
                "layer_norm2.bias": ("norm2_b", False),
                "self_attn.q_proj.weight": ("q_w", True),
                "self_attn.q_proj.bias": ("q_b", False),
                "self_attn.k_proj.weight": ("k_w", True),
                "self_attn.k_proj.bias": ("k_b", False),
                "self_attn.v_proj.weight": ("v_w", True),
                "self_attn.v_proj.bias": ("v_b", False),
                "self_attn.out_proj.weight": ("out_w", True),
                "self_attn.out_proj.bias": ("out_b", False),
                "mlp.fc1.weight": ("fc1_w", True),
                "mlp.fc1.bias": ("fc1_b", False),
                "mlp.fc2.weight": ("fc2_w", True),
                "mlp.fc2.bias": ("fc2_b", False),
            }
            if rest in mapping:
                name, tr = mapping[rest]
                put(["visual", "blocks", i, name], arr, transpose=tr)
        elif key.startswith("multi_modal_projector."):
            rest = key[len("multi_modal_projector."):]
            if rest == "query":
                put(["projector", "query"], arr)
            elif rest == "cross_attn.multihead_attn.in_proj_weight":
                put(["projector", "mha_q_w"], arr[:D], transpose=True)
                put(["projector", "mha_k_w"], arr[D:2 * D], transpose=True)
                put(["projector", "mha_v_w"], arr[2 * D:], transpose=True)
            elif rest == "cross_attn.multihead_attn.in_proj_bias":
                put(["projector", "mha_q_b"], arr[:D])
                put(["projector", "mha_k_b"], arr[D:2 * D])
                put(["projector", "mha_v_b"], arr[2 * D:])
            else:
                mapping = {
                    "cross_attn.q_proj.weight": ("q_w", True),
                    "cross_attn.k_proj.weight": ("k_w", True),
                    "cross_attn.v_proj.weight": ("v_w", True),
                    "cross_attn.multihead_attn.out_proj.weight": ("mha_out_w", True),
                    "cross_attn.multihead_attn.out_proj.bias": ("mha_out_b", False),
                    "cross_attn.linear.weight": ("lin_w", True),
                    "cross_attn.linear.bias": ("lin_b", False),
                    "cross_attn.layer_norm.weight": ("ln_q", False),
                    "cross_attn.layer_norm.bias": ("ln_q_b", False),
                    "cross_attn.layer_norm_kv.weight": ("ln_kv", False),
                    "cross_attn.layer_norm_kv.bias": ("ln_kv_b", False),
                    "layer_norm.weight": ("ln_ff", False),
                    "layer_norm.bias": ("ln_ff_b", False),
                    "feed_forward.linear_in.weight": ("ff_in_w", True),
                    "feed_forward.linear_out.weight": ("ff_out_w", True),
                }
                if rest in mapping:
                    name, tr = mapping[rest]
                    put(["projector", name], arr, transpose=tr)
        # vision_tower.post_layernorm is unused at vision_feature_layer=-1

    if not saw_lm_head:
        if tied_embed is None:
            raise ValueError("checkpoint has neither lm_head nor embed_tokens")
        put(["text", "lm_head"], tied_embed, transpose=True)
    _check_complete(params)
    return params


def from_torch_state_dict(state_dict, cfg: AriaConfig) -> dict:
    def gen():
        for key, tensor in state_dict.items():
            yield key, tensor.detach().to("cpu").float().numpy()

    return from_named_arrays(gen(), cfg)


def load_pretrained(model_dir: str, cfg: AriaConfig | None = None) -> tuple[dict, AriaConfig]:
    if cfg is None:
        cfg = AriaConfig.from_pretrained(model_dir)
    return from_named_arrays(iter_safetensors(model_dir), cfg), cfg


def save_safetensors(params: dict, cfg: AriaConfig, out_path: str):
    """Export the param tree back to HF-convention safetensors (inverse of
    the import mapping; one file)."""
    from safetensors.numpy import save_file

    flat: dict[str, np.ndarray] = {}

    def to_np(x):
        return np.ascontiguousarray(np.asarray(jax.device_get(x), dtype=np.float32))

    def to_np_t(x):
        return np.ascontiguousarray(to_np(x).T)

    t = params["text"]
    flat["model.language_model.embed_tokens.weight"] = to_np(t["embed_tokens"])
    flat["model.language_model.norm.weight"] = to_np(t["final_norm"])
    flat["lm_head.weight"] = to_np_t(t["lm_head"])
    for i, layer in enumerate(t["layers"]):
        p = f"model.language_model.layers.{i}."
        flat[p + "input_layernorm.weight"] = to_np(layer["input_norm"])
        flat[p + "post_attention_layernorm.weight"] = to_np(layer["post_norm"])
        flat[p + "self_attn.q_proj.weight"] = to_np_t(layer["q_w"])
        flat[p + "self_attn.k_proj.weight"] = to_np_t(layer["k_w"])
        flat[p + "self_attn.v_proj.weight"] = to_np_t(layer["v_w"])
        flat[p + "self_attn.o_proj.weight"] = to_np_t(layer["o_w"])
        flat[p + "mlp.router.weight"] = to_np_t(layer["router"])
        flat[p + "mlp.experts.fc1.weight"] = to_np(layer["moe_fc1"])
        flat[p + "mlp.experts.fc2.weight"] = to_np(layer["moe_fc2"])
        flat[p + "mlp.shared_experts.gate_proj.weight"] = to_np_t(layer["gate_w"])
        flat[p + "mlp.shared_experts.up_proj.weight"] = to_np_t(layer["up_w"])
        flat[p + "mlp.shared_experts.down_proj.weight"] = to_np_t(layer["down_w"])

    vis = params["visual"]
    v = cfg.vision
    flat["model.vision_tower.embeddings.patch_embedding.weight"] = (
        to_np_t(vis["patch_embed"]).reshape(
            v.hidden_size, v.in_channels, v.patch_size, v.patch_size
        )
    )
    flat["model.vision_tower.embeddings.patch_embedding.bias"] = to_np(vis["patch_embed_b"])
    flat["model.vision_tower.embeddings.position_embedding.weight"] = to_np(vis["pos_embed"])
    for i, b in enumerate(vis["blocks"]):
        p = f"model.vision_tower.encoder.layers.{i}."
        flat[p + "layer_norm1.weight"] = to_np(b["norm1"])
        flat[p + "layer_norm1.bias"] = to_np(b["norm1_b"])
        flat[p + "layer_norm2.weight"] = to_np(b["norm2"])
        flat[p + "layer_norm2.bias"] = to_np(b["norm2_b"])
        flat[p + "self_attn.q_proj.weight"] = to_np_t(b["q_w"])
        flat[p + "self_attn.q_proj.bias"] = to_np(b["q_b"])
        flat[p + "self_attn.k_proj.weight"] = to_np_t(b["k_w"])
        flat[p + "self_attn.k_proj.bias"] = to_np(b["k_b"])
        flat[p + "self_attn.v_proj.weight"] = to_np_t(b["v_w"])
        flat[p + "self_attn.v_proj.bias"] = to_np(b["v_b"])
        flat[p + "self_attn.out_proj.weight"] = to_np_t(b["out_w"])
        flat[p + "self_attn.out_proj.bias"] = to_np(b["out_b"])
        flat[p + "mlp.fc1.weight"] = to_np_t(b["fc1_w"])
        flat[p + "mlp.fc1.bias"] = to_np(b["fc1_b"])
        flat[p + "mlp.fc2.weight"] = to_np_t(b["fc2_w"])
        flat[p + "mlp.fc2.bias"] = to_np(b["fc2_b"])

    pj = params["projector"]
    pp = "model.multi_modal_projector."
    flat[pp + "query"] = to_np(pj["query"])
    flat[pp + "cross_attn.q_proj.weight"] = to_np_t(pj["q_w"])
    flat[pp + "cross_attn.k_proj.weight"] = to_np_t(pj["k_w"])
    flat[pp + "cross_attn.v_proj.weight"] = to_np_t(pj["v_w"])
    flat[pp + "cross_attn.multihead_attn.in_proj_weight"] = np.concatenate(
        [to_np_t(pj["mha_q_w"]), to_np_t(pj["mha_k_w"]), to_np_t(pj["mha_v_w"])], axis=0
    )
    flat[pp + "cross_attn.multihead_attn.in_proj_bias"] = np.concatenate(
        [to_np(pj["mha_q_b"]), to_np(pj["mha_k_b"]), to_np(pj["mha_v_b"])], axis=0
    )
    flat[pp + "cross_attn.multihead_attn.out_proj.weight"] = to_np_t(pj["mha_out_w"])
    flat[pp + "cross_attn.multihead_attn.out_proj.bias"] = to_np(pj["mha_out_b"])
    flat[pp + "cross_attn.linear.weight"] = to_np_t(pj["lin_w"])
    flat[pp + "cross_attn.linear.bias"] = to_np(pj["lin_b"])
    flat[pp + "cross_attn.layer_norm.weight"] = to_np(pj["ln_q"])
    flat[pp + "cross_attn.layer_norm.bias"] = to_np(pj["ln_q_b"])
    flat[pp + "cross_attn.layer_norm_kv.weight"] = to_np(pj["ln_kv"])
    flat[pp + "cross_attn.layer_norm_kv.bias"] = to_np(pj["ln_kv_b"])
    flat[pp + "layer_norm.weight"] = to_np(pj["ln_ff"])
    flat[pp + "layer_norm.bias"] = to_np(pj["ln_ff_b"])
    flat[pp + "feed_forward.linear_in.weight"] = to_np_t(pj["ff_in_w"])
    flat[pp + "feed_forward.linear_out.weight"] = to_np_t(pj["ff_out_w"])
    save_file(flat, out_path)
