"""Aria configuration (the third model family the reference dispatches on,
grpo_trainer.py:211-219 / :239-240).

Aria = an Idefics3/SigLIP-style vision tower + a cross-attention projector
with a learned query bank + a llama-style MoE text decoder. The text side
reuses the shared :class:`TextConfig` (qwen25vl/config.py) with the MoE
fields set and ``mrope_section = (head_dim // 2, 0, 0)`` — with identical
positions on all three axes, chunked M-RoPE degenerates to standard 1-D
rope, so the whole text stack (text.py, engine, trainers, sharding rules)
serves Aria unchanged.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax.numpy as jnp

from ..qwen25vl.config import TextConfig


@dataclasses.dataclass(frozen=True)
class AriaVisionConfig:
    """Idefics3VisionConfig fields the tower uses."""

    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    in_channels: int = 3
    image_size: int = 980
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    # Engine-surface compatibility (qwen get_rope_index reads it; Aria has
    # no spatial merging — projector queries replace patch tokens 1:1).
    spatial_merge_size: int = 1

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def num_patches_per_side(self) -> int:
        return self.image_size // self.patch_size


@dataclasses.dataclass(frozen=True)
class AriaConfig:
    vision: AriaVisionConfig = dataclasses.field(default_factory=AriaVisionConfig)
    text: TextConfig = dataclasses.field(default_factory=TextConfig)
    # image patch count -> projector query count (HF
    # projector_patch_to_query_dict); keys/values as sorted tuple of pairs
    # so the config stays hashable.
    patch_to_query: tuple[tuple[int, int], ...] = ((1225, 128), (4900, 256))
    image_token_id: int = 9
    bos_token_id: int = 1
    eos_token_id: int = 2
    pad_token_id: int = 2
    dtype: Any = jnp.bfloat16
    model_type: str = "aria"
    # Engine-surface compatibility: Aria has no video/vision-start tokens;
    # ids that never occur keep the shared engine paths inert.
    video_token_id: int = -1
    vision_start_token_id: int = -2

    @property
    def max_query_num(self) -> int:
        return max(q for _, q in self.patch_to_query)

    def query_num(self, num_patches: int) -> int:
        for p, q in self.patch_to_query:
            if p == num_patches:
                return q
        raise KeyError(
            f"num_patches {num_patches} not in patch_to_query "
            f"{dict(self.patch_to_query)} (HF AriaProjector contract)"
        )

    @staticmethod
    def from_hf_dict(d: dict[str, Any], dtype=jnp.bfloat16) -> "AriaConfig":
        v = d.get("vision_config", {})
        t = d.get("text_config", {})
        vision = AriaVisionConfig(
            hidden_size=v.get("hidden_size", 1152),
            intermediate_size=v.get("intermediate_size", 4304),
            num_hidden_layers=v.get("num_hidden_layers", 27),
            num_attention_heads=v.get("num_attention_heads", 16),
            in_channels=v.get("num_channels", 3),
            image_size=v.get("image_size", 980),
            patch_size=v.get("patch_size", 14),
            layer_norm_eps=v.get("layer_norm_eps", 1e-6),
        )
        hidden = t.get("hidden_size", 2560)
        heads = t.get("num_attention_heads", 20)
        explicit_hd = t.get("head_dim")
        head_dim = explicit_hd if explicit_hd is not None else hidden // heads
        text = TextConfig(
            vocab_size=t.get("vocab_size", 100352),
            hidden_size=hidden,
            intermediate_size=t.get("intermediate_size", 13568),
            num_hidden_layers=t.get("num_hidden_layers", 28),
            num_attention_heads=heads,
            num_key_value_heads=t.get("num_key_value_heads", 20),
            rms_norm_eps=t.get("rms_norm_eps", 1e-5),
            rope_theta=t.get("rope_theta", 5000000.0),
            # Chunked M-RoPE with everything in the T section == 1-D rope.
            mrope_section=(head_dim // 2, 0, 0),
            explicit_head_dim=explicit_hd,
            tie_word_embeddings=t.get("tie_word_embeddings", False),
            max_position_embeddings=t.get("max_position_embeddings", 65536),
            attention_bias=t.get("attention_bias", False),
            moe_num_experts=t.get("moe_num_experts", 66),
            moe_topk=t.get("moe_topk", 6),
            moe_num_shared_experts=t.get("moe_num_shared_experts", 2),
        )
        p2q = d.get("projector_patch_to_query_dict", {1225: 128, 4900: 256})
        return AriaConfig(
            vision=vision,
            text=text,
            patch_to_query=tuple(sorted((int(k), int(v_)) for k, v_ in p2q.items())),
            image_token_id=d.get("image_token_id", 9),
            bos_token_id=d.get("bos_token_id", 1),
            eos_token_id=_first(d.get("eos_token_id", 2)),
            pad_token_id=_default(d.get("pad_token_id"), 2),
            dtype=dtype,
        )

    @staticmethod
    def from_pretrained(model_dir: str, dtype=jnp.bfloat16) -> "AriaConfig":
        with open(os.path.join(model_dir, "config.json")) as f:
            return AriaConfig.from_hf_dict(json.load(f), dtype=dtype)

    def to_hf_dict(self) -> dict[str, Any]:
        v, t = self.vision, self.text
        return {
            "model_type": "aria",
            "architectures": ["AriaForConditionalGeneration"],
            "vision_config": {
                "model_type": "idefics3_vision",
                "hidden_size": v.hidden_size,
                "intermediate_size": v.intermediate_size,
                "num_hidden_layers": v.num_hidden_layers,
                "num_attention_heads": v.num_attention_heads,
                "num_channels": v.in_channels,
                "image_size": v.image_size,
                "patch_size": v.patch_size,
                "layer_norm_eps": v.layer_norm_eps,
            },
            "text_config": {
                "model_type": "aria_text",
                **({"head_dim": t.explicit_head_dim} if t.explicit_head_dim is not None else {}),
                "vocab_size": t.vocab_size,
                "hidden_size": t.hidden_size,
                "intermediate_size": t.intermediate_size,
                "num_hidden_layers": t.num_hidden_layers,
                "num_attention_heads": t.num_attention_heads,
                "num_key_value_heads": t.num_key_value_heads,
                "rms_norm_eps": t.rms_norm_eps,
                "rope_theta": t.rope_theta,
                "tie_word_embeddings": t.tie_word_embeddings,
                "max_position_embeddings": t.max_position_embeddings,
                "attention_bias": t.attention_bias,
                "moe_num_experts": t.moe_num_experts,
                "moe_topk": t.moe_topk,
                "moe_num_shared_experts": t.moe_num_shared_experts,
            },
            "projector_patch_to_query_dict": {p: q for p, q in self.patch_to_query},
            "image_token_id": self.image_token_id,
            "bos_token_id": self.bos_token_id,
            "eos_token_id": self.eos_token_id,
            "pad_token_id": self.pad_token_id,
        }


def tiny_aria(dtype=jnp.float32) -> AriaConfig:
    """Small random-init Aria config (tests / CI parity checks)."""
    return AriaConfig(
        vision=AriaVisionConfig(
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            image_size=28,
            patch_size=14,
        ),
        text=TextConfig(
            vocab_size=512,
            hidden_size=48,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            rope_theta=10000.0,
            mrope_section=(6, 0, 0),  # head_dim 12 -> all-T == 1-D rope
            attention_bias=False,
            moe_num_experts=4,
            moe_topk=2,
            moe_num_shared_experts=2,
        ),
        patch_to_query=((4, 3),),
        image_token_id=500,
        bos_token_id=1,
        eos_token_id=2,
        pad_token_id=2,
        dtype=dtype,
    )


def _default(value, fallback):
    # NOT `or`: an explicit pad_token_id of 0 (llama-style configs) must
    # survive, not fall back to the family default.
    return fallback if value is None else value


def _first(x):
    if isinstance(x, (list, tuple)):
        return x[0]
    return x
