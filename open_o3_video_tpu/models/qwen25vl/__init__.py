"""Qwen-VL family in JAX: ViT tower + GQA decoder with M-RoPE.

Functional modules over a param pytree; covers the model families the
reference dispatches between by name (grpo_trainer.py:211-219):
Qwen2.5-VL (windowed ViT, RMSNorm/SwiGLU), Qwen2-VL (full-attention ViT,
LayerNorm/QuickGELU, unscaled temporal rope), and Qwen3-VL (the 2025-11
update's base, README.md:37: interpolated learned pos embed, deepstack
feature taps into the early decoder layers, qk-norm attention without
biases, interleaved M-RoPE) — all selected by config over shared towers. Weight import from HF safetensors in
``params.py``; ``load_pretrained`` auto-detects the family from config.json.
"""

from .config import Qwen25VLConfig, TextConfig, VisionConfig, tiny_qwen2, tiny_qwen3, tiny_qwen3_moe
from .model import (
    build_vision_row_index,
    encode_vision,
    forward,
    get_rope_index,
    merge_vision_embeddings_by_index,
)
from . import params

__all__ = [
    "Qwen25VLConfig",
    "TextConfig",
    "VisionConfig",
    "tiny_qwen2",
    "tiny_qwen3",
    "tiny_qwen3_moe",
    "build_vision_row_index",
    "forward",
    "encode_vision",
    "get_rope_index",
    "merge_vision_embeddings_by_index",
    "params",
]
