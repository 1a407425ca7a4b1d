"""Qwen2.5-VL in JAX: windowed ViT tower, GQA decoder with M-RoPE.

Functional modules over a param pytree; architecture reference is the
published Qwen2.5-VL model family (consumed by the reference via HF
transformers, grpo_trainer.py:211-219). Weight import from HF safetensors
in ``params.py``.
"""

from .config import Qwen25VLConfig, TextConfig, VisionConfig
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
    "build_vision_row_index",
    "forward",
    "encode_vision",
    "get_rope_index",
    "merge_vision_embeddings_by_index",
    "params",
]
