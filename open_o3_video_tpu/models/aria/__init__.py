"""Aria in JAX: Idefics3-style vision tower + cross-attention projector +
llama-style MoE text decoder (expert-parallel under GSPMD).

The third model family the reference dispatches between by name
(grpo_trainer.py:211-219); the text decoder is the shared one
(models/qwen25vl/text.py) with MoE layers, so the engine/trainers serve it.
"""

from .config import AriaConfig, AriaVisionConfig, tiny_aria
from .model import forward, get_image_features, get_rope_index
from . import params

__all__ = [
    "AriaConfig",
    "AriaVisionConfig",
    "tiny_aria",
    "forward",
    "get_image_features",
    "get_rope_index",
    "params",
]
