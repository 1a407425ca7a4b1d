"""Model families — everything the reference dispatches between by name
(grpo_trainer.py:211-219) plus its 2025-11 update base:

- ``models.qwen25vl``: Qwen2.5-VL (flagship), Qwen2-VL, and Qwen3-VL as
  config-selected variants over shared towers; auto-detected from an HF
  config.json by ``Qwen25VLConfig.from_hf_dict`` / ``params.load_pretrained``.
- ``models.aria``: Aria — Idefics3-style vision tower + cross-attention
  projector + llama-style MoE text decoder (the MoE is the ``router``
  branch of the shared text stack; experts shard over the ``tensor`` mesh
  axis = expert parallelism).
"""

from . import aria, qwen25vl

__all__ = ["aria", "qwen25vl"]
