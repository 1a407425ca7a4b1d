"""Open-o3 Video, TPU-native.

A from-scratch JAX/XLA/Pallas rebuild of the grounded video-reasoning pipeline
of marinero4972/Open-o3-Video (reference layout documented in SURVEY.md):

- ``grounding``: tag grammar, coordinate conventions, rewards, benchmark metrics
  (pure Python; bit-for-bit parity with the reference semantics).
- ``data``: host-side video decode + frame sampling + smart resize; SFT/RL datasets.
- ``models``: Qwen2.5-VL (ViT tower + LLM decoder) as functional JAX modules.
- ``ops``: Pallas TPU kernels (flash attention, fused preprocessing) + RoPE/sampling.
- ``parallel``: device mesh + sharding rules (data/fsdp/tensor axes).
- ``engine``: pjit-sharded prefill/decode inference engine (vLLM equivalent).
- ``train``: SFT and GSPO-RL training loops (DeepSpeed ZeRO equivalent = FSDP sharding).
- ``eval``: V-STAR / VideoMME / WorldSense / VideoMMMU harnesses, TTS, judge, viz.
"""

__version__ = "0.1.0"
