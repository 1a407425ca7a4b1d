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


def load_model(model_dir: str, dtype=None, **kwargs):
    """Family-dispatching loader — the reference's by-name model selection
    (grpo_trainer.py:211-219) driven by config.json instead.

    Returns (params, cfg, family_module); kwargs forward to the family
    loader (e.g. quantize_text=True for the Qwen families)."""
    import json
    import os

    with open(os.path.join(model_dir, "config.json")) as f:
        model_type = json.load(f).get("model_type", "qwen2_5_vl")
    if model_type == "aria":
        if kwargs:
            # Aria's loader takes no extra options (int8 streaming is a
            # Qwen-family feature) — fail clearly, not with a TypeError
            # from deep inside the loader.
            raise ValueError(
                f"aria checkpoints do not support loader options {sorted(kwargs)}"
            )
        cfg = aria.AriaConfig.from_pretrained(
            model_dir, **({"dtype": dtype} if dtype is not None else {})
        )
        params, cfg = aria.params.load_pretrained(model_dir, cfg=cfg)
        return params, cfg, aria
    cfg = qwen25vl.Qwen25VLConfig.from_pretrained(
        model_dir, **({"dtype": dtype} if dtype is not None else {})
    )
    params, cfg = qwen25vl.params.load_pretrained(model_dir, cfg=cfg, **kwargs)
    return params, cfg, qwen25vl


__all__ = ["aria", "qwen25vl", "load_model"]
