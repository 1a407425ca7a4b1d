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


def is_aria(cfg) -> bool:
    return getattr(cfg, "model_type", None) == "aria"


def family_forward(
    params,
    cfg,
    input_ids,
    position_ids,
    *,
    pixel_patches=None,  # Qwen families: (S, patch_dim) flattened patches
    grid_thw=None,
    vision_token_id=None,
    pixel_values=None,  # Aria: (n_images, C, H, W) square crops
    vision_row_index=None,
    attn_valid=None,
    remat: bool = False,
    return_hidden: bool = False,
):
    """Trainer-facing forward, dispatched on the config's family.

    The reference trainer instantiates Qwen2VL / Qwen2.5-VL / Aria by model
    name and calls them with family-specific vision kwargs
    (grpo_trainer.py:40-55, 211-219, 611-632); this is the same dispatch
    with the vision payload normalized: Qwen families consume flattened
    ``pixel_patches`` + ``grid_thw``, Aria consumes square ``pixel_values``
    crops. Both accept ``vision_row_index`` so G generations of one prompt
    share a single vision encode."""
    if is_aria(cfg):
        assert pixel_patches is None and grid_thw is None, (
            "Aria takes pixel_values, not pixel_patches/grid_thw"
        )
        return aria.forward(
            params, cfg, input_ids, position_ids,
            pixel_values=pixel_values, vision_row_index=vision_row_index,
            attn_valid=attn_valid, remat=remat, return_hidden=return_hidden,
        )
    assert pixel_values is None, (
        "Qwen families take pixel_patches/grid_thw, not pixel_values"
    )
    return qwen25vl.forward(
        params, cfg, input_ids, position_ids,
        pixel_patches=pixel_patches, grid_thw=grid_thw,
        vision_token_id=vision_token_id, vision_row_index=vision_row_index,
        attn_valid=attn_valid, remat=remat, return_hidden=return_hidden,
    )


__all__ = ["aria", "qwen25vl", "load_model", "family_forward", "is_aria"]
