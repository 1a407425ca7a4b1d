"""LoRA adapters — the reference's PEFT path, TPU-native.

Both reference entry points plumb ``peft_config=get_peft_config(model_args)``
(grpo.py:98, sft_multi_task.py:479 — TRL's --use_peft / --lora_r /
--lora_alpha / --lora_target_modules flags), and under PEFT the RL trainer
scores reference logps with the ADAPTERS DISABLED instead of keeping a
second model (grpo_trainer.py:244-248, 624-631).

Here adapters live in their OWN small pytree; ``apply_adapters`` grafts
them onto the frozen base as :class:`~...ops.quant.LoraLinear` leaves
(zero-copy — the jitted step differentiates the adapter tree only, so no
base-sized gradient buffers exist), and "disable adapter" is simply using
the base tree. The base may be int8 (QLoRA: a 7B policy trains on one
16 GB chip).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops.quant import LoraLinear

# TRL/PEFT module names -> our leaf names (PEFT's Qwen default targets are
# the attention q/v projections).
_HF_TO_LEAF = {
    "q_proj": "q_w",
    "k_proj": "k_w",
    "v_proj": "v_w",
    "o_proj": "o_w",
    "gate_proj": "gate_w",
    "up_proj": "up_w",
    "down_proj": "down_w",
}


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    rank: int = 16  # TRL get_peft_config default (--lora_r)
    alpha: float = 32.0  # --lora_alpha
    target_modules: tuple[str, ...] = ("q_w", "v_w")  # PEFT Qwen default
    seed: int = 0

    @property
    def scale(self) -> float:
        return self.alpha / self.rank

    @staticmethod
    def normalize_targets(names: Sequence[str]) -> tuple[str, ...]:
        return tuple(_HF_TO_LEAF.get(n, n) for n in names)


def _leaf_shape(leaf) -> tuple[int, int]:
    return tuple(leaf.shape)  # plain, QuantizedLinear, both expose .shape


def init_adapters(params: dict, cfg: LoraConfig, dtype=jnp.bfloat16) -> dict:
    """Adapter tree mirroring the targeted text-decoder leaves.

    B = 0 (PEFT convention), so the delta starts at exactly zero and
    step 0 reproduces the base model; A ~ N(0, 1/sqrt(rank)) — the same
    variance scale as PEFT's kaiming-uniform init."""
    key = jax.random.PRNGKey(cfg.seed)
    layers = []
    for i, layer in enumerate(params["text"]["layers"]):
        entry = {}
        for j, name in enumerate(cfg.target_modules):
            if name not in layer:
                raise KeyError(
                    f"LoRA target {name!r} not in decoder layer (available: "
                    f"{sorted(layer)})"
                )
            d_in, d_out = _leaf_shape(layer[name])
            k = jax.random.fold_in(key, i * 131 + j)
            entry[name] = {
                "a": (jax.random.normal(k, (d_in, cfg.rank))
                      / jnp.sqrt(jnp.asarray(float(cfg.rank)))).astype(dtype),
                "b": jnp.zeros((cfg.rank, d_out), dtype=dtype),
            }
        layers.append(entry)
    return {"layers": layers}


def apply_adapters(params: dict, adapters: dict, scale: float) -> dict:
    """Graft adapters onto the frozen base -> tree with LoraLinear leaves.

    Zero-copy (leaves are referenced, not copied); safe to call inside a
    jitted step or eagerly for the rollout engine."""
    layers = []
    for layer, ad in zip(params["text"]["layers"], adapters["layers"]):
        new = dict(layer)
        for name, ab in ad.items():
            new[name] = LoraLinear(layer[name], ab["a"], ab["b"], scale)
        layers.append(new)
    out = dict(params)
    out["text"] = dict(params["text"])
    out["text"]["layers"] = layers
    return out


def merge_adapters(params: dict, adapters: dict, scale: float,
                   out_dtype=None) -> dict:
    """Fold the low-rank deltas into plain dense weights (for export).

    EVERY int8 leaf dequantizes (targeted or not) — the merged result is a
    standard full-precision checkpoint save_safetensors can serialize,
    like PEFT's merge_and_unload.

    Dtype semantics match PEFT's merge_and_unload: a non-quantized base
    leaf keeps ITS OWN dtype (a float32 base is NOT downcast to the
    adapter dtype). ``out_dtype`` only decides what DEQUANTIZED int8
    leaves become (the QLoRA export case); default = adapter dtype."""
    from ..ops.int4 import Int4Linear, _unpack_int4_xla
    from ..ops.quant import QuantizedLinear

    _QUANT_TYPES = (QuantizedLinear, Int4Linear)

    def dequant(leaf):
        if isinstance(leaf, QuantizedLinear):
            return leaf.w_q.astype(jnp.float32) * leaf.scale.astype(jnp.float32)
        if isinstance(leaf, Int4Linear):
            return _unpack_int4_xla(leaf, jnp.float32)
        return leaf

    if out_dtype is None:
        out_dtype = adapters["layers"][0][next(iter(adapters["layers"][0]))]["a"].dtype
    layers = []
    for layer, ad in zip(params["text"]["layers"], adapters["layers"]):
        new = dict(layer)
        for name, ab in ad.items():
            base_leaf = layer[name]
            leaf_dtype = (
                out_dtype if isinstance(base_leaf, _QUANT_TYPES)
                else base_leaf.dtype
            )
            base = dequant(base_leaf).astype(jnp.float32)
            delta = (ab["a"].astype(jnp.float32) @ ab["b"].astype(jnp.float32)) * scale
            new[name] = (base + delta).astype(leaf_dtype)
        layers.append(new)
    out = dict(params)
    out["text"] = dict(params["text"])
    out["text"]["layers"] = layers
    # EVERY remaining quantized leaf (int8 or packed int4) dequantizes —
    # non-target text matmuls, lm_head, AND vision-tower blocks
    # (quantize_vision, the w8a8 serving path) — so the export is a
    # uniformly full-precision checkpoint.
    return jax.tree.map(
        lambda x: (dequant(x).astype(out_dtype)
                   if isinstance(x, _QUANT_TYPES) else x),
        out,
        is_leaf=lambda x: isinstance(x, _QUANT_TYPES),
    )
