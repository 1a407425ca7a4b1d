"""Int8 weight-only quantization for serving.

Halves HBM weight traffic (the bs=1 decode bottleneck) and lets the full
7B model + KV cache fit a single v5e chip's 16 GB. Per-output-channel
symmetric scales; the dequantizing cast fuses into the matmul so weights
stream from HBM as int8.

The reference exposes only a commented-out bitsandbytes 4-bit path
(sft_multi_task.py:435-441); this is the TPU-native serving equivalent.
"""

from __future__ import annotations

import contextlib
import re
from typing import Any

import jax
import jax.numpy as jnp

# Trace-time switch for w8a8 matmuls (see a8_acts). Read inside dense(), so
# the mode a program was TRACED under is baked into that executable; flipping
# the flag never affects already-compiled programs.
_A8_ACTIVE = False


@contextlib.contextmanager
def a8_acts(enabled: bool = True):
    """Compile QuantizedLinear matmuls as int8 x int8 (w8a8) inside this scope.

    The MXU runs int8 x int8 -> int32 at 2x its bf16 FLOP rate (v5e: ~394
    TOPS vs ~197 TFLOP/s), so compute-bound programs — engine prefill and the
    vision tower — nearly double their matmul throughput. Activations are
    dynamically quantized per row (per-token symmetric absmax, the standard
    w8a8 recipe); weights must already be int8 (quantize_params). Serving
    only: training paths never enter this scope (round() has no gradient).
    """
    global _A8_ACTIVE
    prev = _A8_ACTIVE
    _A8_ACTIVE = bool(enabled)
    try:
        yield
    finally:
        _A8_ACTIVE = prev


def a8_active() -> bool:
    return _A8_ACTIVE


def quantize_acts(x: jnp.ndarray):
    """Per-row (last-dim) symmetric int8 quantization; returns (x_q, scale).

    scale has shape x.shape[:-1] + (1,) in float32.
    """
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return x_q, scale


@jax.tree_util.register_pytree_with_keys_class
class QuantizedLinear:
    """int8 weight (in, out) + per-output-channel scale; used via dense().

    Children are keyed ('w_q', 'scale') so path-based sharding rules
    (parallel/mesh.py) can address them.
    """

    def __init__(self, w_q: jnp.ndarray, scale: jnp.ndarray):
        self.w_q = w_q
        self.scale = scale

    @property
    def shape(self):
        return self.w_q.shape

    @property
    def ndim(self):
        return self.w_q.ndim

    def tree_flatten_with_keys(self):
        return (
            (jax.tree_util.GetAttrKey("w_q"), self.w_q),
            (jax.tree_util.GetAttrKey("scale"), self.scale),
        ), None

    @classmethod
    def tree_unflatten(cls, _aux, children):
        return cls(*children)

    def __repr__(self):
        return f"QuantizedLinear(shape={tuple(self.w_q.shape)})"


def quantize_weight(w: jnp.ndarray, compute_dtype=jnp.float32) -> QuantizedLinear:
    """Symmetric per-output-channel int8 quantization of an (in, out) matrix.

    The scale stays float32: the weights are rounded against the f32 scale,
    so dequantizing with a bf16-rounded copy would add a systematic ~2^-9
    per-channel error on top of int8 rounding — and dense() upcasts the
    scale to f32 for the epilogue anyway, so f32 storage costs nothing."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=0, keepdims=True)  # (1, out)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    w_q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return QuantizedLinear(w_q, scale.astype(compute_dtype))


@jax.tree_util.register_pytree_with_keys_class
class LoraLinear:
    """Frozen base matmul + trainable low-rank delta; used via dense().

    ``base`` may itself be a QuantizedLinear (QLoRA on TPU: int8 frozen
    base + bf16 adapters — the full 7B trains on one 16 GB chip). ``scale``
    is alpha / rank (LoRA convention); kept a leaf so the tree round-trips
    through checkpoints and sharding.
    """

    def __init__(self, base, a: jnp.ndarray, b: jnp.ndarray, scale):
        self.base = base
        self.a = a
        self.b = b
        self.scale = scale

    @property
    def shape(self):
        return self.base.shape

    @property
    def ndim(self):
        return self.base.ndim

    def tree_flatten_with_keys(self):
        return (
            (jax.tree_util.GetAttrKey("base"), self.base),
            (jax.tree_util.GetAttrKey("a"), self.a),
            (jax.tree_util.GetAttrKey("b"), self.b),
            (jax.tree_util.GetAttrKey("scale"), self.scale),
        ), None

    @classmethod
    def tree_unflatten(cls, _aux, children):
        return cls(*children)

    def __repr__(self):
        return f"LoraLinear(shape={tuple(self.shape)}, rank={self.a.shape[-1]})"


def dense(x: jnp.ndarray, w) -> jnp.ndarray:
    """x @ w for plain arrays, QuantizedLinear (cast fused into the dot),
    Int4Linear (Pallas group-dequant kernel), or LoraLinear (frozen base +
    low-rank delta)."""
    from .int4 import Int4Linear, int4_dense

    if isinstance(w, Int4Linear):
        return int4_dense(x, w)
    if isinstance(w, LoraLinear):
        delta = (x @ w.a.astype(x.dtype)) @ w.b.astype(x.dtype)
        return dense(x, w.base) + delta * jnp.asarray(w.scale, x.dtype)
    if isinstance(w, QuantizedLinear):
        if _A8_ACTIVE:
            x_q, sx = quantize_acts(x)
            y = jax.lax.dot_general(
                x_q,
                w.w_q,
                (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (y.astype(jnp.float32) * sx * w.scale.astype(jnp.float32)).astype(
                x.dtype
            )
        y = jax.lax.dot_general(
            x,
            w.w_q.astype(x.dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (y * w.scale.astype(jnp.float32)).astype(x.dtype)
    return x @ w


# Text-decoder matrices worth quantizing for serving (big, read every token).
DEFAULT_QUANT_PATTERNS = (
    r"text/layers/\d+/(q_w|k_w|v_w|o_w|gate_w|up_w|down_w)$",
    r"text/lm_head$",
)

# Vision-tower matrices: quantizing these matters for COMPUTE (the tower is
# MXU-bound; w8a8 under a8_acts runs its matmuls at 2x), not HBM. The patch
# embed and merger stay bf16 (first/last-layer sensitivity, negligible FLOPs).
VISION_QUANT_PATTERNS = (
    r"visual/blocks/\d+/(qkv_w|proj_w|fc1_w|fc2_w|gate_w|up_w|down_w)$",
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def quantize_params(params: dict, patterns=DEFAULT_QUANT_PATTERNS) -> dict:
    """Return a copy of the param tree with matching leaves int8-quantized."""
    regexes = [re.compile(p) for p in patterns]

    def maybe_quant(path, leaf):
        s = _path_str(path)
        if any(r.search(s) for r in regexes) and getattr(leaf, "ndim", 0) == 2:
            return quantize_weight(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(maybe_quant, params)


def param_bytes(params: Any) -> int:
    total = 0
    for leaf in jax.tree.leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total
