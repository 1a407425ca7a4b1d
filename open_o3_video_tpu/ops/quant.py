"""Int8 weight-only quantization for serving.

Halves HBM weight traffic (the bs=1 decode bottleneck) and lets the full
7B model + KV cache fit a single v5e chip's 16 GB. Per-output-channel
symmetric scales; the dequantizing cast fuses into the matmul so weights
stream from HBM as int8.

The reference exposes only a commented-out bitsandbytes 4-bit path
(sft_multi_task.py:435-441); this is the TPU-native serving equivalent.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import jax.numpy as jnp


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


def quantize_weight(w: jnp.ndarray, compute_dtype=jnp.bfloat16) -> QuantizedLinear:
    """Symmetric per-output-channel int8 quantization of an (in, out) matrix."""
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
    or LoraLinear (frozen base + low-rank delta)."""
    if isinstance(w, LoraLinear):
        delta = (x @ w.a.astype(x.dtype)) @ w.b.astype(x.dtype)
        return dense(x, w.base) + delta * jnp.asarray(w.scale, x.dtype)
    if isinstance(w, QuantizedLinear):
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
