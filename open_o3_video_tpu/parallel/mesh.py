"""Mesh construction and parameter sharding.

The TPU-native replacement for the reference's torchrun+DeepSpeed stack
(SURVEY.md §2.3-2.4): one ``jax.sharding.Mesh`` with axes

- ``data``:   pure data parallelism (DCN-friendly; maps the reference's
              8-process DDP, run_grpo_video.sh:11-15)
- ``fsdp``:   parameter/optimizer sharding == DeepSpeed ZeRO-2/3
              (local_scripts/zero{2,3}.json)
- ``tensor``: megatron-style tensor parallelism over ICI (the reference
              exposes vLLM tensor_parallel_size, model_vllm.py:21)

Sharding rules map param-tree paths to PartitionSpecs; XLA GSPMD inserts the
collectives (all-gather for ZeRO-3 gathers, psum for grad reduction).
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = 1,
    fsdp: int = -1,
    tensor: int = 1,
    context: int = 1,
    devices: Optional[list] = None,
) -> Mesh:
    """Build a (data, fsdp[, context], tensor) mesh; fsdp=-1 absorbs the rest.

    ``context`` > 1 adds a sequence/context-parallel axis (ring attention,
    parallel/context.py) between fsdp and tensor so its ppermute ring rides
    ICI neighbours. Params are replicated over it (no rule names it), so
    context=1 meshes are bit-identical to the historical 3-axis layout.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if fsdp == -1:
        fsdp = n // (data * tensor * context)
    assert data * fsdp * context * tensor == n, (
        f"mesh {data}x{fsdp}x{context}x{tensor} != {n} devices"
    )
    if context == 1:
        arr = np.asarray(devices).reshape(data, fsdp, tensor)
        return Mesh(arr, axis_names=("data", "fsdp", "tensor"))
    arr = np.asarray(devices).reshape(data, fsdp, context, tensor)
    return Mesh(arr, axis_names=("data", "fsdp", "context", "tensor"))


# Path-pattern -> PartitionSpec. First match wins. Conventions:
# - 2D weights stored input-major (x @ W).
# - TP shards the head/ffn dim; FSDP shards the other dim (ZeRO-3 style).
PARAM_RULES: list[tuple[str, P]] = [
    # Quantized leaves (ops/quant.py int8 w_q, ops/int4.py packed w_p):
    # both shard like their parent weight (w_p's packed rows stay
    # group-major, so splitting the first axis over fsdp is still a clean
    # row split as long as the group count divides it). Scales: int8's
    # (1, out) and int4's (groups, out) both follow the output axis.
    # (/base)? lets every rule also address the frozen base inside a
    # LoRA-wrapped leaf (ops/quant.LoraLinear), so sharding a combined
    # adapter tree behaves exactly like sharding the plain one.
    (r"text/layers/\d+/(q_w|k_w|v_w|gate_w|up_w)(/base)?/(w_q|w_p)$", P("fsdp", "tensor")),
    # int4 packed weights are COLUMN-parallel even for the row-parallel
    # layers: a K split over tensor straddles quant groups at real dims
    # (72B down_w: 231 groups % 8 != 0), which ops/int4.py's partition
    # would demote to full replication — the exact failure mode the
    # custom_partitioning exists to prevent. N always splits cleanly, and
    # at decode the extra activation all-gathers are negligible next to
    # the sharded weight traffic.
    (r"text/layers/\d+/(o_w|down_w)(/base)?/w_p$", P(None, "tensor")),
    (r"text/layers/\d+/(o_w|down_w)(/base)?/(w_q|w_p)$", P("tensor", "fsdp")),
    (r"text/lm_head(/base)?/(w_q|w_p)$", P("fsdp", "tensor")),
    (r"text/layers/\d+/(q_w|k_w|v_w|gate_w|up_w)(/base)?/scale$", P(None, "tensor")),
    (r"text/layers/\d+/(o_w|down_w)(/base)?/scale$", P(None, "fsdp")),
    (r"text/lm_head(/base)?/scale$", P(None, "tensor")),
    # LoRA adapters: A carries the input dim (shards like the base input
    # axis), B the output dim (shards like the base output axis); the rank
    # axis stays whole.
    (r"text/layers/\d+/(q_w|k_w|v_w|gate_w|up_w)/a$", P("fsdp", None)),
    (r"text/layers/\d+/(q_w|k_w|v_w|gate_w|up_w)/b$", P(None, "tensor")),
    (r"text/layers/\d+/(o_w|down_w)/a$", P("tensor", None)),
    (r"text/layers/\d+/(o_w|down_w)/b$", P(None, "fsdp")),
    # text attention: outputs sharded over tensor
    (r"text/layers/\d+/(q_w|k_w|v_w)(/base)?$", P("fsdp", "tensor")),
    (r"text/layers/\d+/(q_b|k_b|v_b)$", P("tensor")),
    (r"text/layers/\d+/o_w(/base)?$", P("tensor", "fsdp")),
    # text mlp
    (r"text/layers/\d+/(gate_w|up_w)(/base)?$", P("fsdp", "tensor")),
    (r"text/layers/\d+/down_w(/base)?$", P("tensor", "fsdp")),
    # Aria MoE: EXPERT PARALLELISM — the expert axis shards over `tensor`,
    # so each chip computes only its local experts in the batched-expert
    # einsums and the (N, E) combine contraction inserts the psum.
    (r"text/layers/\d+/router$", P("fsdp", None)),
    (r"text/layers/\d+/moe_fc1$", P("tensor", "fsdp", None)),
    (r"text/layers/\d+/moe_fc2$", P("tensor", None, "fsdp")),
    (r"text/layers/\d+/(input_norm|post_norm)$", P()),
    (r"text/embed_tokens$", P("tensor", "fsdp")),
    (r"text/lm_head(/base)?$", P("fsdp", "tensor")),
    (r"text/final_norm$", P()),
    # vision tower: fsdp-shard the big matrices, replicate the rest.
    # Quantized (w8a8 serving) block leaves shard like their bf16 parents.
    (r"visual/blocks/\d+/(qkv_w|gate_w|up_w|fc1_w)/w_q$", P("fsdp", "tensor")),
    (r"visual/blocks/\d+/(proj_w|down_w|fc2_w)/w_q$", P("tensor", "fsdp")),
    (r"visual/blocks/\d+/(qkv_w|gate_w|up_w|fc1_w)/scale$", P(None, "tensor")),
    (r"visual/blocks/\d+/(proj_w|down_w|fc2_w)/scale$", P(None, "fsdp")),
    (r"visual/blocks/\d+/qkv_w$", P("fsdp", "tensor")),
    (r"visual/blocks/\d+/qkv_b$", P("tensor")),
    (r"visual/blocks/\d+/proj_w$", P("tensor", "fsdp")),
    (r"visual/blocks/\d+/(gate_w|up_w|fc1_w)$", P("fsdp", "tensor")),
    (r"visual/blocks/\d+/(gate_b|up_b|fc1_b)$", P("tensor")),
    (r"visual/blocks/\d+/(down_w|fc2_w)$", P("tensor", "fsdp")),
    (r"visual/patch_embed$", P(None, "fsdp")),
    (r"visual/pos_embed$", P(None, "fsdp")),
    (r"visual/(merger|deepstack/\d+)/fc1_w$", P("fsdp", "tensor")),
    (r"visual/(merger|deepstack/\d+)/fc1_b$", P("tensor")),
    (r"visual/(merger|deepstack/\d+)/fc2_w$", P("tensor", "fsdp")),
    (r".*", P()),  # norms, small biases: replicated
]


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


def param_sharding_rules(params, mesh: Mesh, rules=None):
    """PartitionSpec tree matching ``params``' structure."""
    rules = rules if rules is not None else PARAM_RULES

    def spec_for(path, leaf):
        if getattr(leaf, "ndim", None) in (None, 0):
            # python scalars / 0-d leaves (e.g. LoraLinear.scale) — the
            # name-based rules target arrays; replicate.
            return P()
        s = _path_str(path)
        for pattern, spec in rules:
            if re.search(pattern, s):
                # Drop sharding on axes that don't divide evenly (tiny configs).
                dims = []
                for axis_idx, axis in enumerate(spec):
                    if axis is None:
                        dims.append(None)
                        continue
                    size = mesh.shape[axis]
                    if axis_idx < leaf.ndim and leaf.shape[axis_idx] % size == 0:
                        dims.append(axis)
                    else:
                        dims.append(None)
                return P(*dims)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh, rules=None):
    """Place the param tree on the mesh according to the rules."""
    specs = param_sharding_rules(params, mesh, rules)
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params,
        specs,
    )


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P())), tree
    )


def replicate_scalars(tree, mesh: Mesh):
    """Commit 0-d leaves (optax step counters etc.) to the mesh, replicated.

    Param-shaped optimizer state inherits its sharding from the params it
    was zeros_like'd from, but bare scalars stay single-device uncommitted;
    after a checkpoint restore they come back committed to one device and
    clash with mesh-sharded params inside jit."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P()))
        if getattr(x, "ndim", None) == 0
        else x,
        tree,
    )
