"""Int4 weight quantization with a Pallas group-dequant matmul.

Decode is weight-HBM-bound (the full int8 decoder streams ~9.5 GB per
token-step at 7B dims); int4 halves the bytes again. XLA cannot fuse the
nibble-unpack + group-scale chain into a dot — it materializes the
dequantized copy and runs 0.4-1.0x int8 (scripts/profile_int4.py) — so the
matmul is a Pallas kernel that unpacks and dequantizes block-locally in
VMEM: one HBM read of the packed tile per use, no materialized copy.

Layout (chosen to match Mosaic's hardware int4 view):
- weights quantize in GROUPS of ``group`` input rows (symmetric, qmax=7,
  one f32 scale per (group, out-channel));
- ADJACENT rows pack into one byte: packed[k, n] holds W[2k] in the low
  nibble and W[2k+1] in the high nibble — exactly the order
  ``pltpu.bitcast(tile, jnp.int4)`` unpacks to (int8 row k -> int4 rows
  2k, 2k+1), so the kernel's entire unpack is ONE bitcast + astype; no
  shifts, masks, or sublane shuffles. Group scales multiply the
  per-group DOT OUTPUT (an (Mt, Nt) epilogue), never the weights — the
  only per-weight-element VPU work is the int4->bf16 convert.

The reference's only quantization surface is a commented-out bitsandbytes
4-bit path (sft_multi_task.py:435-441); this is the TPU-native serving
equivalent (opt-in, quality-gated like the fp8 KV cache and w8a8 paths).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@jax.tree_util.register_pytree_with_keys_class
class Int4Linear:
    """Packed int4 weight (in/2, out) + per-(group, out-channel) f32 scales.

    Children are keyed ('w_p', 'scale') so path-based sharding rules
    (parallel/mesh.py) can address them. ``group`` is static pytree aux.
    """

    def __init__(self, w_p: jnp.ndarray, scale: jnp.ndarray, group: int = 128):
        self.w_p = w_p
        self.scale = scale
        self.group = int(group)

    @property
    def shape(self):
        return (self.w_p.shape[0] * 2, self.w_p.shape[1])

    @property
    def ndim(self):
        return 2

    def tree_flatten_with_keys(self):
        return (
            (jax.tree_util.GetAttrKey("w_p"), self.w_p),
            (jax.tree_util.GetAttrKey("scale"), self.scale),
        ), self.group

    @classmethod
    def tree_unflatten(cls, group, children):
        return cls(*children, group=group)

    def __repr__(self):
        return f"Int4Linear(shape={self.shape}, group={self.group})"


def quantize_weight_int4(w: jnp.ndarray, group: int = 128) -> Int4Linear:
    """Symmetric group-wise int4 quantization of an (in, out) matrix.

    qmax=7 (the -8 code is unused, keeping the scheme symmetric like the
    int8 path); scales stay float32 for the same reason quantize_weight's
    do — the kernel's epilogue is f32 regardless.
    """
    K, N = w.shape
    assert group % 2 == 0, f"group {group} must be even"
    assert K % group == 0, f"in-dim {K} not divisible by group {group}"
    w32 = w.astype(jnp.float32).reshape(K // group, group, N)
    absmax = jnp.max(jnp.abs(w32), axis=1, keepdims=True)  # (nG, 1, N)
    scale = jnp.where(absmax == 0, 1.0, absmax / 7.0)
    q = jnp.clip(jnp.round(w32 / scale), -7, 7).astype(jnp.int32).reshape(K, N)
    lo, hi = q[0::2], q[1::2]  # adjacent-row pairs (bitcast order)
    packed = ((hi << 4) | (lo & 0xF)).astype(jnp.int8)
    return Int4Linear(packed, scale[:, 0].astype(jnp.float32), group)


def _dequant_xla(w_p, scale, group: int, dtype) -> jnp.ndarray:
    """Dequantize raw packed arrays to a dense (K, N) matrix."""
    K2, N = w_p.shape
    p = w_p.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p, 28), 28)
    hi = jnp.right_shift(p, 4)
    q = jnp.stack([lo, hi], axis=1).reshape(2 * K2, N)  # adjacent-row pairs
    s = jnp.repeat(scale, group, axis=0)  # (K, N)
    return (q * s).astype(dtype)


def _unpack_int4_xla(w: Int4Linear, dtype=jnp.float32) -> jnp.ndarray:
    """Dequantize to a dense (K, N) matrix (reference path; CPU fallback)."""
    return _dequant_xla(w.w_p, w.scale, w.group, dtype)


def _int4_kernel(
    x_ref, wp_ref, scale_ref, out_ref, acc_ref, *, n_k: int, groups: int, group: int
):
    """One (Mt, G*group) x (G*group, Nt) tile, accumulated over the K grid.

    The packed tile unpacks with ONE hardware bitcast (int8 row k -> int4
    rows 2k, 2k+1 == the adjacent-row packing) + astype; per-group scales
    multiply each group's (Mt, Nt) dot output — grid steps carry several
    groups so the step count stays small (one-group blocks put ~350k grid
    steps in a 28-layer decode program and ran BELOW int8; per-weight
    scale premultiplies on the VPU ran 0.58x int8)."""
    k = pl.program_id(2)
    w = pltpu.bitcast(wp_ref[:], jnp.int4).astype(jnp.bfloat16)  # (G*group, Nt)
    part = None
    for g in range(groups):
        d = jnp.dot(
            x_ref[:, g * group : (g + 1) * group],
            w[g * group : (g + 1) * group],
            preferred_element_type=jnp.float32,
        ) * scale_ref[g].astype(jnp.float32)
        part = d if part is None else part + d

    @pl.when(k == 0)
    def _():
        acc_ref[:] = part

    @pl.when(k > 0)
    def _():
        acc_ref[:] += part

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _resolve_interpret(interpret):
    if interpret is None:
        return os.environ.get("O3V_PALLAS_INTERPRET", "0") == "1"
    return interpret


def _pick_blocks(K: int, N: int, group: int, block_m: int) -> tuple[int, int]:
    """(groups per K-step, block_n): target ~0.5-2 MB packed-weight tiles —
    big enough that grid-step overhead amortizes, small enough that the
    double-buffered tile + the f32 accumulator stay inside VMEM."""
    n_groups = K // group
    g_blk = 1
    for cand in (8, 4, 2, 1):
        if n_groups % cand == 0:
            g_blk = cand
            break
    kb_rows = g_blk * group // 2
    max_bytes = 2 * 1024 * 1024
    max_acc = 4 * 1024 * 1024  # f32 accumulator + output block
    block_n = 128
    for mult in range(N // 128, 0, -1):
        bn = 128 * mult
        if N % bn == 0 and kb_rows * bn <= max_bytes and block_m * bn * 4 <= max_acc:
            block_n = bn
            break
    return g_blk, block_n


@functools.partial(jax.jit, static_argnames=("group", "block_m", "interpret"))
def _int4_matmul_pallas(
    x2: jnp.ndarray,  # (M, K) bf16, M % block_m == 0
    w_p: jnp.ndarray,  # (K/2, N) int8
    scale: jnp.ndarray,  # (K/group, N) f32
    group: int,
    block_m: int,
    interpret: bool,
) -> jnp.ndarray:
    M, K = x2.shape
    N = w_p.shape[1]
    g2 = group // 2
    n_groups = K // group
    g_blk, block_n = _pick_blocks(K, N, group, block_m)
    n_k = n_groups // g_blk
    grid = (M // block_m, N // block_n, n_k)
    return pl.pallas_call(
        functools.partial(_int4_kernel, n_k=n_k, groups=g_blk, group=group),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, g_blk * group), lambda i, j, k: (i, k)),
            pl.BlockSpec((g_blk * g2, block_n), lambda i, j, k: (k, j)),
            # (nGroups, 1, N) layout: a (G, 1, Nt) block keeps the
            # last-two-dims tiling legal (sublane dim == full array dim 1).
            pl.BlockSpec((g_blk, 1, block_n), lambda i, j, k: (k, 0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), x2.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x2, w_p, scale.reshape(n_groups, 1, N))


def _int4_mm_2d(x2, w_p, scale, *, group: int, interpret: bool) -> jnp.ndarray:
    """2D matmul core over (possibly shard-LOCAL) shapes.

    Guards + XLA fallback + M padding + the Pallas kernel. Lives below the
    custom_partitioning boundary so the eligibility check runs on the
    per-shard shapes (a globally lane-aligned N can shard to a misaligned
    local N, e.g. vocab 152064 over tensor=8 -> 19008)."""
    M, K = x2.shape
    N = w_p.shape[1]
    use_pallas = interpret or jax.default_backend() == "tpu"
    if not use_pallas or N % 128 != 0 or group % 2 != 0 or (group // 2) % 8 != 0:
        return x2 @ _dequant_xla(w_p, scale, group, x2.dtype)
    xb = x2.astype(jnp.bfloat16)
    block_m = 256 if M >= 256 else max(16, -(-M // 16) * 16)
    pad_m = (-M) % block_m
    if pad_m:
        xb = jnp.pad(xb, ((0, pad_m), (0, 0)))
    out = _int4_matmul_pallas(xb, w_p, scale, group, block_m, bool(interpret))
    if pad_m:
        out = out[:M]
    return out.astype(x2.dtype)


def _axes(spec, i):
    ax = spec[i] if len(spec) > i else None
    if ax is None:
        return ()
    return tuple(ax) if isinstance(ax, (tuple, list)) else (ax,)


@functools.lru_cache(maxsize=None)
def _sharded_int4_mm(group: int, interpret: bool):
    """custom_partitioning wrapper: the Pallas call is opaque to GSPMD, so
    without this a tensor-sharded Int4Linear (the 72B judge deployment,
    PARAM_RULES) would be ALL-GATHERED per use and the matmul replicated
    on every chip. The rule keeps the weight sharded and runs the kernel
    on local shards:
    - w_p sharded on N (column-parallel): local matmul, output sharded on N;
    - w_p sharded on K (row-parallel): x resharded to the matching K split,
      partial products psum-ed over the axis — only taken when the split
      keeps whole quant groups per shard (scales are group-local);
    - x sharded on M (batch/data): passes straight through the grid.
    """
    from jax.experimental.custom_partitioning import (
        SdyShardingRule,
        custom_partitioning,
    )
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    def impl(x2, w_p, scale):
        return _int4_mm_2d(x2, w_p, scale, group=group, interpret=interpret)

    cp = custom_partitioning(impl)

    def _size(mesh, axes):
        n = 1
        for a in axes:
            n *= mesh.shape[a]
        return n

    def _sp(*parts):
        return P(*[p if p else None for p in parts])

    def infer(mesh, arg_shapes, result_shape):
        x_s, wp_s, _ = (a.sharding for a in arg_shapes)
        return NamedSharding(
            mesh, _sp(_axes(x_s.spec, 0), _axes(wp_s.spec, 1))
        )

    def partition(mesh, arg_shapes, result_shape):
        x_sh, wp_sh, sc_sh = arg_shapes
        M, _K = x_sh.shape
        K2, N = wp_sh.shape
        G = sc_sh.shape[0]
        m_axes = _axes(x_sh.sharding.spec, 0)
        k_axes = _axes(wp_sh.sharding.spec, 0)
        n_axes = _axes(wp_sh.sharding.spec, 1)
        if M % _size(mesh, m_axes):
            m_axes = ()
        # A K split must keep whole quant groups per shard (the kernel
        # applies scales group-locally); otherwise replicate K.
        ks = _size(mesh, k_axes)
        if ks > 1 and (K2 % ks or G % ks):
            k_axes = ()
        if N % _size(mesh, n_axes):
            n_axes = ()
        arg_shardings = (
            NamedSharding(mesh, _sp(m_axes, k_axes)),
            NamedSharding(mesh, _sp(k_axes, n_axes)),
            NamedSharding(mesh, _sp(k_axes, n_axes)),
        )
        out_sharding = NamedSharding(mesh, _sp(m_axes, n_axes))

        def lower_fn(x2, w_p, scale):
            out = impl(x2, w_p, scale)
            if k_axes:
                out = jax.lax.psum(out, k_axes)
            return out

        return mesh, lower_fn, out_sharding, arg_shardings

    cp.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        # x (m, K=(h two)), w_p (h, n), scale (g, n) -> (m, n); h/g are
        # contraction factors, the in-byte pair ("two") cannot shard.
        sharding_rule=SdyShardingRule(
            (("m", ("h", "two")), ("h", "n"), ("g", "n")),
            (("m", "n"),),
            reduction_factors=("h", "g"),
            need_replication_factors=("two",),
            two=2,
        ),
    )
    return cp


def int4_dense(x: jnp.ndarray, w: Int4Linear, interpret=None) -> jnp.ndarray:
    """x @ dequant(w), unpacking block-locally in VMEM on TPU.

    Falls back to the XLA dequant-then-matmul path off-TPU or for shapes
    the kernel does not cover (lane-misaligned N, tiny test dims). On
    multi-device processes the matmul goes through _sharded_int4_mm so
    sharded weights stay sharded (see that docstring).
    """
    interpret = _resolve_interpret(interpret)
    K2, N = w.w_p.shape
    K = 2 * K2
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= int(d)
    x2 = x.reshape(M, K)
    if jax.device_count() > 1:
        out = _sharded_int4_mm(w.group, bool(interpret))(x2, w.w_p, w.scale)
    else:
        out = _int4_mm_2d(x2, w.w_p, w.scale, group=w.group,
                          interpret=bool(interpret))
    return out.reshape(*lead, N).astype(x.dtype)


# Decoder matrices worth int4-quantizing (same set as the int8 patterns).
def quantize_params_int4(params: dict, patterns=None, group: int = 128) -> dict:
    """Copy of the param tree with matching 2D leaves int4-quantized."""
    import re

    from .quant import DEFAULT_QUANT_PATTERNS, _path_str

    regexes = [re.compile(p) for p in (patterns or DEFAULT_QUANT_PATTERNS)]

    def maybe_quant(path, leaf):
        s = _path_str(path)
        if (
            any(r.search(s) for r in regexes)
            and getattr(leaf, "ndim", 0) == 2
            and leaf.shape[0] % group == 0
        ):
            return quantize_weight_int4(leaf, group)
        return leaf

    return jax.tree_util.tree_map_with_path(maybe_quant, params)
