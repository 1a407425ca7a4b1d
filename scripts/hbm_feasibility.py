"""Per-device HBM accounting for 7B-dims sharded training/serving.

Multi-chip hardware is not reachable from this environment (one real chip
via a tunnel), so the promised multi-chip envelopes — e.g. the fsdp=8
full-parameter 7B train step (README "Multi-chip", reference
run_sft_video.sh + zero3.json semantics) — cannot be *run* at size. This
tool is the strongest static check available: the parameter / gradient /
optimizer-state tree is built with ``jax.eval_shape`` (real shapes, zero
allocation), sharded leaf-by-leaf with the REAL rules
(``parallel.mesh.PARAM_RULES`` via ``param_sharding_rules`` on an
``AbstractMesh``), and summed into exact per-device bytes. Activations are
the one modeled term: with per-layer remat (train) the live set is the
saved layer-boundary residuals + one layer's backward transients + the
chunked-lm_head logits block; the formulas are printed so the model is
auditable. Exactness of the static part is pinned by
tests/test_hbm_feasibility.py (analytic == measured addressable bytes on
the 8-device CPU mesh at tiny dims).

Usage:
  python scripts/hbm_feasibility.py                      # the README grid
  python scripts/hbm_feasibility.py --mesh 1,8,1 --seq 16384 --hbm-gb 16
"""

from __future__ import annotations

import argparse
import json
import math
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.sharding import AbstractMesh

from open_o3_video_tpu.models.qwen25vl import params as P
from open_o3_video_tpu.models.qwen25vl.config import Qwen25VLConfig
from open_o3_video_tpu.parallel.mesh import param_sharding_rules


def leaf_device_bytes(leaf, spec, mesh) -> int:
    """Exact per-device bytes of one sharded leaf (pad to the shard grid
    like GSPMD does: uneven remainders are padded, not dropped)."""
    if getattr(leaf, "ndim", 0) == 0:
        return int(jnp.dtype(getattr(leaf, "dtype", jnp.float32)).itemsize)
    shape = list(leaf.shape)
    for axis_idx, axis in enumerate(spec):
        if axis is None:
            continue
        n = mesh.shape[axis] if isinstance(axis, str) else math.prod(
            mesh.shape[a] for a in axis
        )
        shape[axis_idx] = -(-shape[axis_idx] // n)
    return math.prod(shape) * jnp.dtype(leaf.dtype).itemsize


def tree_device_bytes(tree, mesh) -> int:
    specs = param_sharding_rules(tree, mesh)
    sizes = jax.tree.map(
        lambda leaf, spec: leaf_device_bytes(leaf, spec, mesh), tree, specs
    )
    return sum(jax.tree.leaves(sizes))


def account(
    mesh_shape: tuple[int, int, int],
    seq: int,
    batch: int,
    logp_chunk: int,
    hbm_gb: float,
    mode: str,
    quantize_text: bool,
) -> dict:
    data, fsdp, tensor = mesh_shape
    mesh = AbstractMesh((data, fsdp, tensor), ("data", "fsdp", "tensor"))
    cfg = Qwen25VLConfig()
    t = cfg.text
    bpe = jnp.dtype(cfg.dtype).itemsize

    params = jax.eval_shape(
        lambda: P.init(cfg, quantize_text=quantize_text)
    )
    p_bytes = tree_device_bytes(params, mesh)
    n_params = sum(math.prod(l.shape) for l in jax.tree.leaves(params))

    out = {
        "mesh": {"data": data, "fsdp": fsdp, "tensor": tensor},
        "n_params": n_params,
        "params_gb": p_bytes / 2**30,
    }

    if mode == "train":
        import optax

        from open_o3_video_tpu.train.sft import SFTConfig, make_optimizer

        opt = make_optimizer(SFTConfig())
        opt_state = jax.eval_shape(opt.init, params)
        # grads: same tree/dtype/sharding as params, live alongside the
        # optimizer update (value_and_grad output feeds optimizer.update).
        g_bytes = p_bytes
        o_bytes = tree_device_bytes(opt_state, mesh)

        # ---- modeled activation terms (per-layer remat, sft.py:134) ----
        # batch is sharded over `data` only (make_train_step docstring);
        # remat saves each decoder layer's boundary hidden state.
        b_local = -(-batch // data)
        resid = t.num_hidden_layers * b_local * seq * t.hidden_size * bpe
        # one rematerialized layer's backward transients: qkv (+rope copies),
        # attention out, gate/up/act in the mlp — ~8 seq-major tensors of
        # hidden width + 3 of intermediate width, bf16, plus f32 flash
        # attention accumulators which are tile-local (VMEM, not HBM).
        layer_peak = b_local * seq * (
            8 * t.hidden_size + 3 * t.intermediate_size
        ) * bpe
        # chunked lm_head: logits block (B, chunk, vocab) f32, tensor-sharded
        # (lm_head rule P(fsdp, tensor) puts vocab on `tensor`).
        logits = b_local * logp_chunk * -(-t.vocab_size // tensor) * 4
        act = resid + layer_peak + logits
        total = p_bytes + g_bytes + o_bytes + act
        out.update(
            grads_gb=g_bytes / 2**30,
            opt_state_gb=o_bytes / 2**30,
            activations_gb=act / 2**30,
            activation_model={
                "residuals": f"L({t.num_hidden_layers}) * B_local({b_local}) "
                             f"* T({seq}) * H({t.hidden_size}) * {bpe}B",
                "layer_peak": f"B_local * T * (8H + 3I({t.intermediate_size})) * {bpe}B",
                "logits_chunk": f"B_local * chunk({logp_chunk}) * V/tensor * 4B",
            },
        )
    else:  # serve: weights + KV arena for the 81920 contract
        kv = (
            2 * t.num_hidden_layers * batch * seq
            * t.num_key_value_heads * t.head_dim
        )  # elements; dtype chosen below
        kv_bytes = kv * (1 if quantize_text else 2)  # fp8 arena with int8 weights
        total = p_bytes + kv_bytes + batch * seq * 4  # + position/mask bookkeeping
        out.update(kv_arena_gb=kv_bytes / 2**30,
                   kv_dtype="float8_e4m3fn" if quantize_text else "bfloat16")

    out["total_gb"] = total / 2**30
    out["hbm_gb"] = hbm_gb
    # XLA needs headroom for fusion temps/prefetch; 90% is the practical bar.
    out["fits"] = total <= hbm_gb * 0.9 * 2**30
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default=None, help="data,fsdp,tensor")
    ap.add_argument("--seq", type=int, default=16384)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--logp-chunk", type=int, default=1024)
    ap.add_argument("--hbm-gb", type=float, default=16.0, help="per-chip HBM (v5e=16)")
    ap.add_argument("--mode", choices=("train", "serve"), default="train")
    ap.add_argument("--quant", action="store_true", help="int8 text weights")
    args = ap.parse_args()

    if args.mesh:
        grids = [tuple(int(x) for x in args.mesh.split(","))]
    else:  # the README-promised envelopes
        grids = [(1, 8, 1), (1, 4, 2), (2, 4, 1), (1, 16, 1), (4, 8, 1)]

    for g in grids:
        r = account(g, args.seq, args.batch, args.logp_chunk,
                    args.hbm_gb, args.mode, args.quant)
        print(json.dumps(r))
        tag = "FITS" if r["fits"] else "DOES NOT FIT"
        print(
            f"# mesh {g}: {r['total_gb']:.2f} GiB/chip vs {args.hbm_gb} GB HBM "
            f"-> {tag}", file=sys.stderr,
        )


if __name__ == "__main__":
    main()
