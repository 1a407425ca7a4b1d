"""Profile the Qwen2.5-VL vision tower on the real chip, part by part.

Measures the full tower at the bench geometry (8 videos x 16 frames at the
training pixel budget), then ablations that isolate where the time goes:

- full        : the production vision_forward
- no_gather   : segment gather/scatter replaced by reshape (upper bound for
                removing the (N, W) batched-segment data movement)
- no_attn     : attention output = q (isolates MLP/linear time)
- linear_only : qkv/proj/mlp matmuls only, no attention or gathers

Run: python scripts/profile_vision.py  (defaults mirror bench.py).
"""

import dataclasses
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from open_o3_video_tpu.data.video import fetch_video_fast
from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, params as P
from open_o3_video_tpu.models.qwen25vl import vision as V
from open_o3_video_tpu.ops.preprocess import frames_as_images_patches

N_VIDEOS = int(os.environ.get("PROF_VIDEOS", "8"))
DEPTH = int(os.environ.get("PROF_VISION_LAYERS", "32"))
VIDEO = os.environ.get("PROF_VIDEO", "/root/reference/eval/example_video.mp4")


def _force(out):
    # Through the axon tunnel block_until_ready can return before the
    # remote computation finishes; fetching a value cannot.
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf[tuple(0 for _ in leaf.shape)])


def timed(fn, *args, iters=3):
    _force(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.time()
        _force(fn(*args))
        times.append(time.time() - t0)
    return float(np.median(times))


def main():
    cfg = Qwen25VLConfig()
    vcfg = dataclasses.replace(
        cfg.vision, depth=DEPTH,
        fullatt_block_indexes=tuple(
            i for i in cfg.vision.fullatt_block_indexes if i < DEPTH
        ) or (DEPTH - 1,),
    )
    cfg = dataclasses.replace(cfg, vision=vcfg, dtype=jnp.bfloat16)

    frames_u8, _ = fetch_video_fast({"video": VIDEO, "nframes": 16})
    patches_np, grid1 = frames_as_images_patches(frames_u8)
    # N videos concatenated, as the engine's grouped vision program sees them
    patches_np = np.concatenate([patches_np] * N_VIDEOS, axis=0)
    grid = np.concatenate([grid1] * N_VIDEOS, axis=0)
    S = patches_np.shape[0]
    print(f"S={S} patches, grid rows={len(grid)}, depth={DEPTH}", file=sys.stderr)

    params = P.init(cfg, seed=0)["visual"]
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    spec = V.compute_vision_spec([tuple(g) for g in grid], vcfg)
    patches = jnp.asarray(patches_np, dtype=jnp.bfloat16)

    # FLOPs: per patch per block qkv + proj + mlp(gate/up/down) + attn
    D, I = vcfg.hidden_size, vcfg.intermediate_size
    W = 64  # window segment (8x8 merged patches x merge_unit)
    per_patch = 2 * D * (3 * D) + 2 * D * D + 3 * 2 * D * I
    attn_per_patch = 2 * 2 * W * vcfg.head_dim * vcfg.num_heads  # qk^T + av
    total_tflop = DEPTH * S * (per_patch + attn_per_patch) / 1e12
    merger_tflop = 2 * S * (vcfg.merge_unit * D) * (vcfg.merge_unit * D) / 1e12 \
        + 2 * (S // vcfg.merge_unit) * (vcfg.merge_unit * D) * vcfg.out_hidden_size / 1e12
    total_tflop += merger_tflop

    full = jax.jit(lambda p, x: V.vision_forward(p, x, spec, vcfg))
    t_full = timed(full, params, patches)
    print(f"full        : {t_full*1e3:8.1f} ms  {total_tflop/t_full:6.1f} TFLOP/s "
          f"({100*total_tflop/t_full/197:4.1f}% MFU)")

    # --- ablation helpers (monkeypatched copies of the block loop) -------
    def run_blocks(params, x, attn_mode):
        x = x.astype(jnp.bfloat16) @ params["patch_embed"]
        unit = vcfg.merge_unit
        x = x.reshape(S // unit, unit, -1)[jnp.asarray(spec.window_index)].reshape(S, -1)
        freqs = jnp.asarray(spec.freqs)
        from open_o3_video_tpu.ops.rope import apply_rope_vision

        for i in range(vcfg.depth):
            seg = spec.full_seg if i in vcfg.fullatt_block_indexes else spec.window_seg
            p = params["blocks"][i]
            h = V.rms_norm(x, p["norm1"])
            qkv = (h @ p["qkv_w"] + p["qkv_b"]).reshape(S, 3, vcfg.num_heads, vcfg.head_dim)
            q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
            q, k = apply_rope_vision(q, k, freqs)
            if attn_mode == "full":
                attn = V._segmented_attention(q, k, v, seg).reshape(S, vcfg.hidden_size)
            elif attn_mode == "no_gather":
                # contiguous reshape into W=64 pseudo-windows (wrong values,
                # right shapes/FLOPs) — isolates the gather/scatter cost
                W_ = 64
                n = S // W_
                qs = q[: n * W_].reshape(n, W_, vcfg.num_heads, vcfg.head_dim)
                ks = k[: n * W_].reshape(n, W_, vcfg.num_heads, vcfg.head_dim)
                vs = v[: n * W_].reshape(n, W_, vcfg.num_heads, vcfg.head_dim)
                o = jax.nn.dot_product_attention(qs, ks, vs)
                attn = o.reshape(n * W_, vcfg.hidden_size)
                attn = jnp.pad(attn, ((0, S - n * W_), (0, 0)))
            else:  # "none"
                attn = q.reshape(S, vcfg.hidden_size)
            x = x + (attn @ p["proj_w"] + p["proj_b"])
            h = V.rms_norm(x, p["norm2"])
            gate = jax.nn.silu(h @ p["gate_w"] + p["gate_b"])
            up = h @ p["up_w"] + p["up_b"]
            x = x + ((gate * up) @ p["down_w"] + p["down_b"])
        return x

    for mode in ("full", "no_gather", "none"):
        fn = jax.jit(lambda p, x, m=mode: run_blocks(p, x, m))
        t = timed(fn, params, patches)
        print(f"blocks[{mode:9s}]: {t*1e3:8.1f} ms")
        jax.clear_caches()


if __name__ == "__main__":
    main()
