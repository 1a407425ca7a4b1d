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
    # 1 text layer: P.init materializes the whole tree, and 28 bf16 text
    # layers (~13 GB) would OOM the chip before the tower even runs.
    cfg = dataclasses.replace(
        cfg, vision=vcfg, dtype=jnp.bfloat16,
        text=dataclasses.replace(cfg.text, num_hidden_layers=1),
    )

    frames_u8, _ = fetch_video_fast({"video": VIDEO, "nframes": 16})
    patches_np, grid1 = frames_as_images_patches(frames_u8)
    # N videos concatenated, as the engine's grouped vision program sees them
    patches_np = np.concatenate([patches_np] * N_VIDEOS, axis=0)
    grid = np.concatenate([grid1] * N_VIDEOS, axis=0)
    S = patches_np.shape[0]
    print(f"S={S} patches, grid rows={len(grid)}, depth={DEPTH}", file=sys.stderr)

    params = P.init(cfg, seed=0)["visual"]
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

    import sys as _sys
    if not _sys.argv[1:] or "fwd" in _sys.argv[1:]:
        import contextlib

        from open_o3_video_tpu.ops.window_attention import vit_inference_scope

        # PROF_INFER=1 traces like the engine does (vit_inference_scope):
        # the fused-kernel fits check then uses the forward-only VMEM
        # footprint, admitting wider packed rows (O3V_VIT_PACK>=4).
        scope = (
            vit_inference_scope()
            if os.environ.get("PROF_INFER", "0") == "1"
            else contextlib.nullcontext()
        )
        with scope:
            full = jax.jit(lambda p, x: V.vision_forward(p, x, spec, vcfg))
            t_full = timed(full, params, patches)
        print(f"full        : {t_full*1e3:8.1f} ms  {total_tflop/t_full:6.1f} TFLOP/s "
              f"({100*total_tflop/t_full/197:4.1f}% MFU)")

    # --- ablation helpers (monkeypatched copies of the block loop) -------
    def run_blocks(params, x, attn_mode):
        padded = attn_mode.startswith("pad_")
        x = x.astype(jnp.bfloat16) @ params["patch_embed"]
        unit = vcfg.merge_unit
        if padded:
            Sp = spec.padded_index.shape[0]
            x = x[jnp.asarray(spec.padded_index)]
            x = jnp.where(jnp.asarray(spec.padded_valid)[:, None], x, 0)
            freqs = jnp.asarray(spec.padded_freqs)
        else:
            Sp = S
            x = x.reshape(S // unit, unit, -1)[jnp.asarray(spec.window_index)].reshape(S, -1)
            freqs = jnp.asarray(spec.freqs)
        from open_o3_video_tpu.ops.rope import apply_rope_vision
        from open_o3_video_tpu.ops.window_attention import window_attention

        for i in range(vcfg.depth):
            seg = spec.full_seg if i in vcfg.fullatt_block_indexes else spec.window_seg
            if padded:
                w_ = (
                    spec.frame_w
                    if i in vcfg.fullatt_block_indexes
                    else spec.win_w
                )
                vmask = jnp.asarray(spec.padded_valid.reshape(-1, w_))
            p = params["blocks"][i]
            h = V.rms_norm(x, p["norm1"])
            qkv = (h @ p["qkv_w"] + p["qkv_b"]).reshape(Sp, 3, vcfg.num_heads, vcfg.head_dim)
            q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
            if attn_mode not in ("pad_qkv", "pad_full_norope"):
                q, k = apply_rope_vision(q, k, freqs)
            if attn_mode == "pad_qkv":
                # forces qkv materialization + slices; no rope, no attention
                attn = (q + k + v).reshape(Sp, vcfg.hidden_size)
            elif attn_mode == "pad_rope":
                # + rope on q/k; no attention kernel
                attn = (q + k + v).reshape(Sp, vcfg.hidden_size)
            elif attn_mode == "pad_full_norope":
                qs, ks, vs = (
                    t.reshape(Sp // w_, w_, vcfg.num_heads, vcfg.head_dim)
                    for t in (q, k, v)
                )
                attn = window_attention(qs, ks, vs, vmask).reshape(Sp, vcfg.hidden_size)
            elif attn_mode == "pad_full":
                qs, ks, vs = (
                    t.reshape(Sp // w_, w_, vcfg.num_heads, vcfg.head_dim)
                    for t in (q, k, v)
                )
                attn = window_attention(qs, ks, vs, vmask).reshape(Sp, vcfg.hidden_size)
            elif attn_mode == "pad_xla":
                qs, ks, vs = (
                    t.reshape(Sp // w_, w_, vcfg.num_heads, vcfg.head_dim)
                    for t in (q, k, v)
                )
                mask = (vmask[:, None, :] & vmask[:, :, None])[:, None]
                attn = jax.nn.dot_product_attention(qs, ks, vs, mask=mask)
                attn = attn.reshape(Sp, vcfg.hidden_size)
            elif attn_mode == "pad_none":
                attn = q.reshape(Sp, vcfg.hidden_size)
            elif attn_mode == "full":
                attn = V._segmented_attention(q, k, v, seg).reshape(S, vcfg.hidden_size)
            elif attn_mode == "einsum":
                # manual masked attention: bf16 matmuls, f32 softmax
                idx = jnp.asarray(seg.indices)
                val = jnp.asarray(seg.valid)
                qs, ks, vs = (t[idx] for t in (q, k, v))  # (N, W, H, D)
                sc = jnp.einsum("nwhd,nvhd->nhwv", qs, ks) * (vcfg.head_dim ** -0.5)
                sc = jnp.where(val[:, None, None, :], sc.astype(jnp.float32), -1e30)
                p_ = jax.nn.softmax(sc, axis=-1).astype(qs.dtype)
                o = jnp.einsum("nhwv,nvhd->nwhd", p_, vs)
                attn = o[jnp.asarray(seg.seg_ids), jnp.asarray(seg.offsets)]
                attn = attn.reshape(S, vcfg.hidden_size)
            elif attn_mode == "folded":
                # heads folded into the window batch: (N*H, W, D) batched
                # matmuls — same FLOPs, more batch parallelism
                idx = jnp.asarray(seg.indices)
                val = jnp.asarray(seg.valid)
                N_, W_ = idx.shape
                qs, ks, vs = (
                    t[idx].transpose(0, 2, 1, 3).reshape(N_ * vcfg.num_heads, W_, vcfg.head_dim)
                    for t in (q, k, v)
                )
                sc = jnp.einsum("bwd,bvd->bwv", qs, ks) * (vcfg.head_dim ** -0.5)
                m_ = jnp.repeat(val[:, None, :], vcfg.num_heads, 1).reshape(N_ * vcfg.num_heads, 1, W_)
                sc = jnp.where(m_, sc.astype(jnp.float32), -1e30)
                p_ = jax.nn.softmax(sc, axis=-1).astype(qs.dtype)
                o = jnp.einsum("bwv,bvd->bwd", p_, vs)
                o = o.reshape(N_, vcfg.num_heads, W_, vcfg.head_dim).transpose(0, 2, 1, 3)
                attn = o[jnp.asarray(seg.seg_ids), jnp.asarray(seg.offsets)]
                attn = attn.reshape(S, vcfg.hidden_size)
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
                attn = q.reshape(Sp, vcfg.hidden_size)
            x = x + (attn @ p["proj_w"] + p["proj_b"])
            h = V.rms_norm(x, p["norm2"])
            gate = jax.nn.silu(h @ p["gate_w"] + p["gate_b"])
            up = h @ p["up_w"] + p["up_b"]
            x = x + ((gate * up) @ p["down_w"] + p["down_b"])
        return x

    import sys as _sys
    modes = [m for m in _sys.argv[1:] if m != "fwd"] or [
        "full", "einsum", "folded", "no_gather", "none"]
    for mode in modes:
        fn = jax.jit(lambda p, x, m=mode: run_blocks(p, x, m))
        t = timed(fn, params, patches)
        print(f"blocks[{mode:9s}]: {t*1e3:8.1f} ms")
        jax.clear_caches()


if __name__ == "__main__":
    main()
