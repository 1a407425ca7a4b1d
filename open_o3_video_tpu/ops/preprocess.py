"""Image/video -> patch preprocessing (rescale, normalize, patchify).

Numpy reference implementation of the Qwen2.5-VL patch layout: frames are
rescaled by 1/255, normalized with the OpenAI-CLIP statistics, padded to a
temporal_patch_size multiple, and flattened into
(grid_t * grid_h * grid_w, C * tps * psz^2) patches whose order interleaves
2x2 merge blocks (matching the HF Qwen2VL image processor consumed by the
reference). A fused Pallas/device path can replace this per-sample host step.
"""

from __future__ import annotations

import numpy as np

OPENAI_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
OPENAI_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


def normalize_frames(frames_tchw: np.ndarray) -> np.ndarray:
    """uint8/float [0,255] TCHW -> normalized float32 TCHW."""
    x = frames_tchw.astype(np.float32) / 255.0
    return (x - OPENAI_CLIP_MEAN[:, None, None]) / OPENAI_CLIP_STD[:, None, None]


def patchify(
    frames_tchw: np.ndarray,
    patch_size: int = 14,
    temporal_patch_size: int = 2,
    merge_size: int = 2,
    normalized: bool = False,
) -> tuple[np.ndarray, tuple[int, int, int]]:
    """Flatten normalized frames into Qwen-VL patch rows.

    Returns (patches (grid_t*grid_h*grid_w, C*tps*psz^2) float32,
    (grid_t, grid_h, grid_w)). A single image is passed as T=1 and padded to
    tps by repetition.
    """
    x = frames_tchw if normalized else normalize_frames(frames_tchw)
    T, C, H, W = x.shape
    if T % temporal_patch_size != 0:
        reps = temporal_patch_size - (T % temporal_patch_size)
        x = np.concatenate([x, np.repeat(x[-1:], reps, axis=0)], axis=0)
        T = x.shape[0]
    grid_t = T // temporal_patch_size
    grid_h, grid_w = H // patch_size, W // patch_size
    x = x.reshape(
        grid_t,
        temporal_patch_size,
        C,
        grid_h // merge_size,
        merge_size,
        patch_size,
        grid_w // merge_size,
        merge_size,
        patch_size,
    )
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    patches = x.reshape(grid_t * grid_h * grid_w, C * temporal_patch_size * patch_size**2)
    return np.ascontiguousarray(patches, dtype=np.float32), (grid_t, grid_h, grid_w)


def patchify_device(
    frames_tchw,  # jnp uint8/float (T, C, H, W), T already tps-padded
    patch_size: int = 14,
    temporal_patch_size: int = 2,
    merge_size: int = 2,
    out_dtype=None,
):
    """Device-side normalize+patchify (jit-friendly, fused by XLA).

    Same layout semantics as :func:`patchify`, but runs on the accelerator so
    the host uploads raw uint8 frames (4x less PCIe/ICI traffic than float32
    patches) and the normalize/transpose fuses into one HBM pass. T must
    already be a multiple of temporal_patch_size (pad on host — it's a
    metadata-only repeat).
    """
    import jax.numpy as jnp

    x = frames_tchw.astype(jnp.float32) / 255.0
    mean = jnp.asarray(OPENAI_CLIP_MEAN)[:, None, None]
    std = jnp.asarray(OPENAI_CLIP_STD)[:, None, None]
    x = (x - mean) / std
    T, C, H, W = x.shape
    grid_t = T // temporal_patch_size
    grid_h, grid_w = H // patch_size, W // patch_size
    x = x.reshape(
        grid_t, temporal_patch_size, C,
        grid_h // merge_size, merge_size, patch_size,
        grid_w // merge_size, merge_size, patch_size,
    )
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    out = x.reshape(grid_t * grid_h * grid_w, C * temporal_patch_size * patch_size**2)
    return out.astype(out_dtype) if out_dtype is not None else out


def frames_as_images_patches(frames_tchw: np.ndarray, patch_size: int = 14,
                             temporal_patch_size: int = 2, merge_size: int = 2):
    """The training/eval hot path: a video fed as per-frame *images*.

    Each frame becomes an independent image (grid_t=1, frame repeated across
    the temporal patch dim). Returns (patches stacked (S, patch_dim),
    grid_thw (num_frames, 3)).
    """
    all_patches = []
    grids = []
    for t in range(frames_tchw.shape[0]):
        p, g = patchify(frames_tchw[t : t + 1], patch_size, temporal_patch_size, merge_size)
        all_patches.append(p)
        grids.append(g)
    return np.concatenate(all_patches, axis=0), np.asarray(grids, dtype=np.int64)
