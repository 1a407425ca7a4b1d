"""PIL-parity bicubic resize on device, as two separable matmuls.

The reference resizes every frame on the host with PIL's antialiased
bicubic (``vision_process.py:310-315`` via qwen-vl-utils; the SFT/RL data
path and the HF image processor agree on it). PIL's resample is a
separable convolution with precomputed per-output-pixel coefficient
windows — which on a TPU is exactly a pair of small dense matmuls:

    out = round8(Wh @ round8(x @ Ww^T))

so the whole op runs on the MXU and fuses with the normalize+patchify
epilogue (ops/preprocess.patchify_device). The host uploads frames at the
DECODED resolution (uint8) and never touches a resample kernel; compared
to the swscale fast path (data/video.fetch_video_fast) this is also a
parity upgrade — swscale's bicubic only approximates PIL's, while these
weights reproduce PIL's ``precompute_coeffs`` (Pillow Resample.c) bit-for-
bit in float64 before the fixed-point emulation described below.

Quantization model: PIL's 8-bit path rounds to uint8 AFTER EACH PASS
(clip8 of a fixed-point accumulator seeded with a half-LSB, i.e.
round-half-up then clamp to [0, 255]) and quantizes each coefficient to
the 2^-22 fixed-point grid FIRST (normalize_coeffs_8bpc). Both are
emulated — the coefficient quantization matters: smooth image regions
land sums exactly on rounding ties, where unquantized float weights flip
the tie ~0.5% of the time (2 LSB worst case after the second pass);
with PIL's quantized weights the f32 path diverges from PIL on ~3e-6 of
real-video pixels, never by more than 1 LSB.
"""

from __future__ import annotations

import functools

import numpy as np

BICUBIC_A = -0.5  # PIL/Catmull-Rom-family coefficient (Pillow Resample.c)
BICUBIC_SUPPORT = 2.0


def _bicubic_filter(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    a = BICUBIC_A
    inner = ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0
    outer = (((x - 5.0) * x + 8.0) * x - 4.0) * a
    return np.where(x < 1.0, inner, np.where(x < 2.0, outer, 0.0))


@functools.lru_cache(maxsize=256)
def pil_resize_weights(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) float32 row-stochastic resample matrix.

    Reproduces Pillow's ``precompute_coeffs`` for the full box: the filter
    support scales with the downscale ratio (antialiasing), window bounds
    round like PIL's ``(int)(center ± support + 0.5)``, each window is
    normalized over its in-bounds taps, and the result is quantized to the
    2^-22 fixed-point grid exactly like ``normalize_coeffs_8bpc`` — which
    is what keeps rounding TIES (exact x.5 sums in smooth regions) on
    PIL's side of the boundary.
    """
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = BICUBIC_SUPPORT * filterscale
    out = np.zeros((out_size, in_size), dtype=np.float64)
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        taps = np.arange(xmin, xmax, dtype=np.float64)
        w = _bicubic_filter((taps - center + 0.5) / filterscale)
        s = w.sum()
        if s != 0.0:
            w = w / s
        out[xx, xmin:xmax] = w
    pb = 1 << 22  # PIL PRECISION_BITS fixed-point grid (round half away)
    out = np.where(out < 0, np.ceil(out * pb - 0.5), np.floor(out * pb + 0.5)) / pb
    return out.astype(np.float32)


def _round8(x):
    """PIL clip8: round-half-up to the uint8 grid, clamped (stays f32)."""
    import jax.numpy as jnp

    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)


def resize_frames_device(frames, wh, ww, quantize: bool = True):
    """(T, C, H, W) uint8/f32 -> (T, C, H', W') f32 in [0, 255].

    ``wh``/``ww`` are :func:`pil_resize_weights` matrices for the H and W
    axes. Horizontal pass first, then vertical — PIL's order — with
    per-pass uint8 rounding when ``quantize`` (the PIL-parity mode; turn
    off for resampling already-continuous data). jit-friendly: output
    shape is static from the weight shapes.
    """
    import jax.numpy as jnp

    x = frames.astype(jnp.float32)
    x = jnp.einsum("tchw,ow->tcho", x, ww, preferred_element_type=jnp.float32)
    if quantize:
        x = _round8(x)
    x = jnp.einsum("tchw,oh->tcow", x, wh, preferred_element_type=jnp.float32)
    if quantize:
        x = _round8(x)
    return x


def resize_frames_host(frames: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Numpy twin of :func:`resize_frames_device` (tests, host fallback)."""
    wh = pil_resize_weights(frames.shape[2], out_h)
    ww = pil_resize_weights(frames.shape[3], out_w)
    x = frames.astype(np.float32)
    x = np.clip(np.floor(np.einsum("tchw,ow->tcho", x, ww) + 0.5), 0, 255)
    x = np.clip(np.floor(np.einsum("tchw,oh->tcow", x, wh) + 0.5), 0, 255)
    return x
