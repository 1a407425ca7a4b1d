"""Pallas windowed (segment) attention vs the XLA reference path.

The vision tower's hot attention op (ops/window_attention.py) — forward and
custom-VJP backward — pinned against the plain masked XLA implementation in
interpret mode on CPU, over the shapes the tower actually emits: W=64
windows, ragged edge windows, and whole-frame global segments.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_o3_video_tpu.ops.attention import segment_attention
from open_o3_video_tpu.ops.window_attention import window_attention


def _xla_ref(q, k, v, valid):
    mask = (valid[:, None, :] & valid[:, :, None])[:, None, :, :]
    return jax.nn.dot_product_attention(q, k, v, mask=mask)


def _case(n, w, h, d, ragged=False, seed=0):
    rng = np.random.default_rng(seed)
    q, k, v = (
        jnp.asarray(rng.standard_normal((n, w, h, d)), jnp.float32)
        for _ in range(3)
    )
    valid = np.ones((n, w), bool)
    if ragged:
        # edge windows: last rows only partially valid (like 9x12 grids
        # at win=4 — 64/64/16-token segments)
        for i in range(n):
            valid[i, rng.integers(w // 4, w + 1):] = False
        valid[0, 1:] = False  # near-degenerate window
    return q, k, v, jnp.asarray(valid)


SHAPES = [
    (6, 64, 4, 80, False),   # production window shape (reduced heads)
    (6, 64, 4, 80, True),    # ragged edge windows
    (3, 432, 2, 80, True),   # global whole-frame segments (18x24)
    (5, 16, 3, 32, True),    # tiny odd shape
]


@pytest.mark.parametrize("n,w,h,d,ragged", SHAPES)
def test_forward_matches_xla(n, w, h, d, ragged):
    q, k, v, valid = _case(n, w, h, d, ragged)
    ref = _xla_ref(q, k, v, valid)
    out = window_attention(q, k, v, valid, True)  # interpret mode
    # only valid positions are contractually defined
    m = np.asarray(valid)[:, :, None, None]
    np.testing.assert_allclose(
        np.asarray(out) * m, np.asarray(ref) * m, atol=2e-5, rtol=2e-5
    )


@pytest.mark.parametrize("n,w,h,d,ragged", SHAPES[:3])
def test_backward_matches_xla(n, w, h, d, ragged):
    q, k, v, valid = _case(n, w, h, d, ragged, seed=1)
    m = jnp.asarray(np.asarray(valid)[:, :, None, None], jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum((_xla_ref(q, k, v, valid) * m) ** 2)

    def loss_pl(q, k, v):
        return jnp.sum((window_attention(q, k, v, valid, True) * m) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ref, g_pl, "qkv"):
        # grads w.r.t. invalid rows feed discarded outputs; mask them
        np.testing.assert_allclose(
            np.asarray(b) * m, np.asarray(a) * m, atol=1e-4, rtol=1e-4,
            err_msg=f"d{name}",
        )


def test_segment_attention_dispatch_forced_pallas():
    """impl='pallas' routes through the kernel; CPU runs it via interpret
    only when forced explicitly (auto keeps XLA off-TPU)."""
    q, k, v, valid = _case(4, 32, 2, 64, ragged=True)
    ref = segment_attention(q, k, v, valid, impl="xla")
    out = window_attention(q, k, v, valid, True)
    m = np.asarray(valid)[:, :, None, None]
    np.testing.assert_allclose(
        np.asarray(out) * m, np.asarray(ref) * m, atol=2e-5, rtol=2e-5
    )


def test_bf16_forward_close():
    q, k, v, valid = _case(4, 64, 4, 80, ragged=True, seed=2)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    ref = _xla_ref(q, k, v, valid)
    out = window_attention(qb, kb, vb, valid, True)
    assert out.dtype == jnp.bfloat16
    m = np.asarray(valid)[:, :, None, None]
    np.testing.assert_allclose(
        np.asarray(out, np.float32) * m, np.asarray(ref) * m, atol=3e-2
    )


def test_vision_padded_layout_matches_gather_path():
    """The padded window layout (one entry/exit gather, reshape segments)
    must equal the gather/scatter SegmentSpec path bit-for-tolerance —
    including ragged edge windows (9x12 merged grid at win=4 -> 64/64/16
    segments) and the global full-attention layers."""
    import dataclasses
    import os

    from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, params as P
    from open_o3_video_tpu.models.qwen25vl.vision import (
        compute_vision_spec,
        vision_forward,
    )
    from open_o3_video_tpu.ops.preprocess import frames_as_images_patches

    cfg = Qwen25VLConfig.tiny(dtype=jnp.float32)
    vcfg = dataclasses.replace(
        cfg.vision, depth=3, fullatt_block_indexes=(1,),
    )
    rng = np.random.default_rng(0)
    # 252x336 at patch 14 -> 18x24 patches = 9x12 merged -> ragged windows
    frames = rng.integers(0, 255, size=(2, 3, 252, 336), dtype=np.uint8)
    patches, grid = frames_as_images_patches(
        frames, patch_size=vcfg.patch_size,
        temporal_patch_size=vcfg.temporal_patch_size,
        merge_size=vcfg.spatial_merge_size,
    )
    params = P.init(dataclasses.replace(cfg, vision=vcfg), seed=0)["visual"]
    spec = compute_vision_spec([tuple(g) for g in grid], vcfg)
    assert spec.padded_index is not None  # uniform grids -> padded layout

    os.environ["O3V_VIT_PADDED"] = "1"
    try:
        out_pad = vision_forward(params, jnp.asarray(patches), spec, vcfg)
    finally:
        del os.environ["O3V_VIT_PADDED"]
    out_gather = vision_forward(params, jnp.asarray(patches), spec, vcfg)
    np.testing.assert_allclose(
        np.asarray(out_pad), np.asarray(out_gather), atol=1e-5, rtol=1e-5
    )


def test_vision_mixed_grids_padded_layout():
    """Heterogeneous grids still get the padded WINDOW layout (the window
    is win x win for every grid); only the whole-frame global layers fall
    back to masked segment attention over the padded sequence."""
    from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig
    from open_o3_video_tpu.models.qwen25vl.vision import compute_vision_spec

    vcfg = Qwen25VLConfig.tiny().vision
    spec = compute_vision_spec([(1, 4, 8), (1, 8, 4)], vcfg)
    assert spec.padded_index is not None
    assert spec.frame_w == 0 and spec.full_seg_pad is not None
    # padded gather covers every real token exactly once
    idx = spec.padded_index[spec.padded_valid]
    assert sorted(idx.tolist()) == list(range(spec.seq_len))


def test_vision_fused_heterogeneous_matches_gather(monkeypatch):
    """Mixed-resolution batches (every real eval batch) run the fused
    windowed layers + masked-segment global layers; must equal the plain
    gather/XLA tower."""
    import dataclasses

    from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, params as P
    from open_o3_video_tpu.models.qwen25vl.vision import (
        compute_vision_spec,
        vision_forward,
    )
    from open_o3_video_tpu.ops.preprocess import frames_as_images_patches

    cfg = Qwen25VLConfig.tiny(dtype=jnp.float32)
    vcfg = dataclasses.replace(cfg.vision, depth=3, fullatt_block_indexes=(1,))
    rng = np.random.default_rng(1)
    batches = []
    grids = []
    for hw in ((252, 336), (140, 196)):
        frames = rng.integers(0, 255, size=(2, 3, *hw), dtype=np.uint8)
        p, g = frames_as_images_patches(
            frames, patch_size=vcfg.patch_size,
            temporal_patch_size=vcfg.temporal_patch_size,
            merge_size=vcfg.spatial_merge_size,
        )
        batches.append(p)
        grids.extend(tuple(r) for r in g)
    patches = np.concatenate(batches, axis=0)
    params = P.init(dataclasses.replace(cfg, vision=vcfg), seed=0)["visual"]
    spec = compute_vision_spec(grids, vcfg)
    assert spec.frame_w == 0  # heterogeneous frames

    out_ref = vision_forward(params, jnp.asarray(patches), spec, vcfg)
    monkeypatch.setenv("O3V_ATTN_IMPL", "pallas")
    monkeypatch.setenv("O3V_PALLAS_INTERPRET", "1")
    out_fused = vision_forward(params, jnp.asarray(patches), spec, vcfg)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), atol=2e-5, rtol=2e-5
    )


# --- fused rope + attention kernel -----------------------------------------


def _fused_ref(qkv, cos, sin, valid, heads):
    """XLA reference for fused_window_attention: slice -> rope -> attention."""
    n, w, three_hd = qkv.shape
    d = three_hd // 3 // heads
    x = qkv.reshape(n, w, 3, heads, d)
    q, k, v = x[:, :, 0], x[:, :, 1], x[:, :, 2]

    def rope(t):
        t = t.astype(jnp.float32)
        c = cos[:, :, None, :]
        s = sin[:, :, None, :]
        t1, t2 = jnp.split(t, 2, axis=-1)
        rot = jnp.concatenate([-t2, t1], axis=-1)
        return (t * c + rot * s).astype(qkv.dtype)

    out = _xla_ref(rope(q), rope(k), v, valid)
    return out.reshape(n, w, heads * d)


def _fused_case(n, w, heads, d, ragged=True, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    qkv = jnp.asarray(rng.standard_normal((n, w, 3 * heads * d)), dtype)
    freqs = rng.standard_normal((n, w, d // 2)).astype(np.float32)
    emb = np.concatenate([freqs, freqs], axis=-1)
    cos = jnp.asarray(np.cos(emb))
    sin = jnp.asarray(np.sin(emb))
    valid = np.ones((n, w), bool)
    if ragged:
        for i in range(n):
            valid[i, rng.integers(w // 4, w + 1):] = False
    return qkv, cos, sin, jnp.asarray(valid)


@pytest.mark.parametrize("n,w,heads,d", [(6, 64, 4, 80), (3, 144, 2, 80),
                                         (5, 16, 3, 32)])
def test_fused_forward_matches_xla(n, w, heads, d):
    qkv, cos, sin, valid = _fused_case(n, w, heads, d)
    from open_o3_video_tpu.ops.window_attention import fused_window_attention

    ref = _fused_ref(qkv, cos, sin, valid, heads)
    out = fused_window_attention(qkv, cos, sin, valid, heads, True)
    m = np.asarray(valid)[:, :, None]
    np.testing.assert_allclose(
        np.asarray(out) * m, np.asarray(ref) * m, atol=3e-5, rtol=3e-5
    )


@pytest.mark.parametrize("n,w,heads,d", [(4, 64, 4, 80), (3, 48, 2, 32)])
def test_fused_backward_matches_xla(n, w, heads, d):
    qkv, cos, sin, valid = _fused_case(n, w, heads, d, seed=3)
    from open_o3_video_tpu.ops.window_attention import fused_window_attention

    m = jnp.asarray(np.asarray(valid)[:, :, None], jnp.float32)

    def loss_ref(qkv):
        return jnp.sum((_fused_ref(qkv, cos, sin, valid, heads) * m) ** 2)

    def loss_pl(qkv):
        return jnp.sum(
            (fused_window_attention(qkv, cos, sin, valid, heads, True) * m) ** 2
        )

    g_ref = jax.grad(loss_ref)(qkv)
    g_pl = jax.grad(loss_pl)(qkv)
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_ref), atol=2e-4, rtol=2e-4
    )


def test_vision_fused_path_matches_gather(monkeypatch):
    """The full fused tower (padded layout + fused rope+attention kernel,
    interpret mode) must match the default gather/XLA tower — windowed
    ragged grids AND the global whole-frame layers."""
    import dataclasses

    from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, params as P
    from open_o3_video_tpu.models.qwen25vl.vision import (
        compute_vision_spec,
        vision_forward,
    )
    from open_o3_video_tpu.ops.preprocess import frames_as_images_patches

    cfg = Qwen25VLConfig.tiny(dtype=jnp.float32)
    vcfg = dataclasses.replace(cfg.vision, depth=3, fullatt_block_indexes=(1,))
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(2, 3, 252, 336), dtype=np.uint8)
    patches, grid = frames_as_images_patches(
        frames, patch_size=vcfg.patch_size,
        temporal_patch_size=vcfg.temporal_patch_size,
        merge_size=vcfg.spatial_merge_size,
    )
    params = P.init(dataclasses.replace(cfg, vision=vcfg), seed=0)["visual"]
    spec = compute_vision_spec([tuple(g) for g in grid], vcfg)

    out_ref = vision_forward(params, jnp.asarray(patches), spec, vcfg)
    monkeypatch.setenv("O3V_ATTN_IMPL", "pallas")
    monkeypatch.setenv("O3V_PALLAS_INTERPRET", "1")
    out_fused = vision_forward(params, jnp.asarray(patches), spec, vcfg)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), atol=2e-5, rtol=2e-5
    )


def test_vision_nowindow_uniform_gets_padded_identity():
    """Qwen2/Qwen3-VL (no window partition): uniform grids expose the
    identity padded layout so frame segments can use the fused kernel."""
    import dataclasses

    from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig
    from open_o3_video_tpu.models.qwen25vl.vision import compute_vision_spec

    vcfg = dataclasses.replace(Qwen25VLConfig.tiny().vision, use_windows=False)
    spec = compute_vision_spec([(2, 4, 8), (2, 4, 8)], vcfg)
    assert spec.padded_index is not None
    assert spec.win_w == spec.frame_w == 32
    np.testing.assert_array_equal(spec.padded_index, np.arange(128))
    assert spec.padded_valid.all()
    # heterogeneous stays gather-only
    spec2 = compute_vision_spec([(1, 4, 8), (1, 8, 8)], vcfg)
    assert spec2.padded_index is None


# --- packed window layout (segment ids) --------------------------------------


def _gid_ref(q, k, v, gids):
    g = gids.astype(jnp.int32)
    mask = ((g[:, :, None] == g[:, None, :]) & (g[:, None, :] != 0))
    return jax.nn.dot_product_attention(q, k, v, mask=mask[:, None, :, :])


def _gid_case(n, w, h, d, seed=0):
    """Rows holding several independent segments (packed windows) + pads."""
    rng = np.random.default_rng(seed)
    q, k, v = (
        jnp.asarray(rng.standard_normal((n, w, h, d)), jnp.float32)
        for _ in range(3)
    )
    gids = np.zeros((n, w), np.int32)
    for i in range(n):
        pos, g = 0, 1
        while pos < w:
            size = int(rng.integers(1, w - pos + 1))
            if rng.random() < 0.15:  # leave a pad hole
                pos += size
                continue
            gids[i, pos : pos + size] = g
            g += 1
            pos += size
    gids[0, :] = 0  # fully padded row
    return q, k, v, jnp.asarray(gids)


@pytest.mark.parametrize("n,w,h,d", [(6, 64, 4, 80), (5, 16, 3, 32)])
def test_forward_group_ids(n, w, h, d):
    q, k, v, gids = _gid_case(n, w, h, d)
    ref = _gid_ref(q, k, v, gids)
    out = window_attention(q, k, v, gids, True)
    m = (np.asarray(gids) != 0)[:, :, None, None]
    np.testing.assert_allclose(
        np.asarray(out) * m, np.asarray(ref) * m, atol=2e-5, rtol=2e-5
    )


def test_backward_group_ids():
    q, k, v, gids = _gid_case(4, 64, 2, 80, seed=3)
    m = jnp.asarray((np.asarray(gids) != 0)[:, :, None, None], jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum((_gid_ref(q, k, v, gids) * m) ** 2)

    def loss_pl(q, k, v):
        return jnp.sum((window_attention(q, k, v, gids, True) * m) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ref, g_pl, "qkv"):
        np.testing.assert_allclose(
            np.asarray(b) * m, np.asarray(a) * m, atol=1e-4, rtol=1e-4,
            err_msg=f"d{name}",
        )


def test_fused_group_ids():
    from open_o3_video_tpu.ops.window_attention import fused_window_attention

    n, w, heads, d = 5, 64, 4, 80
    rng = np.random.default_rng(7)
    qkv = jnp.asarray(rng.standard_normal((n, w, 3 * heads * d)), jnp.float32)
    freqs = rng.standard_normal((n, w, d // 2)).astype(np.float32)
    emb = np.concatenate([freqs, freqs], axis=-1)
    cos, sin = jnp.asarray(np.cos(emb)), jnp.asarray(np.sin(emb))
    _, _, _, gids = _gid_case(n, w, 1, 1, seed=9)

    def ref(qkv):
        x = qkv.reshape(n, w, 3, heads, d)
        q, k, v = x[:, :, 0], x[:, :, 1], x[:, :, 2]

        def rope(t):
            c, s = cos[:, :, None, :], sin[:, :, None, :]
            t1, t2 = jnp.split(t, 2, axis=-1)
            return t * c + jnp.concatenate([-t2, t1], axis=-1) * s

        return _gid_ref(rope(q), rope(k), v, gids).reshape(n, w, heads * d)

    def fused(qkv):
        return fused_window_attention(qkv, cos, sin, gids, heads, True)

    m = jnp.asarray((np.asarray(gids) != 0)[:, :, None], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fused(qkv) * m), np.asarray(ref(qkv) * m),
        atol=3e-5, rtol=3e-5,
    )
    g_ref = jax.grad(lambda x: jnp.sum((ref(x) * m) ** 2))(qkv)
    g_pl = jax.grad(lambda x: jnp.sum((fused(x) * m) ** 2))(qkv)
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_ref), atol=2e-4, rtol=2e-4
    )


def test_vision_packing_layout():
    """First-fit-decreasing packing at the production 18x24-patch grid:
    9 windows (6x64 + 3x16 tokens) pack into 7 rows, 3.7% pad inflation,
    every token covered exactly once, ids unique per window within a row."""
    from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig
    from open_o3_video_tpu.models.qwen25vl.vision import compute_vision_spec

    vcfg = Qwen25VLConfig.tiny().vision  # win=4 merged, unit=4
    spec = compute_vision_spec([(2, 18, 24)], vcfg)
    win_w = spec.win_w
    assert spec.padded_gids is not None
    n_rows = len(spec.padded_gids) // win_w
    assert n_rows == 2 * 7  # per frame: 9 windows -> 6 full rows + 1 packed row
    # coverage: every real token exactly once
    idx = spec.padded_index[spec.padded_valid]
    assert sorted(idx.tolist()) == list(range(spec.seq_len))
    # the packed row holds 3 independent windows
    gids = spec.padded_gids.reshape(n_rows, win_w)
    assert gids.max() == 3
    assert (spec.padded_gids != 0).tolist() == spec.padded_valid.tolist()
    # frame stays one contiguous run for the global layers
    assert spec.frame_w == 7 * win_w

    # O3V_VIT_PACK=0 restores one window per row
    import os

    os.environ["O3V_VIT_PACK"] = "0"
    try:
        spec0 = compute_vision_spec([(2, 18, 24)], vcfg)
    finally:
        del os.environ["O3V_VIT_PACK"]
    assert len(spec0.padded_gids) // win_w == 2 * 9
    assert spec0.padded_gids.max() == 1


def test_vision_pack_on_off_equal(monkeypatch):
    """Packed tower == unpacked tower == gather tower (fused interpret)."""
    import dataclasses

    from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, params as P
    from open_o3_video_tpu.models.qwen25vl.vision import (
        compute_vision_spec,
        vision_forward,
    )
    from open_o3_video_tpu.ops.preprocess import frames_as_images_patches

    cfg = Qwen25VLConfig.tiny(dtype=jnp.float32)
    vcfg = dataclasses.replace(cfg.vision, depth=3, fullatt_block_indexes=(1,))
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(2, 3, 252, 336), dtype=np.uint8)
    patches, grid = frames_as_images_patches(
        frames, patch_size=vcfg.patch_size,
        temporal_patch_size=vcfg.temporal_patch_size,
        merge_size=vcfg.spatial_merge_size,
    )
    params = P.init(dataclasses.replace(cfg, vision=vcfg), seed=0)["visual"]
    grids = [tuple(g) for g in grid]

    out_ref = vision_forward(
        params, jnp.asarray(patches), compute_vision_spec(grids, vcfg), vcfg
    )
    monkeypatch.setenv("O3V_ATTN_IMPL", "pallas")
    monkeypatch.setenv("O3V_PALLAS_INTERPRET", "1")
    spec_pack = compute_vision_spec(grids, vcfg)
    assert spec_pack.padded_gids.max() > 1  # packing engaged
    out_pack = vision_forward(params, jnp.asarray(patches), spec_pack, vcfg)
    monkeypatch.setenv("O3V_VIT_PACK", "0")
    spec_nopack = compute_vision_spec(grids, vcfg)
    out_nopack = vision_forward(params, jnp.asarray(patches), spec_nopack, vcfg)
    assert len(spec_pack.padded_gids) < len(spec_nopack.padded_gids)
    np.testing.assert_allclose(
        np.asarray(out_pack), np.asarray(out_ref), atol=2e-5, rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_nopack), np.asarray(out_ref), atol=2e-5, rtol=2e-5
    )


def test_oversized_window_falls_back_to_xla():
    """_block_shape never splits W, so beyond the per-tile ceiling the
    kernel cannot compile at all (measured on v5e: W=2047 fails Mosaic);
    segment_attention must route those shapes to the XLA path even when
    Pallas is forced."""
    from open_o3_video_tpu.ops.window_attention import window_attention_fits

    assert window_attention_fits(64, 16, 80)
    assert window_attention_fits(576, 16, 80)  # 24x24-patch frame
    assert not window_attention_fits(2047, 16, 80)
    assert not window_attention_fits(5408, 16, 80)  # ~1030px square frame
    # Forced-pallas dispatch on an oversized window: must not attempt the
    # kernel (CPU has no interpret env set here, so a kernel attempt would
    # fail) and must equal the XLA reference.
    q, k, v, valid = _case(1, 2048, 2, 16, ragged=True)
    ref = segment_attention(q, k, v, valid, impl="xla")
    out = segment_attention(q, k, v, valid, impl="pallas")
    m = np.asarray(valid)[:, :, None, None]
    np.testing.assert_allclose(
        np.asarray(out) * m, np.asarray(ref) * m, atol=2e-5, rtol=2e-5
    )


def test_inference_scope_relaxes_fused_budget():
    """fused_window_fits defaults to the backward-safe footprint; inside
    vit_inference_scope (the serving engine's trace context) it uses the
    forward-only footprint, admitting frame widths the bwd budget
    rejects."""
    from open_o3_video_tpu.ops.window_attention import (
        _fused_per_window_bytes,
        _VMEM_BUDGET,
        fused_window_fits,
        vit_inference_scope,
    )

    heads, d = 16, 80
    # Find a width in the gap: forward-only fits, backward does not.
    w = next(
        w for w in range(64, 4096, 16)
        if _fused_per_window_bytes(w, heads, d, bwd=False) <= _VMEM_BUDGET
        < _fused_per_window_bytes(w, heads, d, bwd=True)
    )
    assert not fused_window_fits(w, heads, d)
    with vit_inference_scope():
        assert fused_window_fits(w, heads, d)
    assert not fused_window_fits(w, heads, d)  # scope exited


def test_fast_softmax_matches_exact_forward():
    """The primal (inference) fixed-m forward must equal the exact
    max-subtracted forward (which runs under jax.grad) to f32 rounding
    while logits stay under the 60.0 clamp — both kernels."""
    from open_o3_video_tpu.ops import window_attention as WA

    q, k, v, valid = _case(6, 64, 4, 80, ragged=True, seed=5)
    fast = WA._fwd(q, k, v, valid, True, exact=False)[0]
    exact = WA._fwd(q, k, v, valid, True, exact=True)[0]
    m = np.asarray(valid)[:, :, None, None]
    np.testing.assert_allclose(
        np.asarray(fast) * m, np.asarray(exact) * m, atol=2e-6, rtol=2e-6
    )
    # fully-masked pad rows come out finite (0), never NaN
    assert np.isfinite(np.asarray(fast)).all()

    n, w, heads, d = 4, 64, 4, 80
    rng = np.random.default_rng(11)
    qkv = jnp.asarray(rng.standard_normal((n, w, 3 * heads * d)), jnp.float32)
    freqs = rng.standard_normal((n, w, d // 2)).astype(np.float32)
    emb = np.concatenate([freqs, freqs], axis=-1)
    cos, sin = jnp.asarray(np.cos(emb)), jnp.asarray(np.sin(emb))
    _, _, _, gids = _gid_case(n, w, 1, 1, seed=13)
    fastf = WA._fused_fwd(qkv, cos, sin, gids, heads, True, exact=False)[0]
    exactf = WA._fused_fwd(qkv, cos, sin, gids, heads, True, exact=True)[0]
    mf = (np.asarray(gids) != 0)[:, :, None]
    np.testing.assert_allclose(
        np.asarray(fastf) * mf, np.asarray(exactf) * mf, atol=2e-6, rtol=2e-6
    )
    assert np.isfinite(np.asarray(fastf)).all()


def test_fast_softmax_clamp_stays_finite():
    """Logits beyond the 60.0 clamp: outputs stay finite (the exactness
    contract only covers logits under the clamp; real models are O(30))."""
    from open_o3_video_tpu.ops import window_attention as WA

    q, k, v, valid = _case(2, 16, 2, 32, seed=6)
    out = WA._fwd(q * 300.0, k * 300.0, v, valid, True, exact=False)[0]
    assert np.isfinite(np.asarray(out)).all()


def test_vision_pack_factor_matches_gather_path(monkeypatch):
    """O3V_VIT_PACK=2 packs two full 64-token windows per 128-token row
    (full MXU score tiles); the tower output must still equal the
    gather/scatter path, global layers included."""
    import dataclasses

    from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, params as P
    from open_o3_video_tpu.models.qwen25vl.vision import (
        compute_vision_spec,
        vision_forward,
    )
    from open_o3_video_tpu.ops.preprocess import frames_as_images_patches

    cfg = Qwen25VLConfig.tiny(dtype=jnp.float32)
    vcfg = dataclasses.replace(cfg.vision, depth=3, fullatt_block_indexes=(1,))
    rng = np.random.default_rng(21)
    # 224x224 -> 16x16 patches -> 8x8 merged -> 4 FULL 4x4 windows/frame:
    # packing two per row adds zero pad slots, so the guard keeps it.
    frames = rng.integers(0, 255, size=(2, 3, 224, 224), dtype=np.uint8)
    patches, grid = frames_as_images_patches(
        frames, patch_size=vcfg.patch_size,
        temporal_patch_size=vcfg.temporal_patch_size,
        merge_size=vcfg.spatial_merge_size,
    )
    params = P.init(dataclasses.replace(cfg, vision=vcfg), seed=0)["visual"]
    grids = [tuple(g) for g in grid]

    # Baseline must be the genuine capacity-1 layout: the default pack
    # factor is 2 (vision.py), so pin it off before building spec1.
    monkeypatch.setenv("O3V_VIT_PACK", "1")
    spec1 = compute_vision_spec(grids, vcfg)
    out_ref = vision_forward(params, jnp.asarray(patches), spec1, vcfg)

    monkeypatch.setenv("O3V_VIT_PACK", "2")
    spec2 = compute_vision_spec(grids, vcfg)
    assert spec2.win_w == 2 * spec1.win_w
    # fewer, wider rows; same slot total (uniform full windows)
    rows1 = len(spec1.padded_gids) // spec1.win_w
    rows2 = len(spec2.padded_gids) // spec2.win_w
    assert rows2 == rows1 // 2
    assert len(spec2.padded_gids) == len(spec1.padded_gids)
    idx = spec2.padded_index[spec2.padded_valid]
    assert sorted(idx.tolist()) == list(range(spec2.seq_len))

    # ragged grids (18x24 patches: 9 windows incl. 3 quarter windows) would
    # inflate the padded sequence at capacity 2 — the guard falls back
    spec_ragged1 = compute_vision_spec([(1, 18, 24)], vcfg)
    monkeypatch.setenv("O3V_VIT_PACK", "1")
    spec_ragged0 = compute_vision_spec([(1, 18, 24)], vcfg)
    assert spec_ragged1.win_w == spec_ragged0.win_w
    assert len(spec_ragged1.padded_gids) == len(spec_ragged0.padded_gids)
    monkeypatch.setenv("O3V_VIT_PACK", "2")

    # gather path (packing only affects the padded layout's row geometry)
    out_gather = vision_forward(params, jnp.asarray(patches), spec2, vcfg)
    np.testing.assert_allclose(
        np.asarray(out_gather), np.asarray(out_ref), atol=1e-5, rtol=1e-5
    )
    # fused padded path on the packed layout
    monkeypatch.setenv("O3V_ATTN_IMPL", "pallas")
    monkeypatch.setenv("O3V_PALLAS_INTERPRET", "1")
    out_packed = vision_forward(params, jnp.asarray(patches), spec2, vcfg)
    np.testing.assert_allclose(
        np.asarray(out_packed), np.asarray(out_ref), atol=2e-5, rtol=2e-5
    )
