"""Qwen2-VL model-family parity: our JAX variant vs HF transformers (CPU).

The reference selects between Qwen2-VL / Qwen2.5-VL / Aria by model name
(grpo_trainer.py:211-219); this covers the Qwen2-VL branch: LayerNorm +
QuickGELU vision blocks, full (per-frame) attention instead of windows,
LayerNorm patch merger, and unscaled M-RoPE temporal indices.
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from open_o3_video_tpu.models.qwen25vl import (
    Qwen25VLConfig,
    forward,
    get_rope_index,
    params as P,
    tiny_qwen2,
)

import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_pair():
    from transformers.models.qwen2_vl import (
        Qwen2VLConfig,
        Qwen2VLForConditionalGeneration,
    )

    ours_cfg = tiny_qwen2()
    v, t = ours_cfg.vision, ours_cfg.text
    hf_cfg = Qwen2VLConfig(
        vision_config=dict(
            depth=v.depth,
            embed_dim=v.hidden_size,
            hidden_size=v.out_hidden_size,
            hidden_act="quick_gelu",
            mlp_ratio=v.intermediate_size / v.hidden_size,
            num_heads=v.num_heads,
            patch_size=v.patch_size,
            spatial_merge_size=v.spatial_merge_size,
            temporal_patch_size=v.temporal_patch_size,
        ),
        text_config=dict(
            vocab_size=t.vocab_size,
            hidden_size=t.hidden_size,
            intermediate_size=t.intermediate_size,
            num_hidden_layers=t.num_hidden_layers,
            num_attention_heads=t.num_attention_heads,
            num_key_value_heads=t.num_key_value_heads,
            rms_norm_eps=t.rms_norm_eps,
            rope_theta=t.rope_theta,
            rope_scaling={"type": "mrope", "mrope_section": list(t.mrope_section)},
            tie_word_embeddings=False,
            max_position_embeddings=t.max_position_embeddings,
        ),
        image_token_id=ours_cfg.image_token_id,
        video_token_id=ours_cfg.video_token_id,
        vision_start_token_id=ours_cfg.vision_start_token_id,
        vision_end_token_id=ours_cfg.vision_end_token_id,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf_model = Qwen2VLForConditionalGeneration(hf_cfg).eval().float()
    ours_params = P.from_torch_state_dict(hf_model.state_dict(), ours_cfg)
    return hf_model, ours_params, ours_cfg


def test_config_autodetect_qwen2():
    cfg = Qwen25VLConfig.from_hf_dict(
        {
            "model_type": "qwen2_vl",
            "vision_config": {"depth": 4, "embed_dim": 96, "hidden_size": 128, "mlp_ratio": 4},
            "vocab_size": 1000,
        }
    )
    assert cfg.model_type == "qwen2_vl"
    assert cfg.vision.hidden_size == 96
    assert cfg.vision.out_hidden_size == 128
    assert cfg.vision.intermediate_size == 384
    assert cfg.vision.act_type == "quickgelu"
    assert cfg.vision.norm_type == "layernorm"
    assert not cfg.vision.use_windows


def test_config_roundtrip_qwen2():
    cfg = tiny_qwen2()
    again = Qwen25VLConfig.from_hf_dict(cfg.to_hf_dict())
    assert dataclasses.replace(again, dtype=cfg.dtype) == cfg


def test_text_only_parity(tiny_pair):
    hf_model, ours_params, cfg = tiny_pair
    rng = np.random.default_rng(0)
    input_ids = rng.integers(0, 400, size=(2, 12))
    with torch.no_grad():
        hf_logits = hf_model(input_ids=torch.tensor(input_ids)).logits.numpy()

    position_ids, _ = get_rope_index(cfg, input_ids)
    ours_logits, _ = forward(
        ours_params, cfg, jnp.asarray(input_ids), jnp.asarray(position_ids)
    )
    np.testing.assert_allclose(
        np.asarray(ours_logits), hf_logits, atol=2e-4, rtol=2e-3
    )


@pytest.mark.parametrize("grid", [(1, 4, 8), (2, 6, 10)])
def test_vision_text_parity(tiny_pair, grid):
    hf_model, ours_params, cfg = tiny_pair
    rng = np.random.default_rng(1)
    t, h, w = grid
    n_patches = t * h * w
    n_tokens = n_patches // cfg.vision.merge_unit
    pixel_values = rng.normal(0, 1, size=(n_patches, cfg.vision.patch_dim)).astype(
        np.float32
    )
    grid_thw = np.array([[t, h, w]], dtype=np.int64)

    ids = (
        rng.integers(0, 100, size=5).tolist()
        + [cfg.vision_start_token_id]
        + [cfg.image_token_id] * n_tokens
        + [cfg.vision_end_token_id]
        + rng.integers(0, 100, size=4).tolist()
    )
    input_ids = np.array([ids])

    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.tensor(input_ids),
            pixel_values=torch.tensor(pixel_values),
            image_grid_thw=torch.tensor(grid_thw),
        ).logits.numpy()

    position_ids, _ = get_rope_index(cfg, input_ids, image_grid_thw=grid_thw)
    ours_logits, _ = forward(
        ours_params,
        cfg,
        jnp.asarray(input_ids),
        jnp.asarray(position_ids),
        pixel_patches=jnp.asarray(pixel_values),
        grid_thw=grid_thw,
        vision_token_id=cfg.image_token_id,
    )
    np.testing.assert_allclose(
        np.asarray(ours_logits), hf_logits, atol=5e-4, rtol=5e-3
    )


def test_rope_index_parity_unscaled_time(tiny_pair):
    """Qwen2-VL t_index is the raw frame index — pin against HF."""
    hf_model, _, cfg = tiny_pair
    rng = np.random.default_rng(2)
    grid_thw = np.array([[4, 4, 4]], dtype=np.int64)
    n = int(np.prod(grid_thw[0])) // cfg.vision.merge_unit
    ids = (
        rng.integers(0, 100, size=3).tolist()
        + [cfg.vision_start_token_id]
        + [cfg.video_token_id] * n
        + [cfg.vision_end_token_id]
        + rng.integers(0, 100, size=4).tolist()
    )
    input_ids = np.array([ids])
    attention_mask = np.ones_like(input_ids)

    hf_pos, hf_deltas = hf_model.model.get_rope_index(
        torch.tensor(input_ids),
        video_grid_thw=torch.tensor(grid_thw),
        attention_mask=torch.tensor(attention_mask),
    )
    ours_pos, ours_deltas = get_rope_index(
        cfg,
        input_ids,
        video_grid_thw=grid_thw,
        second_per_grid_ts=[0.5],  # must be ignored for qwen2_vl
        attention_mask=attention_mask,
    )
    np.testing.assert_array_equal(ours_pos, hf_pos.numpy())
    np.testing.assert_array_equal(ours_deltas, hf_deltas.numpy())
    # Temporal index advances per frame (unscaled): 4 distinct t positions.
    vis = np.array(ids) == cfg.video_token_id
    assert len(np.unique(ours_pos[0, 0, vis])) == grid_thw[0, 0]


def test_safetensors_roundtrip_qwen2(tmp_path):
    import json
    import os

    cfg = tiny_qwen2()
    params = P.init(cfg, seed=3)
    out = tmp_path / "export"
    os.makedirs(out)
    P.save_safetensors(params, cfg, str(out / "model.safetensors"))
    with open(out / "config.json", "w") as f:
        json.dump(cfg.to_hf_dict(), f)
    cfg2 = Qwen25VLConfig.from_pretrained(str(out), dtype=jnp.float32)
    assert cfg2.model_type == "qwen2_vl"
    params2, _ = P.load_pretrained(str(out), cfg=cfg2)
    import jax

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-6
        ),
        params,
        params2,
    )


def test_engine_generate_qwen2():
    """The inference engine serves the Qwen2-VL family unchanged."""
    from open_o3_video_tpu.engine import InferenceEngine, Request, SamplingParams
    from open_o3_video_tpu.ops.preprocess import frames_as_images_patches

    cfg = tiny_qwen2()
    params = P.init(cfg, seed=0)
    engine = InferenceEngine(params, cfg, prompt_buckets=(64,), cache_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(2, 3, 28, 56), dtype=np.uint8)
    patches, grid = frames_as_images_patches(frames)
    n_tok = patches.shape[0] // cfg.vision.merge_unit
    reqs = [
        Request(
            input_ids=[7, 8, cfg.vision_start_token_id]
            + [cfg.image_token_id] * n_tok
            + [cfg.vision_end_token_id, 9],
            pixel_patches=patches,
            grid_thw=grid,
            vision_token_id=cfg.image_token_id,
        ),
        Request(input_ids=list(range(40, 52))),
    ]
    outs = engine.generate(reqs, SamplingParams(temperature=0.0, max_tokens=6))
    assert len(outs) == 2
    for o in outs:
        assert 1 <= len(o["token_ids"]) <= 6
