"""Qwen3-VL model-family parity: our JAX variant vs HF transformers (CPU).

The reference's 2025-11 update retrains on Qwen3-VL-8B (README.md:37 reports
V-STAR mAM 35.5 / mLGM 49.0 with it); this covers the family: interpolated
learned pos embed, deepstack feature taps injected into the early decoder
layers, qk-norm attention without biases, and interleaved M-RoPE.
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
    tiny_qwen3,
)

import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_pair():
    from transformers.models.qwen3_vl import (
        Qwen3VLConfig,
        Qwen3VLForConditionalGeneration,
    )

    ours_cfg = tiny_qwen3()
    v, t = ours_cfg.vision, ours_cfg.text
    hf_cfg = Qwen3VLConfig(
        vision_config=dict(
            depth=v.depth,
            hidden_size=v.hidden_size,
            hidden_act="gelu_pytorch_tanh",
            intermediate_size=v.intermediate_size,
            num_heads=v.num_heads,
            patch_size=v.patch_size,
            spatial_merge_size=v.spatial_merge_size,
            temporal_patch_size=v.temporal_patch_size,
            out_hidden_size=v.out_hidden_size,
            num_position_embeddings=v.num_position_embeddings,
            deepstack_visual_indexes=list(v.deepstack_visual_indexes),
        ),
        text_config=dict(
            vocab_size=t.vocab_size,
            hidden_size=t.hidden_size,
            intermediate_size=t.intermediate_size,
            num_hidden_layers=t.num_hidden_layers,
            num_attention_heads=t.num_attention_heads,
            num_key_value_heads=t.num_key_value_heads,
            head_dim=t.head_dim,
            rms_norm_eps=t.rms_norm_eps,
            rope_theta=t.rope_theta,
            rope_scaling={"rope_type": "default", "mrope_section": list(t.mrope_section), "mrope_interleaved": True},
            attention_bias=False,
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
    hf_model = Qwen3VLForConditionalGeneration(hf_cfg).eval().float()
    ours_params = P.from_torch_state_dict(hf_model.state_dict(), ours_cfg)
    return hf_model, ours_params, ours_cfg


def test_config_autodetect_qwen3():
    cfg = Qwen25VLConfig.from_hf_dict(
        {
            "model_type": "qwen3_vl",
            "vision_config": {
                "depth": 27,
                "hidden_size": 1152,
                "intermediate_size": 4304,
                "deepstack_visual_indexes": [8, 16, 24],
                "num_position_embeddings": 2304,
            },
            "text_config": {"head_dim": 128, "attention_bias": False,
                            "rope_scaling": {"mrope_section": [24, 20, 20]}},
        }
    )
    assert cfg.model_type == "qwen3_vl"
    assert cfg.vision.act_type == "gelu_tanh"
    assert cfg.vision.deepstack_visual_indexes == (8, 16, 24)
    assert cfg.vision.num_position_embeddings == 2304
    assert cfg.vision.patch_embed_bias
    assert cfg.text.head_dim == 128
    assert not cfg.text.attention_bias
    assert cfg.text.use_qk_norm
    assert cfg.text.mrope_interleaved


def test_config_roundtrip_qwen3():
    cfg = tiny_qwen3()
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
def test_vision_text_parity_with_deepstack(tiny_pair, grid):
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


def test_rope_index_parity_video_split(tiny_pair):
    """Qwen3-VL splits video grids per frame (timestamps live in text)."""
    hf_model, _, cfg = tiny_pair
    rng = np.random.default_rng(2)
    grid_thw = np.array([[3, 4, 4]], dtype=np.int64)
    per_frame = 4 * 4 // cfg.vision.merge_unit
    ids = rng.integers(0, 100, size=3).tolist()
    # Qwen3-VL prompt shape: <t><vision_start><frame><vision_end> per frame.
    for _ in range(3):
        ids += (
            [55, cfg.vision_start_token_id]
            + [cfg.video_token_id] * per_frame
            + [cfg.vision_end_token_id]
        )
    ids += rng.integers(0, 100, size=4).tolist()
    input_ids = np.array([ids])
    attention_mask = np.ones_like(input_ids)

    hf_pos, hf_deltas = hf_model.model.get_rope_index(
        torch.tensor(input_ids),
        video_grid_thw=torch.tensor(grid_thw),
        attention_mask=torch.tensor(attention_mask),
    )
    ours_pos, ours_deltas = get_rope_index(
        cfg, input_ids, video_grid_thw=grid_thw, attention_mask=attention_mask
    )
    np.testing.assert_array_equal(ours_pos, hf_pos.numpy())
    np.testing.assert_array_equal(ours_deltas, hf_deltas.numpy())


def test_kv_cache_decode_matches_full_forward(tiny_pair):
    """Interleaved-mrope cached decode must reproduce the full forward."""
    from open_o3_video_tpu.models.qwen25vl.text import init_kv_cache

    _, ours_params, cfg = tiny_pair
    rng = np.random.default_rng(4)
    ids = rng.integers(0, 400, size=(1, 10))
    position_ids, _ = get_rope_index(cfg, ids)

    full_logits, _ = forward(ours_params, cfg, jnp.asarray(ids), jnp.asarray(position_ids))
    full = np.asarray(full_logits)

    cache = init_kv_cache(cfg.text, batch=1, max_len=16, dtype=jnp.float32)
    logits, cache = forward(
        ours_params, cfg,
        jnp.asarray(ids[:, :6]),
        jnp.asarray(position_ids[:, :, :6]),
        cache=cache, cache_offset=0,
    )
    np.testing.assert_allclose(np.asarray(logits), full[:, :6], atol=1e-5)
    for step in range(6, ids.shape[1]):
        logits, cache = forward(
            ours_params, cfg,
            jnp.asarray(ids[:, step : step + 1]),
            jnp.asarray(position_ids[:, :, step : step + 1]),
            cache=cache, cache_offset=step,
        )
        np.testing.assert_allclose(np.asarray(logits)[:, 0], full[:, step], atol=1e-5)


def test_safetensors_roundtrip_qwen3(tmp_path):
    import json
    import os

    import jax

    cfg = tiny_qwen3()
    params = P.init(cfg, seed=3)
    out = tmp_path / "export"
    os.makedirs(out)
    P.save_safetensors(params, cfg, str(out / "model.safetensors"))
    with open(out / "config.json", "w") as f:
        json.dump(cfg.to_hf_dict(), f)
    cfg2 = Qwen25VLConfig.from_pretrained(str(out), dtype=jnp.float32)
    assert cfg2.model_type == "qwen3_vl"
    params2, _ = P.load_pretrained(str(out), cfg=cfg2)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-6
        ),
        params,
        params2,
    )


@pytest.fixture(scope="module")
def engine_pair(tiny_pair):
    from open_o3_video_tpu.engine import InferenceEngine

    hf_model, ours_params, cfg = tiny_pair
    engine = InferenceEngine(
        ours_params, cfg, prompt_buckets=(32, 64), cache_dtype=jnp.float32,
        prefix_cache_min=8, suffix_buckets=(16, 32),
    )
    return hf_model, engine, cfg


def test_engine_greedy_matches_hf_generate(engine_pair):
    from open_o3_video_tpu.engine import Request, SamplingParams

    hf_model, engine, cfg = engine_pair
    rng = np.random.default_rng(0)
    prompt = rng.integers(5, 90, size=12).tolist()
    with torch.no_grad():
        hf_out = hf_model.generate(
            input_ids=torch.tensor([prompt]),
            attention_mask=torch.ones(1, len(prompt), dtype=torch.long),
            max_new_tokens=8,
            do_sample=False,
        )
    out = engine.generate(
        [Request(input_ids=prompt)],
        SamplingParams(temperature=0.0, repetition_penalty=1.0, max_tokens=8),
    )
    assert out[0]["token_ids"] == hf_out[0, len(prompt):].tolist()


def test_engine_vision_deepstack_matches_hf(engine_pair):
    """Engine prefill must route the deepstack taps into the early layers."""
    from open_o3_video_tpu.engine import Request, SamplingParams

    hf_model, engine, cfg = engine_pair
    rng = np.random.default_rng(2)
    grid = np.array([[1, 4, 8]], dtype=np.int64)
    n_tok = 32 // cfg.vision.merge_unit
    patches = rng.normal(0, 1, (32, cfg.vision.patch_dim)).astype(np.float32)
    prompt = (
        rng.integers(5, 90, size=4).tolist()
        + [cfg.vision_start_token_id]
        + [cfg.image_token_id] * n_tok
        + [cfg.vision_end_token_id]
        + rng.integers(5, 90, size=3).tolist()
    )
    with torch.no_grad():
        hf_out = hf_model.generate(
            input_ids=torch.tensor([prompt]),
            attention_mask=torch.ones(1, len(prompt), dtype=torch.long),
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor(grid),
            max_new_tokens=8,
            do_sample=False,
        )
    out = engine.generate(
        [Request(input_ids=prompt, pixel_patches=patches, grid_thw=grid,
                 vision_token_id=cfg.image_token_id)],
        SamplingParams(temperature=0.0, repetition_penalty=1.0, max_tokens=8),
    )
    assert out[0]["token_ids"] == hf_out[0, len(prompt):].tolist()


def test_engine_prefix_cache_qwen3_vision_family(engine_pair):
    """5 queries over one Qwen3-VL video: shared-prefix path == plain."""
    from open_o3_video_tpu.engine import InferenceEngine, Request, SamplingParams

    hf_model, engine, cfg = engine_pair
    rng = np.random.default_rng(3)
    grid = np.array([[1, 4, 8]], dtype=np.int64)
    n_tok = 32 // cfg.vision.merge_unit
    patches = rng.normal(0, 1, (32, cfg.vision.patch_dim)).astype(np.float32)
    shared = (
        [7, 8, cfg.vision_start_token_id]
        + [cfg.image_token_id] * n_tok
        + [cfg.vision_end_token_id]
    )
    reqs = [
        Request(input_ids=shared + [20 + q, 30 + q, 40 + q],
                pixel_patches=patches, grid_thw=grid,
                vision_token_id=cfg.image_token_id)
        for q in range(5)
    ]
    sampling = SamplingParams(temperature=0.0, max_tokens=6)
    engine.clear_prefix_cache()
    out_c = engine.generate(reqs, sampling)
    assert len(engine._prefix_kv) == 1
    plain = InferenceEngine(
        engine.params, cfg, prompt_buckets=(32, 64), cache_dtype=jnp.float32,
        prefix_cache_min=0,
    )
    out_p = plain.generate(reqs, sampling)
    for a, b in zip(out_p, out_c):
        assert a["token_ids"] == b["token_ids"]


class TestQwen3VLMoe:
    """Qwen3-VL-MoE (e.g. the released 30B-A3B): Qwen3-VL vision +
    softmax->topk->renorm routed experts, no shared experts."""

    @pytest.fixture(scope="class")
    def moe_pair(self):
        from transformers.models.qwen3_vl_moe import (
            Qwen3VLMoeConfig,
            Qwen3VLMoeForConditionalGeneration,
        )
        from open_o3_video_tpu.models.qwen25vl import tiny_qwen3_moe

        ours_cfg = tiny_qwen3_moe()
        v, t = ours_cfg.vision, ours_cfg.text
        hf_cfg = Qwen3VLMoeConfig(
            vision_config=dict(
                depth=v.depth,
                hidden_size=v.hidden_size,
                hidden_act="gelu_pytorch_tanh",
                intermediate_size=v.intermediate_size,
                num_heads=v.num_heads,
                patch_size=v.patch_size,
                spatial_merge_size=v.spatial_merge_size,
                temporal_patch_size=v.temporal_patch_size,
                out_hidden_size=v.out_hidden_size,
                num_position_embeddings=v.num_position_embeddings,
                deepstack_visual_indexes=list(v.deepstack_visual_indexes),
            ),
            text_config=dict(
                vocab_size=t.vocab_size,
                hidden_size=t.hidden_size,
                intermediate_size=t.intermediate_size,
                num_hidden_layers=t.num_hidden_layers,
                num_attention_heads=t.num_attention_heads,
                num_key_value_heads=t.num_key_value_heads,
                head_dim=t.head_dim,
                rms_norm_eps=t.rms_norm_eps,
                rope_theta=t.rope_theta,
                rope_scaling={"rope_type": "default", "mrope_section": list(t.mrope_section), "mrope_interleaved": True},
                attention_bias=False,
                num_experts=t.moe_num_experts,
                num_experts_per_tok=t.moe_topk,
                moe_intermediate_size=t.moe_intermediate_size,
                tie_word_embeddings=False,
            ),
            image_token_id=ours_cfg.image_token_id,
            video_token_id=ours_cfg.video_token_id,
            vision_start_token_id=ours_cfg.vision_start_token_id,
            vision_end_token_id=ours_cfg.vision_end_token_id,
            tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        hf_model = Qwen3VLMoeForConditionalGeneration(hf_cfg).eval().float()
        ours_params = P.from_torch_state_dict(hf_model.state_dict(), ours_cfg)
        return hf_model, ours_params, ours_cfg

    def test_config_roundtrip(self):
        from open_o3_video_tpu.models.qwen25vl import tiny_qwen3_moe

        cfg = tiny_qwen3_moe()
        again = Qwen25VLConfig.from_hf_dict(cfg.to_hf_dict())
        assert dataclasses.replace(again, dtype=cfg.dtype) == cfg

    def test_text_only_moe_parity(self, moe_pair):
        hf_model, ours_params, cfg = moe_pair
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

    def test_vision_moe_parity(self, moe_pair):
        hf_model, ours_params, cfg = moe_pair
        rng = np.random.default_rng(1)
        t, h, w = 1, 4, 8
        n_patches = t * h * w
        n_tokens = n_patches // cfg.vision.merge_unit
        pixel_values = rng.normal(0, 1, size=(n_patches, cfg.vision.patch_dim)).astype(np.float32)
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
            ours_params, cfg,
            jnp.asarray(input_ids), jnp.asarray(position_ids),
            pixel_patches=jnp.asarray(pixel_values), grid_thw=grid_thw,
            vision_token_id=cfg.image_token_id,
        )
        np.testing.assert_allclose(
            np.asarray(ours_logits), hf_logits, atol=5e-4, rtol=5e-3
        )

    def test_engine_greedy_matches_hf(self, moe_pair):
        from open_o3_video_tpu.engine import InferenceEngine, Request, SamplingParams

        hf_model, ours_params, cfg = moe_pair
        engine = InferenceEngine(
            ours_params, cfg, prompt_buckets=(32,), cache_dtype=jnp.float32
        )
        rng = np.random.default_rng(2)
        prompt = rng.integers(5, 400, size=11).tolist()
        with torch.no_grad():
            hf_out = hf_model.generate(
                input_ids=torch.tensor([prompt]),
                attention_mask=torch.ones(1, len(prompt), dtype=torch.long),
                max_new_tokens=8,
                do_sample=False,
            )
        out = engine.generate(
            [Request(input_ids=prompt)],
            SamplingParams(temperature=0.0, repetition_penalty=1.0, max_tokens=8),
        )
        assert out[0]["token_ids"] == hf_out[0, len(prompt):].tolist()

    def test_expert_parallel_sharding(self, moe_pair):
        from open_o3_video_tpu.parallel import make_mesh
        from open_o3_video_tpu.parallel.mesh import shard_params

        _, ours_params, cfg = moe_pair
        rng = np.random.default_rng(3)
        input_ids = rng.integers(5, 400, size=(2, 8))
        position_ids, _ = get_rope_index(cfg, input_ids)
        ref_logits, _ = forward(
            ours_params, cfg, jnp.asarray(input_ids), jnp.asarray(position_ids)
        )
        mesh = make_mesh(data=1, fsdp=2, tensor=4)
        sharded = shard_params(ours_params, mesh)
        ep_logits, _ = forward(
            sharded, cfg, jnp.asarray(input_ids), jnp.asarray(position_ids)
        )
        np.testing.assert_allclose(
            np.asarray(ep_logits), np.asarray(ref_logits), atol=1e-4, rtol=1e-4
        )
