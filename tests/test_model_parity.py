"""Logit-level parity tests: our JAX Qwen2.5-VL vs HF transformers (torch CPU).

A tiny random-weight HF model is instantiated, its state dict imported into
our param tree, and both run on identical inputs. This validates the entire
stack: patch embed, window partition, 2D vision RoPE, segment attention,
merger, M-RoPE, GQA decoder, vision-token scatter, and get_rope_index.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from open_o3_video_tpu.models.qwen25vl import (
    Qwen25VLConfig,
    forward,
    get_rope_index,
    params as P,
)

import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_pair():
    from transformers.models.qwen2_5_vl import (
        Qwen2_5_VLConfig,
        Qwen2_5_VLForConditionalGeneration,
    )

    ours_cfg = Qwen25VLConfig.tiny()
    v, t = ours_cfg.vision, ours_cfg.text
    hf_cfg = Qwen2_5_VLConfig(
        vision_config=dict(
            depth=v.depth,
            hidden_size=v.hidden_size,
            intermediate_size=v.intermediate_size,
            num_heads=v.num_heads,
            patch_size=v.patch_size,
            spatial_merge_size=v.spatial_merge_size,
            temporal_patch_size=v.temporal_patch_size,
            window_size=v.window_size,
            fullatt_block_indexes=list(v.fullatt_block_indexes),
            out_hidden_size=v.out_hidden_size,
            tokens_per_second=v.tokens_per_second,
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
        image_token_id=ours_cfg.image_token_id % t.vocab_size,
        video_token_id=ours_cfg.video_token_id % t.vocab_size,
        vision_start_token_id=ours_cfg.vision_start_token_id % t.vocab_size,
        vision_end_token_id=ours_cfg.vision_end_token_id % t.vocab_size,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf_model = Qwen2_5_VLForConditionalGeneration(hf_cfg).eval().float()

    import dataclasses

    ours_cfg = dataclasses.replace(
        ours_cfg,
        image_token_id=hf_cfg.image_token_id,
        video_token_id=hf_cfg.video_token_id,
        vision_start_token_id=hf_cfg.vision_start_token_id,
        vision_end_token_id=hf_cfg.vision_end_token_id,
    )
    ours_params = P.from_torch_state_dict(hf_model.state_dict(), ours_cfg)
    return hf_model, ours_params, ours_cfg


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
    ours = np.asarray(ours_logits)
    assert ours.shape == hf_logits.shape
    np.testing.assert_allclose(ours, hf_logits, atol=2e-4, rtol=2e-3)


@pytest.mark.parametrize("grid", [(1, 4, 8), (1, 8, 8), (2, 6, 10)])
def test_vision_text_parity(tiny_pair, grid):
    hf_model, ours_params, cfg = tiny_pair
    rng = np.random.default_rng(1)
    t, h, w = grid
    n_patches = t * h * w
    n_tokens = n_patches // 4
    patch_dim = cfg.vision.patch_dim
    pixel_values = rng.normal(0, 1, size=(n_patches, patch_dim)).astype(np.float32)
    grid_thw = np.array([[t, h, w]], dtype=np.int64)

    prefix = rng.integers(0, 400, size=5).tolist()
    suffix = rng.integers(0, 400, size=4).tolist()
    ids = (
        prefix
        + [cfg.vision_start_token_id]
        + [cfg.image_token_id] * n_tokens
        + [cfg.vision_end_token_id]
        + suffix
    )
    input_ids = np.array([ids])

    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.tensor(input_ids),
            pixel_values=torch.tensor(pixel_values),
            image_grid_thw=torch.tensor(grid_thw),
        ).logits.numpy()

    position_ids, deltas = get_rope_index(cfg, input_ids, image_grid_thw=grid_thw)
    ours_logits, _ = forward(
        ours_params,
        cfg,
        jnp.asarray(input_ids),
        jnp.asarray(position_ids),
        pixel_patches=jnp.asarray(pixel_values),
        grid_thw=grid_thw,
        vision_token_id=cfg.image_token_id,
    )
    ours = np.asarray(ours_logits)
    np.testing.assert_allclose(ours, hf_logits, atol=5e-4, rtol=5e-3)


def test_rope_index_parity(tiny_pair):
    hf_model, _, cfg = tiny_pair
    rng = np.random.default_rng(2)
    grid_thw = np.array([[1, 4, 8], [2, 6, 4]], dtype=np.int64)
    n1, n2 = 8, 12
    # Text tokens drawn below 100 so they cannot collide with the modulo'd
    # special token ids (>= 100 in the tiny vocab); real vocabs guarantee this.
    ids = (
        rng.integers(0, 100, size=3).tolist()
        + [cfg.vision_start_token_id] + [cfg.image_token_id] * n1 + [cfg.vision_end_token_id]
        + rng.integers(0, 100, size=2).tolist()
        + [cfg.vision_start_token_id] + [cfg.video_token_id] * n2 + [cfg.vision_end_token_id]
        + rng.integers(0, 100, size=4).tolist()
    )
    input_ids = np.array([ids])
    attention_mask = np.ones_like(input_ids)

    hf_pos, hf_deltas = hf_model.model.get_rope_index(
        torch.tensor(input_ids),
        image_grid_thw=torch.tensor(grid_thw[:1]),
        video_grid_thw=torch.tensor(grid_thw[1:]),
        second_per_grid_ts=torch.tensor([0.5]),
        attention_mask=torch.tensor(attention_mask),
    )
    ours_pos, ours_deltas = get_rope_index(
        cfg,
        input_ids,
        image_grid_thw=grid_thw[:1],
        video_grid_thw=grid_thw[1:],
        second_per_grid_ts=[0.5],
        attention_mask=attention_mask,
    )
    np.testing.assert_array_equal(ours_pos, hf_pos.numpy())
    np.testing.assert_array_equal(ours_deltas, hf_deltas.numpy())


def test_left_padded_batch_parity(tiny_pair):
    hf_model, ours_params, cfg = tiny_pair
    rng = np.random.default_rng(3)
    pad = 151643 % cfg.text.vocab_size
    row1 = rng.integers(0, 400, size=10)
    row2 = np.concatenate([[pad] * 4, rng.integers(0, 400, size=6)])
    input_ids = np.stack([row1, row2])
    attention_mask = np.stack([np.ones(10, np.int64), np.array([0] * 4 + [1] * 6)])

    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(attention_mask),
        ).logits.numpy()

    position_ids, _ = get_rope_index(cfg, input_ids, attention_mask=attention_mask)
    seq_pos = np.cumsum(attention_mask, axis=-1) - 1
    seq_pos[attention_mask == 0] = 0
    ours_logits, _ = forward(
        ours_params,
        cfg,
        jnp.asarray(input_ids),
        jnp.asarray(position_ids),
        attn_valid=jnp.asarray(attention_mask, bool),
        seq_positions=jnp.asarray(seq_pos),
    )
    ours = np.asarray(ours_logits)
    # Compare only valid positions.
    valid = attention_mask.astype(bool)
    np.testing.assert_allclose(ours[valid], hf_logits[valid], atol=5e-4, rtol=5e-3)


def test_kv_cache_decode_matches_full_forward(tiny_pair):
    """Prefill + per-token cached decode must reproduce the full forward."""
    from open_o3_video_tpu.models.qwen25vl.text import init_kv_cache

    _, ours_params, cfg = tiny_pair
    rng = np.random.default_rng(4)
    ids = rng.integers(0, 400, size=(1, 10))
    position_ids, _ = get_rope_index(cfg, ids)

    full_logits, _ = forward(ours_params, cfg, jnp.asarray(ids), jnp.asarray(position_ids))
    full = np.asarray(full_logits)

    prefill_len = 6
    cache = init_kv_cache(cfg.text, batch=1, max_len=16, dtype=jnp.float32)
    logits, cache = forward(
        ours_params, cfg,
        jnp.asarray(ids[:, :prefill_len]),
        jnp.asarray(position_ids[:, :, :prefill_len]),
        cache=cache, cache_offset=0,
    )
    np.testing.assert_allclose(np.asarray(logits), full[:, :prefill_len], atol=1e-5)

    for step in range(prefill_len, ids.shape[1]):
        logits, cache = forward(
            ours_params, cfg,
            jnp.asarray(ids[:, step : step + 1]),
            jnp.asarray(position_ids[:, :, step : step + 1]),
            cache=cache, cache_offset=step,
        )
        np.testing.assert_allclose(
            np.asarray(logits)[:, 0], full[:, step], atol=1e-5,
            err_msg=f"decode step {step} diverged from full forward",
        )
