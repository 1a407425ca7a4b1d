"""Inference engine tests: greedy parity vs HF generate, sampling behavior."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from open_o3_video_tpu.engine import InferenceEngine, Request, SamplingParams
from open_o3_video_tpu.ops.sampling import apply_repetition_penalty, top_p_filter


@pytest.fixture(scope="module")
def engine_pair():
    from transformers.models.qwen2_5_vl import (
        Qwen2_5_VLConfig,
        Qwen2_5_VLForConditionalGeneration,
    )
    import dataclasses
    from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, params as P

    ours_cfg = Qwen25VLConfig.tiny()
    v, t = ours_cfg.vision, ours_cfg.text
    hf_cfg = Qwen2_5_VLConfig(
        vision_config=dict(
            depth=v.depth, hidden_size=v.hidden_size, intermediate_size=v.intermediate_size,
            num_heads=v.num_heads, patch_size=v.patch_size, spatial_merge_size=v.spatial_merge_size,
            temporal_patch_size=v.temporal_patch_size, window_size=v.window_size,
            fullatt_block_indexes=list(v.fullatt_block_indexes), out_hidden_size=v.out_hidden_size,
            tokens_per_second=v.tokens_per_second,
        ),
        text_config=dict(
            vocab_size=t.vocab_size, hidden_size=t.hidden_size, intermediate_size=t.intermediate_size,
            num_hidden_layers=t.num_hidden_layers, num_attention_heads=t.num_attention_heads,
            num_key_value_heads=t.num_key_value_heads, rms_norm_eps=t.rms_norm_eps,
            rope_theta=t.rope_theta,
            rope_scaling={"type": "mrope", "mrope_section": list(t.mrope_section)},
            tie_word_embeddings=False, max_position_embeddings=t.max_position_embeddings,
        ),
        image_token_id=103, video_token_id=104,
        vision_start_token_id=100, vision_end_token_id=101,
        bos_token_id=0, eos_token_id=1, pad_token_id=2,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf_model = Qwen2_5_VLForConditionalGeneration(hf_cfg).eval().float()
    ours_cfg = dataclasses.replace(
        ours_cfg,
        image_token_id=103, video_token_id=104,
        vision_start_token_id=100, vision_end_token_id=101,
        bos_token_id=0, eos_token_id=1, pad_token_id=2,
        dtype=jnp.float32,
    )
    ours_params = P.from_torch_state_dict(hf_model.state_dict(), ours_cfg)
    engine = InferenceEngine(
        ours_params, ours_cfg, prompt_buckets=(32, 64), cache_dtype=jnp.float32
    )
    return hf_model, engine, ours_cfg


def test_greedy_matches_hf_generate(engine_pair):
    hf_model, engine, cfg = engine_pair
    rng = np.random.default_rng(0)
    prompt = rng.integers(5, 400, size=12).tolist()

    with torch.no_grad():
        hf_out = hf_model.generate(
            input_ids=torch.tensor([prompt]),
            attention_mask=torch.ones(1, len(prompt), dtype=torch.long),
            max_new_tokens=10,
            do_sample=False,
        )
    hf_completion = hf_out[0, len(prompt):].tolist()

    out = engine.generate(
        [Request(input_ids=prompt)],
        SamplingParams(temperature=0.0, repetition_penalty=1.0, max_tokens=10),
    )
    assert out[0]["token_ids"] == hf_completion


def test_greedy_batch_left_padding(engine_pair):
    """Rows of different lengths in one batch must decode as if alone."""
    hf_model, engine, cfg = engine_pair
    rng = np.random.default_rng(1)
    p1 = rng.integers(5, 400, size=14).tolist()
    p2 = rng.integers(5, 400, size=7).tolist()

    solo = [
        engine.generate([Request(input_ids=p)], SamplingParams(temperature=0.0, repetition_penalty=1.0, max_tokens=6))[0]["token_ids"]
        for p in (p1, p2)
    ]
    batched = engine.generate(
        [Request(input_ids=p1), Request(input_ids=p2)],
        SamplingParams(temperature=0.0, repetition_penalty=1.0, max_tokens=6),
    )
    assert batched[0]["token_ids"] == solo[0]
    assert batched[1]["token_ids"] == solo[1]


def test_vision_request_greedy_matches_hf(engine_pair):
    hf_model, engine, cfg = engine_pair
    rng = np.random.default_rng(2)
    grid = np.array([[1, 4, 8]], dtype=np.int64)
    n_tok = 8
    patches = rng.normal(0, 1, (32, cfg.vision.patch_dim)).astype(np.float32)
    prompt = (
        rng.integers(5, 90, size=4).tolist()
        + [cfg.vision_start_token_id] + [cfg.image_token_id] * n_tok + [cfg.vision_end_token_id]
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
    hf_completion = hf_out[0, len(prompt):].tolist()
    out = engine.generate(
        [Request(input_ids=prompt, pixel_patches=patches, grid_thw=grid,
                 vision_token_id=cfg.image_token_id)],
        SamplingParams(temperature=0.0, repetition_penalty=1.0, max_tokens=8),
    )
    assert out[0]["token_ids"] == hf_completion


def test_repetition_penalty_vllm_semantics():
    logits = jnp.array([[2.0, -2.0, 1.0]])
    seen = jnp.array([[True, True, False]])
    out = apply_repetition_penalty(logits, seen, 2.0)
    np.testing.assert_allclose(np.asarray(out), [[1.0, -4.0, 1.0]])


def test_top_p_keeps_nucleus():
    logits = jnp.log(jnp.array([[0.5, 0.3, 0.15, 0.05]]))
    out = np.asarray(top_p_filter(logits, 0.8))
    assert np.isfinite(out[0, 0]) and np.isfinite(out[0, 1])
    # 0.5 + 0.3 = 0.8 >= top_p: nucleus is exactly the first two tokens.
    assert not np.isfinite(out[0, 2])
    assert not np.isfinite(out[0, 3])


def test_logprobs_returned(engine_pair):
    _, engine, cfg = engine_pair
    out = engine.generate(
        [Request(input_ids=[5, 6, 7, 8])],
        SamplingParams(temperature=0.0, repetition_penalty=1.0, max_tokens=4),
        return_logprobs=True,
    )
    assert len(out[0]["logprobs"]) == len(out[0]["token_ids"])
    assert all(lp <= 0 for lp in out[0]["logprobs"])


def test_frames_request_matches_patches_request(engine_pair):
    """uint8-frames upload + device patchify ~= host-patchify path."""
    from open_o3_video_tpu.ops.preprocess import frames_as_images_patches

    _, engine, cfg = engine_pair
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 255, (2, 3, 56, 56), dtype=np.uint8)
    patches, grid = frames_as_images_patches(frames)
    n_tok = patches.shape[0] // 4
    prompt = ([5, 6, cfg.vision_start_token_id] + [cfg.image_token_id] * n_tok
              + [cfg.vision_end_token_id, 7])
    samp = SamplingParams(temperature=0.0, repetition_penalty=1.0, max_tokens=6)
    a = engine.generate([Request(input_ids=prompt, pixel_patches=patches, grid_thw=grid,
                                 vision_token_id=cfg.image_token_id)], samp)
    b = engine.generate([Request(input_ids=prompt, frames=frames, grid_thw=grid,
                                 vision_token_id=cfg.image_token_id)], samp)
    assert a[0]["token_ids"] == b[0]["token_ids"]


def test_prestaged_frames_match_inline_upload(engine_pair):
    """prestage_frames (prefetch-thread upload) must be byte-equivalent to
    passing raw frames: same patchify program, just issued earlier."""
    _, engine, cfg = engine_pair
    from open_o3_video_tpu.ops.preprocess import frames_as_images_patches

    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 255, (2, 3, 56, 56), dtype=np.uint8)
              for _ in range(3)]
    # heterogeneous shape exercises the single-item path too
    frames.append(rng.integers(0, 255, (2, 3, 28, 28), dtype=np.uint8))
    grids = [frames_as_images_patches(f)[1] for f in frames]
    prompts = []
    for g in grids:
        n_tok = int(np.prod(g, axis=1).sum()) // 4
        prompts.append([5, 6, cfg.vision_start_token_id]
                       + [cfg.image_token_id] * n_tok
                       + [cfg.vision_end_token_id, 7])
    samp = SamplingParams(temperature=0.0, repetition_penalty=1.0, max_tokens=6)
    a = engine.generate(
        [Request(input_ids=p, frames=f, grid_thw=g,
                 vision_token_id=cfg.image_token_id)
         for p, f, g in zip(prompts, frames, grids)], samp)
    bufs = engine.prestage_frames(frames)
    assert all(isinstance(b, jax.Array) for b in bufs)
    b = engine.generate(
        [Request(input_ids=p, pixel_patches=buf, grid_thw=g,
                 vision_token_id=cfg.image_token_id)
         for p, buf, g in zip(prompts, bufs, grids)], samp)
    for x, y in zip(a, b):
        assert x["token_ids"] == y["token_ids"]
