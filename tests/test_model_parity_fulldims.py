"""FULL-DIMS parity vs HF transformers (torch CPU, float32).

The tiny-model parity suite (test_model_parity.py) cannot see bugs that
only appear at the released 7B checkpoint's geometry: 3584 hidden with
28/4 GQA heads (head_dim 128), mrope_section (16, 24, 24), the 1280-wide
ViT with 112-px windows at production frame resolutions, and the 152064
vocab. This suite instantiates those REAL dims at reduced depth (4 text
layers, 8 vision blocks — depth scales compute, not geometry) and pins:

1. logit-level parity on a frames-as-images vision prompt, and
2. greedy-token agreement over 64 decode steps (cached decode vs HF
   generate) — the strongest checkpoint-free proxy for the reference's
   contract, which is the released 7B model
   (grpo_trainer.py:211-219).
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from open_o3_video_tpu.models.qwen25vl import (
    Qwen25VLConfig,
    forward,
    get_rope_index,
    params as P,
)


def fulldims_config():
    """Qwen2.5-VL-7B geometry, depth-reduced (4 text layers / 8 ViT blocks)."""
    cfg = Qwen25VLConfig()  # the real 7B config
    return dataclasses.replace(
        cfg,
        dtype=jnp.float32,
        vision=dataclasses.replace(
            cfg.vision,
            depth=8,
            # keep one full-attention block inside the reduced depth
            fullatt_block_indexes=(7,),
        ),
        text=dataclasses.replace(cfg.text, num_hidden_layers=4),
    )


@pytest.fixture(scope="module")
def fulldims_pair():
    from transformers.models.qwen2_5_vl import (
        Qwen2_5_VLConfig,
        Qwen2_5_VLForConditionalGeneration,
    )

    cfg = fulldims_config()
    v, t = cfg.vision, cfg.text
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
        image_token_id=cfg.image_token_id,
        video_token_id=cfg.video_token_id,
        vision_start_token_id=cfg.vision_start_token_id,
        vision_end_token_id=cfg.vision_end_token_id,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf_model = Qwen2_5_VLForConditionalGeneration(hf_cfg).eval().float()
    ours_params = P.from_torch_state_dict(hf_model.state_dict(), cfg)
    return hf_model, ours_params, cfg


def _video_prompt(cfg, rng, n_frames=4, hw=(252, 336)):
    """Frames-as-images prompt at a production training resolution:
    252x336 px -> 18x24 patch grid per frame (128*28^2 budget class),
    exercising 28-factor window partitioning at real scale."""
    from open_o3_video_tpu.ops.preprocess import frames_as_images_patches

    frames = rng.integers(0, 255, size=(n_frames, 3) + hw, dtype=np.uint8)
    patches, grid = frames_as_images_patches(
        frames,
        patch_size=cfg.vision.patch_size,
        temporal_patch_size=cfg.vision.temporal_patch_size,
        merge_size=cfg.vision.spatial_merge_size,
    )
    n_tok = patches.shape[0] // cfg.vision.merge_unit
    ids = (
        rng.integers(5, 1000, size=8).tolist()
        + [cfg.vision_start_token_id]
        + [cfg.image_token_id] * n_tok
        + [cfg.vision_end_token_id]
        + rng.integers(5, 1000, size=6).tolist()
    )
    return np.array([ids]), patches.astype(np.float32), grid


@pytest.mark.slow
def test_fulldims_vision_logit_parity(fulldims_pair):
    hf_model, ours_params, cfg = fulldims_pair
    rng = np.random.default_rng(0)
    input_ids, patches, grid = _video_prompt(cfg, rng)

    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.tensor(input_ids),
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor(grid),
        ).logits.numpy()

    position_ids, _ = get_rope_index(cfg, input_ids, image_grid_thw=grid)
    ours_logits, _ = forward(
        ours_params, cfg, jnp.asarray(input_ids), jnp.asarray(position_ids),
        pixel_patches=jnp.asarray(patches), grid_thw=grid,
        vision_token_id=cfg.image_token_id,
    )
    ours = np.asarray(ours_logits)
    assert ours.shape == hf_logits.shape
    # float32 both sides; tolerance covers op-order differences at depth
    np.testing.assert_allclose(ours, hf_logits, atol=2e-3, rtol=2e-3)
    # and the argmax next-token decision agrees everywhere
    np.testing.assert_array_equal(
        ours[0].argmax(-1), hf_logits[0].argmax(-1)
    )


@pytest.mark.slow
def test_fulldims_greedy_agreement_64_steps(fulldims_pair):
    """64-step greedy decode: our cached ring decode vs HF generate."""
    from open_o3_video_tpu.models.qwen25vl.text import init_kv_cache

    hf_model, ours_params, cfg = fulldims_pair
    rng = np.random.default_rng(1)
    prompt = rng.integers(5, 1000, size=(1, 24))
    n_steps = 64

    with torch.no_grad():
        hf_tokens = hf_model.generate(
            input_ids=torch.tensor(prompt),
            max_new_tokens=n_steps,
            do_sample=False,
            eos_token_id=None,  # force the full 64 steps
            pad_token_id=0,
        )[0, prompt.shape[1]:].numpy()

    position_ids, _ = get_rope_index(cfg, prompt)
    T = prompt.shape[1] + n_steps
    cache = init_kv_cache(cfg.text, batch=1, max_len=T, dtype=jnp.float32)
    logits, cache = forward(
        ours_params, cfg, jnp.asarray(prompt), jnp.asarray(position_ids),
        cache=cache, cache_offset=0,
    )
    next_tok = int(np.asarray(logits)[0, -1].argmax())
    next_pos = int(np.asarray(position_ids).max()) + 1
    ours_tokens = [next_tok]
    for step in range(1, n_steps):
        off = prompt.shape[1] + step - 1
        pos = jnp.full((3, 1, 1), next_pos)
        logits, cache = forward(
            ours_params, cfg, jnp.asarray([[next_tok]]), pos,
            cache=cache, cache_offset=off,
        )
        next_tok = int(np.asarray(logits)[0, -1].argmax())
        next_pos += 1
        ours_tokens.append(next_tok)

    agreement = float(np.mean(np.asarray(ours_tokens) == hf_tokens))
    assert agreement == 1.0, (
        f"greedy agreement {agreement:.3f}: ours {ours_tokens[:10]} "
        f"vs hf {hf_tokens[:10].tolist()}"
    )


# ---------------------------------------------------------------------------
# Qwen3-VL at the released 8B geometry (the reference's 2025-11 base,
# README.md:37): 4096 hidden / 32-8 GQA / head_dim 128 / interleaved
# mrope (24,20,20) / 1152-wide ViT with learned-pos-embed interpolation and
# 3 deepstack taps / 151936 vocab — depth-reduced like the flagship test.
# ---------------------------------------------------------------------------


def qwen3_fulldims_config():
    import dataclasses as dc

    from open_o3_video_tpu.models.qwen25vl import tiny_qwen3

    cfg = tiny_qwen3()
    return dc.replace(
        cfg,
        dtype=jnp.float32,
        vision=dc.replace(
            cfg.vision,
            depth=6,
            hidden_size=1152,
            intermediate_size=4304,
            num_heads=16,
            patch_size=16,
            spatial_merge_size=2,
            temporal_patch_size=2,
            out_hidden_size=4096,
            num_position_embeddings=2304,
            deepstack_visual_indexes=(1, 3, 5),  # real: (8,16,24) at depth 27
        ),
        text=dc.replace(
            cfg.text,
            vocab_size=151936,
            hidden_size=4096,
            intermediate_size=12288,
            num_hidden_layers=4,  # real: 36 — size-only reduction
            num_attention_heads=32,
            num_key_value_heads=8,
            explicit_head_dim=128,
            mrope_section=(24, 20, 20),
        ),
    )


@pytest.mark.slow
def test_qwen3_fulldims_vision_logit_parity():
    from transformers.models.qwen3_vl import (
        Qwen3VLConfig,
        Qwen3VLForConditionalGeneration,
    )

    cfg = qwen3_fulldims_config()
    v, t = cfg.vision, cfg.text
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
            rope_scaling={"rope_type": "default",
                          "mrope_section": list(t.mrope_section),
                          "mrope_interleaved": True},
            attention_bias=False,
            tie_word_embeddings=False,
            max_position_embeddings=t.max_position_embeddings,
        ),
        image_token_id=cfg.image_token_id,
        video_token_id=cfg.video_token_id,
        vision_start_token_id=cfg.vision_start_token_id,
        vision_end_token_id=cfg.vision_end_token_id,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf_model = Qwen3VLForConditionalGeneration(hf_cfg).eval().float()
    ours_params = P.from_torch_state_dict(hf_model.state_dict(), cfg)

    rng = np.random.default_rng(2)
    # production-resolution frames at patch 16: 256x320 -> 16x20 grid/frame
    input_ids, patches, grid = _video_prompt(cfg, rng, n_frames=2, hw=(256, 320))

    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.tensor(input_ids),
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor(grid),
        ).logits.numpy()

    position_ids, _ = get_rope_index(cfg, input_ids, image_grid_thw=grid)
    ours_logits, _ = forward(
        ours_params, cfg, jnp.asarray(input_ids), jnp.asarray(position_ids),
        pixel_patches=jnp.asarray(patches), grid_thw=grid,
        vision_token_id=cfg.image_token_id,
    )
    ours = np.asarray(ours_logits)
    assert ours.shape == hf_logits.shape
    np.testing.assert_allclose(ours, hf_logits, atol=2e-3, rtol=2e-3)
    np.testing.assert_array_equal(ours[0].argmax(-1), hf_logits[0].argmax(-1))


@pytest.mark.slow
def test_fulldims_generate_through_eval_harness(fulldims_pair):
    """HF `generate` differential THROUGH THE EVAL HARNESS on REAL video
    pixels (VERDICT r3 item 3b): the request is built by the harness's own
    prompt builder + processor + video ingestion on example_video.mp4
    (model_engine.get_batch_messages -> _requests_from_messages — the same
    call path every benchmark runs), our engine greedy-decodes it, and HF
    Qwen2.5-VL at identical dims/weights consumes the identical
    ids/pixels/grids via `generate`. With this, the only link parity
    evidence cannot touch in this environment is the real checkpoint's
    weights/tokenizer files themselves (PARITY.md)."""
    import os

    from open_o3_video_tpu.engine import SamplingParams
    from open_o3_video_tpu.eval.model_engine import QwenVLEngine

    video = "/root/reference/eval/example_video.mp4"
    if not os.path.exists(video):
        pytest.skip("example video not mounted")

    hf_model, ours_params, cfg = fulldims_pair
    model = QwenVLEngine(
        ours_params, cfg=cfg, temperature=0.0, max_tokens=16,
        video_max_frames=4, video_max_pixels=252 * 336,
        cache_dtype=jnp.float32,
    )
    messages, _, _ = model.get_batch_messages(
        [video], ["What happens in the video?"], [None]
    )
    req = model._requests_from_messages(messages)[0]
    assert req.pixel_patches is not None and len(req.input_ids) > 100

    n_steps = 16
    outs = model.engine.generate(
        [req],
        SamplingParams(temperature=0.0, repetition_penalty=1.0,
                       max_tokens=n_steps),
    )
    ours_tokens = outs[0]["token_ids"]

    with torch.no_grad():
        hf_tokens = hf_model.generate(
            input_ids=torch.tensor([list(req.input_ids)]),
            pixel_values=torch.tensor(np.asarray(req.pixel_patches)),
            image_grid_thw=torch.tensor(np.asarray(req.grid_thw)),
            max_new_tokens=n_steps,
            do_sample=False,
            eos_token_id=None,
            pad_token_id=0,
        )[0, len(req.input_ids):].numpy()

    n = min(len(ours_tokens), n_steps)
    assert n >= 8  # random-init may emit eos; still needs a real run
    assert np.array_equal(np.asarray(ours_tokens[:n]), hf_tokens[:n]), (
        ours_tokens[:10], hf_tokens[:10].tolist()
    )
