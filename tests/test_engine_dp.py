"""DP fleet mode: slot rows sharded over the mesh `data` axis.

The TPU-native replacement for the reference's process-per-GPU eval fleet
(test_vstar_multi_images.py:621-693): ONE engine whose decode-slot rows are
sharded over `data` (each chip decodes its own rows), composing with
fsdp/tensor param sharding in the same programs. Wave-scheduled admissions
keep every program's row count static.

Pinned against the plain single-device engine on identical requests.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from open_o3_video_tpu.engine import InferenceEngine, Request, SamplingParams
from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig
from open_o3_video_tpu.models.qwen25vl import params as P
from open_o3_video_tpu.ops.preprocess import frames_as_images_patches
from open_o3_video_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def setup():
    cfg = Qwen25VLConfig.tiny(dtype=jnp.float32)
    params = P.init(cfg, seed=0)
    ref = InferenceEngine(params, cfg, prompt_buckets=(64,), cache_dtype=jnp.float32)
    mesh = make_mesh(data=4, fsdp=2, tensor=1)
    dp = InferenceEngine(
        params, cfg, mesh=mesh, batch_axis="data", max_slots=4,
        prompt_buckets=(64,), cache_dtype=jnp.float32,
    )
    return cfg, params, ref, dp


def _text_requests(n, base=40):
    return [
        Request(input_ids=list(range(base + 3 * i, base + 3 * i + 12)))
        for i in range(n)
    ]


def test_dp_matches_single_device_text(setup):
    """10 requests through 4 row-sharded slots (3 waves, padded last)."""
    cfg, params, ref, dp = setup
    sampling = SamplingParams(temperature=0.0, max_tokens=8)
    reqs = _text_requests(10)
    out_ref = ref.generate(reqs, sampling, return_logprobs=True)
    out_dp = dp.generate(reqs, sampling, return_logprobs=True)
    for a, b in zip(out_ref, out_dp):
        assert a["token_ids"] == b["token_ids"]
        np.testing.assert_allclose(a["logprobs"], b["logprobs"], atol=1e-4)


def test_dp_matches_single_device_vision(setup):
    """Mixed text + vision wave matches the plain engine."""
    cfg, params, ref, dp = setup
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(2, 3, 28, 56), dtype=np.uint8)
    patches, grid = frames_as_images_patches(frames)
    n_tok = patches.shape[0] // cfg.vision.merge_unit
    vis_ids = (
        [7, 8, cfg.vision_start_token_id]
        + [cfg.image_token_id] * n_tok
        + [cfg.vision_end_token_id, 9]
    )
    reqs = [
        Request(input_ids=vis_ids, pixel_patches=patches, grid_thw=grid,
                vision_token_id=cfg.image_token_id),
        Request(input_ids=list(range(50, 64))),
        Request(input_ids=vis_ids, pixel_patches=patches, grid_thw=grid,
                vision_token_id=cfg.image_token_id),
    ]
    sampling = SamplingParams(temperature=0.0, max_tokens=6)
    out_ref = ref.generate(reqs, sampling)
    out_dp = dp.generate(reqs, sampling)
    for a, b in zip(out_ref, out_dp):
        assert a["token_ids"] == b["token_ids"]


def test_dp_arena_persists_across_calls(setup):
    cfg, params, ref, dp = setup
    sampling = SamplingParams(temperature=0.0, max_tokens=4)
    reqs = _text_requests(4, base=90)
    first = dp.generate(reqs, sampling)
    again = dp.generate(reqs, sampling)
    for a, b in zip(first, again):
        assert a["token_ids"] == b["token_ids"]


def test_qwenvl_engine_dp_wrapper(setup):
    """The eval wrapper exposes the fleet mode (cli --mesh_data)."""
    cfg, params, ref, dp = setup
    from open_o3_video_tpu.eval.model_engine import QwenVLEngine

    mesh = make_mesh(data=4, fsdp=2, tensor=1)
    eng = QwenVLEngine(
        params, cfg=cfg, mesh=mesh, batch_axis="data", max_slots=4,
        temperature=0.0, max_tokens=6,
    )
    outs = eng.inference_wo_process_batch(
        [{"prompt": "What is shown?"}, {"prompt": "Describe the scene."}]
    )
    assert len(outs) == 2 and all(isinstance(o, str) for o in outs)


def test_dp_requires_mesh_and_divisible_slots():
    cfg = Qwen25VLConfig.tiny(dtype=jnp.float32)
    params = P.init(cfg, seed=0)
    with pytest.raises(AssertionError):
        InferenceEngine(params, cfg, batch_axis="data")
    mesh = make_mesh(data=4, fsdp=2, tensor=1)
    with pytest.raises(AssertionError):
        InferenceEngine(params, cfg, mesh=mesh, batch_axis="data", max_slots=6)


def test_dp_qwen3_deepstack_matches_plain():
    """Deepstack tables route through the row-sharded full-wave admission."""
    from open_o3_video_tpu.models.qwen25vl import tiny_qwen3

    cfg = tiny_qwen3()
    params = P.init(cfg, seed=0)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(2, 3, 28, 56), dtype=np.uint8)
    patches, grid = frames_as_images_patches(frames)
    n_tok = patches.shape[0] // cfg.vision.merge_unit
    vis_ids = (
        [7, 8, cfg.vision_start_token_id]
        + [cfg.image_token_id] * n_tok
        + [cfg.vision_end_token_id, 9]
    )
    reqs = [
        Request(input_ids=vis_ids, pixel_patches=patches, grid_thw=grid,
                vision_token_id=cfg.image_token_id),
        Request(input_ids=list(range(40, 54))),
        Request(input_ids=vis_ids, pixel_patches=patches, grid_thw=grid,
                vision_token_id=cfg.image_token_id),
    ]
    sampling = SamplingParams(temperature=0.0, max_tokens=6)
    plain = InferenceEngine(params, cfg, prompt_buckets=(64,), cache_dtype=jnp.float32)
    out_p = plain.generate(reqs, sampling)
    mesh = make_mesh(data=4, fsdp=2, tensor=1)
    dp = InferenceEngine(params, cfg, mesh=mesh, batch_axis="data", max_slots=4,
                         prompt_buckets=(64,), cache_dtype=jnp.float32)
    out_d = dp.generate(reqs, sampling)
    for a, b in zip(out_p, out_d):
        assert a["token_ids"] == b["token_ids"]


def test_dp_with_prefix_caching_matches_plain():
    """DP fleet + automatic prefix caching: wave admission gathers each
    row's prefix KV from the replicated block table; padding rows run
    prefix-less. Pinned against the plain single-device engine."""
    cfg = Qwen25VLConfig.tiny(dtype=jnp.float32)
    params = P.init(cfg, seed=0)
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 255, size=(2, 3, 28, 56), dtype=np.uint8)
    patches, grid = frames_as_images_patches(frames)
    n_tok = patches.shape[0] // cfg.vision.merge_unit
    shared_vis = (
        [7, 8, cfg.vision_start_token_id]
        + [cfg.image_token_id] * n_tok
        + [cfg.vision_end_token_id]
    )
    # Two families: a vision item with 5 queries + a text family with 3,
    # plus one lone request -> 9 requests over 4 slots = 3 waves (padded).
    reqs = [
        Request(input_ids=shared_vis + [20 + q, 30 + q, 40 + q],
                pixel_patches=patches, grid_thw=grid,
                vision_token_id=cfg.image_token_id)
        for q in range(5)
    ]
    shared_txt = [(3 + 5 * i) % 90 for i in range(30)]
    reqs += [Request(input_ids=shared_txt + [60 + q, 61 + q]) for q in range(3)]
    reqs += [Request(input_ids=list(range(40, 52)))]
    sampling = SamplingParams(temperature=0.0, max_tokens=6)

    plain = InferenceEngine(
        params, cfg, prompt_buckets=(64,), cache_dtype=jnp.float32,
        prefix_cache_min=8, suffix_buckets=(16,),
    )
    out_p = plain.generate(reqs, sampling)

    mesh = make_mesh(data=4, fsdp=2, tensor=1)
    dp = InferenceEngine(
        params, cfg, mesh=mesh, batch_axis="data", max_slots=4,
        prompt_buckets=(64,), cache_dtype=jnp.float32,
        prefix_cache_min=8, suffix_buckets=(16,),
    )
    out_d = dp.generate(reqs, sampling)
    assert len(dp._prefix_kv) == 2  # one block per family
    for a, b in zip(out_p, out_d):
        assert a["token_ids"] == b["token_ids"]

    # Cross-call reuse (chained eval stages) in DP mode too.
    again = dp.generate(reqs[:5], sampling)
    assert len(dp._prefix_kv) == 2
    for a, b in zip(out_p[:5], again):
        assert a["token_ids"] == b["token_ids"]


def test_dp_long_context_chunked_prefill(setup):
    """DP fleet + memory-driven chunked prefill: prompts above
    long_prefill_threshold chunk straight into the row-sharded arena
    (engine.py admission path), matching the plain engine's outputs.
    Before round 3 this combination was an init-time exclusion."""
    cfg, params, _, _ = setup
    sampling = SamplingParams(temperature=0.0, max_tokens=6)
    reqs = [
        Request(input_ids=[(7 + 5 * i + j) % 97 + 3 for j in range(100 + i)])
        for i in range(6)
    ]
    plain = InferenceEngine(
        params, cfg, prompt_buckets=(128,), cache_dtype=jnp.float32,
        long_prefill_threshold=128, long_prefill_chunk=32,
    )
    out_p = plain.generate(reqs, sampling)

    mesh = make_mesh(data=4, fsdp=2, tensor=1)
    dp = InferenceEngine(
        params, cfg, mesh=mesh, batch_axis="data", max_slots=4,
        prompt_buckets=(128,), cache_dtype=jnp.float32,
        long_prefill_threshold=128, long_prefill_chunk=32,
    )
    out_d = dp.generate(reqs, sampling)
    for a, b in zip(out_p, out_d):
        assert a["token_ids"] == b["token_ids"]


def test_dp_explicit_prefill_chunk_allowed(setup):
    """An explicit prefill_chunk no longer asserts in DP fleet mode; the
    full-wave admission runs it chunked into the arena."""
    cfg, params, ref, _ = setup
    sampling = SamplingParams(temperature=0.0, max_tokens=5)
    reqs = _text_requests(8)
    mesh = make_mesh(data=4, fsdp=2, tensor=1)
    dp = InferenceEngine(
        params, cfg, mesh=mesh, batch_axis="data", max_slots=4,
        prompt_buckets=(64,), cache_dtype=jnp.float32, prefill_chunk=32,
    )
    out_d = dp.generate(reqs, sampling)
    out_r = ref.generate(reqs, sampling)
    for a, b in zip(out_r, out_d):
        assert a["token_ids"] == b["token_ids"]
