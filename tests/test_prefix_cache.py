"""Automatic prefix caching: vLLM enable_prefix_caching semantics.

Requests sharing identical vision arrays and a long common token prefix
(V-STAR's 5 queries over one video, the G rollout copies of one RL prompt,
N TTS paths) prefill the shared prefix once into a cached KV block and admit
only their suffixes. Pinned for exact token equality against the plain
engine on identical requests.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from open_o3_video_tpu.engine import InferenceEngine, Request, SamplingParams
from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig
from open_o3_video_tpu.models.qwen25vl import params as P
from open_o3_video_tpu.ops.preprocess import frames_as_images_patches


@pytest.fixture(scope="module")
def setup():
    cfg = Qwen25VLConfig.tiny(dtype=jnp.float32)
    params = P.init(cfg, seed=0)
    plain = InferenceEngine(
        params, cfg, prompt_buckets=(64, 128), cache_dtype=jnp.float32,
        prefix_cache_min=0,  # disabled -> always the full-prompt path
    )
    cached = InferenceEngine(
        params, cfg, prompt_buckets=(64, 128), cache_dtype=jnp.float32,
        prefix_cache_min=8, suffix_buckets=(16, 32),
    )
    return cfg, params, plain, cached


def _family(base, k=5, prefix=30, tails=(3, 5, 7, 9, 11)):
    """k requests sharing a `prefix`-token prefix with distinct tails."""
    shared = [(base + 7 * i) % 90 for i in range(prefix)]
    return [
        Request(input_ids=shared + [(t + j) % 90 for j in range(t)])
        for t in tails[:k]
    ]


def test_shared_prefix_matches_plain_text(setup):
    cfg, params, plain, cached = setup
    sampling = SamplingParams(temperature=0.0, max_tokens=8)
    reqs = _family(13)
    out_p = plain.generate(reqs, sampling, return_logprobs=True)
    out_c = cached.generate(reqs, sampling, return_logprobs=True)
    assert len(cached._prefix_kv) == 1  # one shared-prefix KV block built
    for a, b in zip(out_p, out_c):
        assert a["token_ids"] == b["token_ids"]
        np.testing.assert_allclose(a["logprobs"], b["logprobs"], atol=2e-4)


def test_identical_prompts_share_all_but_last(setup):
    """The G rollout copies of one prompt: prefix = len - 1."""
    cfg, params, plain, cached = setup
    sampling = SamplingParams(temperature=0.0, max_tokens=6)
    ids = [(11 + 3 * i) % 90 for i in range(40)]
    reqs = [Request(input_ids=list(ids)) for _ in range(4)]
    out_p = plain.generate(reqs, sampling)
    out_c = cached.generate(reqs, sampling)
    for a, b in zip(out_p, out_c):
        assert a["token_ids"] == b["token_ids"]
    assert out_c[0]["token_ids"] == out_c[3]["token_ids"]


def test_vision_prefix_five_queries(setup):
    """V-STAR shape: 5 queries over one video, questions differ."""
    cfg, params, plain, cached = setup
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(2, 3, 28, 56), dtype=np.uint8)
    patches, grid = frames_as_images_patches(frames)
    n_tok = patches.shape[0] // cfg.vision.merge_unit
    shared = (
        [7, 8, cfg.vision_start_token_id]
        + [cfg.image_token_id] * n_tok
        + [cfg.vision_end_token_id]
    )
    reqs = [
        Request(
            input_ids=shared + [20 + q, 30 + q, 40 + q],
            pixel_patches=patches,
            grid_thw=grid,
            vision_token_id=cfg.image_token_id,
        )
        for q in range(5)
    ]
    sampling = SamplingParams(temperature=0.0, max_tokens=6)
    out_p = plain.generate(reqs, sampling)
    cached.clear_prefix_cache()
    out_c = cached.generate(reqs, sampling)
    assert len(cached._prefix_kv) == 1
    for a, b in zip(out_p, out_c):
        assert a["token_ids"] == b["token_ids"]


def test_prefix_kv_reused_across_calls(setup):
    """Chained eval stages (V-STAR chain 2) hit the cached block."""
    cfg, params, plain, cached = setup
    sampling = SamplingParams(temperature=0.0, max_tokens=4)
    cached.clear_prefix_cache()
    reqs = _family(29)
    cached.generate(reqs, sampling)
    key0 = next(iter(cached._prefix_kv))
    out2 = cached.generate(_family(29, tails=(4, 6)), sampling)
    # Same prefix tokens -> same cache entry, no second block
    assert list(cached._prefix_kv) == [key0]
    out_p = plain.generate(_family(29, tails=(4, 6)), sampling)
    for a, b in zip(out_p, out2):
        assert a["token_ids"] == b["token_ids"]


def test_vision_in_suffix_falls_back(setup):
    """Placeholders outside the common prefix -> plain path (prefix_len 0)."""
    cfg, params, plain, cached = setup
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, size=(2, 3, 28, 28), dtype=np.uint8)
    patches, grid = frames_as_images_patches(frames)
    n_tok = patches.shape[0] // cfg.vision.merge_unit
    # Shared text head, but the vision block sits in the DIVERGENT tail.
    reqs = [
        Request(
            input_ids=[(5 + i) % 90 for i in range(12)]
            + [60 + q, cfg.vision_start_token_id]
            + [cfg.image_token_id] * n_tok
            + [cfg.vision_end_token_id],
            pixel_patches=patches,
            grid_thw=grid,
            vision_token_id=cfg.image_token_id,
        )
        for q in range(2)
    ]
    assert cached._detect_prefixes(reqs) == [0, 0]
    sampling = SamplingParams(temperature=0.0, max_tokens=4)
    out_p = plain.generate(reqs, sampling)
    out_c = cached.generate(reqs, sampling)
    for a, b in zip(out_p, out_c):
        assert a["token_ids"] == b["token_ids"]


def test_prefix_cache_lru_bound():
    cfg = Qwen25VLConfig.tiny(dtype=jnp.float32)
    params = P.init(cfg, seed=0)
    eng = InferenceEngine(
        params, cfg, prompt_buckets=(64,), cache_dtype=jnp.float32,
        prefix_cache_min=8, suffix_buckets=(16,), prefix_cache_entries=2,
    )
    sampling = SamplingParams(temperature=0.0, max_tokens=2)
    for base in (3, 17, 41):
        eng.generate(_family(base, k=2, prefix=20, tails=(3, 5)), sampling)
    assert len(eng._prefix_kv) == 2  # LRU evicted the oldest block


def test_mixed_prefix_and_plain_requests(setup):
    """One generate() call mixing a prefix family with unrelated requests."""
    cfg, params, plain, cached = setup
    sampling = SamplingParams(temperature=0.0, max_tokens=5)
    fam = _family(23, k=3, tails=(3, 6, 9))
    lone = [Request(input_ids=[88, 3, 44, 17, 9, 60, 21])]
    reqs = fam + lone
    # The unrelated request must not defeat detection for the family.
    assert cached._detect_prefixes(reqs) == [30, 30, 30, 0]
    out_p = plain.generate(reqs, sampling)
    out_c = cached.generate(reqs, sampling)
    for a, b in zip(out_p, out_c):
        assert a["token_ids"] == b["token_ids"]


def test_two_text_families_one_batch(setup):
    """GSPO shape: G copies each of two different prompts in one batch —
    each family shares its own prefix block."""
    cfg, params, plain, cached = setup
    sampling = SamplingParams(temperature=0.0, max_tokens=4)
    a = [(2 + 5 * i) % 90 for i in range(35)]
    b = [(4 + 11 * i) % 90 for i in range(42)]
    reqs = [Request(input_ids=list(a)) for _ in range(3)] + [
        Request(input_ids=list(b)) for _ in range(3)
    ]
    pls = cached._detect_prefixes(reqs)
    assert pls == [34, 34, 34, 41, 41, 41]
    out_p = plain.generate(reqs, sampling)
    out_c = cached.generate(reqs, sampling)
    for x, y in zip(out_p, out_c):
        assert x["token_ids"] == y["token_ids"]


def test_identical_prompts_sample_independently(setup):
    """GSPO rollout contract: G identical prompts through the shared-prefix
    path must still draw independent samples per row."""
    cfg, params, plain, cached = setup
    ids = [(3 + 7 * i) % 90 for i in range(40)]
    outs = cached.generate(
        [Request(input_ids=list(ids)) for _ in range(4)],
        SamplingParams(temperature=1.0, top_p=1.0, repetition_penalty=1.0,
                       max_tokens=8, seed=0),
    )
    assert len({tuple(o["token_ids"]) for o in outs}) > 1


def test_outlier_member_does_not_disable_family(setup):
    """One member whose suffix exceeds the largest suffix bucket runs plain
    — WITHOUT defeating prefix sharing for its conforming siblings."""
    cfg, params, plain, cached = setup
    # tails: 3, 5, 40 tokens; suffix_buckets max is 32 -> third is an outlier
    reqs = _family(19, k=3, tails=(3, 5, 40))
    pls = cached._detect_prefixes(reqs)
    assert pls == [30, 30, 0]
    sampling = SamplingParams(temperature=0.0, max_tokens=4)
    out_p = plain.generate(reqs, sampling)
    out_c = cached.generate(reqs, sampling)
    for a, b in zip(out_p, out_c):
        assert a["token_ids"] == b["token_ids"]


def test_params_swap_invalidates_prefix_cache(setup):
    """GSPO updates engine.params every optimizer step; a cached prefix KV
    block computed under the old weights must NOT serve the new policy's
    rollouts (it would silently bias the importance ratios)."""
    cfg, params, plain, cached = setup
    sampling = SamplingParams(temperature=0.0, max_tokens=4)
    cached.clear_prefix_cache()
    cached.generate(_family(31), sampling)
    assert len(cached._prefix_kv) == 1
    # Simulate an optimizer step: swap in perturbed weights.
    import jax

    new_params = jax.tree_util.tree_map(
        lambda x: x * 1.01 if hasattr(x, "dtype") and jnp.issubdtype(
            jnp.asarray(x).dtype, jnp.floating) else x,
        params,
    )
    cached.params = new_params
    assert len(cached._prefix_kv) == 0  # stale blocks dropped
    # And the fresh-params engine agrees with a plain engine on new params.
    fresh_plain = InferenceEngine(
        new_params, cfg, prompt_buckets=(64, 128), cache_dtype=jnp.float32,
        prefix_cache_min=0,
    )
    out_c = cached.generate(_family(31), sampling)
    out_p = fresh_plain.generate(_family(31), sampling)
    for a, b in zip(out_p, out_c):
        assert a["token_ids"] == b["token_ids"]
    assert len(cached._prefix_kv) == 1  # re-prefilled under new weights
    # Reassigning the SAME tree must not thrash the cache.
    cached.params = cached.params
    assert len(cached._prefix_kv) == 1
    cached.params = params  # restore for sibling tests


def test_equal_content_recomputed_frames_share_prefix(setup):
    """Prefix clustering keys on CONTENT: the same video decoded twice
    (distinct array objects, equal bytes) still shares one prefix KV block
    — e.g. V-STAR chain stages that re-decode between generate() calls."""
    from open_o3_video_tpu.ops.preprocess import frames_as_images_patches

    cfg, params, plain, cached = setup
    rng = np.random.default_rng(5)
    base = rng.integers(0, 255, size=(2, 3, 28, 56), dtype=np.uint8)
    patches_a, grid = frames_as_images_patches(base.copy())
    patches_b, _ = frames_as_images_patches(base.copy())
    assert patches_a is not patches_b
    n_tok = patches_a.shape[0] // cfg.vision.merge_unit
    shared = (
        [7, 8, cfg.vision_start_token_id]
        + [cfg.image_token_id] * n_tok
        + [cfg.vision_end_token_id]
    )
    reqs = [
        Request(input_ids=shared + [20 + q, 30 + q, 40 + q],
                pixel_patches=p, grid_thw=grid,
                vision_token_id=cfg.image_token_id)
        for q, p in ((0, patches_a), (1, patches_b))
    ]
    pls = cached._detect_prefixes(reqs)
    assert pls[0] == pls[1] > 0  # clustered despite distinct objects
    cached.clear_prefix_cache()
    sampling = SamplingParams(temperature=0.0, max_tokens=4)
    out_c = cached.generate(reqs, sampling)
    assert len(cached._prefix_kv) == 1  # ONE block for both
    out_p = plain.generate(reqs, sampling)
    for a, b in zip(out_p, out_c):
        assert a["token_ids"] == b["token_ids"]


def test_vis_digest_memo_does_not_pin_arrays(setup):
    """The digest memo must hold only weak refs: a strong ref would pin up
    to 64 ~20 MB frame arrays (or device embeds in HBM) for the engine's
    lifetime, immune to release_memory()."""
    import gc

    _, _, _, cached = setup
    a = np.random.default_rng(0).random((4, 64), np.float32)
    d1 = cached._vis_digest(a)
    assert cached._vis_digest(a) == d1  # memo hit while alive
    key = id(a)
    assert cached._vis_digests[key][1]() is a
    del a
    gc.collect()
    assert cached._vis_digests[key][1]() is None  # referent freed
    # Equal content re-hashes to the same digest even via a fresh object.
    b = np.random.default_rng(0).random((4, 64), np.float32)
    assert cached._vis_digest(b) == d1


def test_spec_draft_constructor_arg_beats_env(setup, monkeypatch):
    """An explicit spec_draft must not be silently overridden by a stray
    O3V_SPEC_DRAFT left in the environment (it changes arena sizing)."""
    cfg, params, _, _ = setup
    monkeypatch.setenv("O3V_SPEC_DRAFT", "15")
    eng = InferenceEngine(
        params, cfg, prompt_buckets=(64,), cache_dtype=jnp.float32,
        spec_decode=True, spec_draft=3,
    )
    assert eng.spec_draft == 3
    eng2 = InferenceEngine(
        params, cfg, prompt_buckets=(64,), cache_dtype=jnp.float32,
        spec_decode=True,
    )
    assert eng2.spec_draft == 15  # env applies only when unspecified
