"""Prompt-lookup speculative decoding: lossless-equivalence tests.

The spec path (engine.py _segment_spec_impl) must emit BIT-IDENTICAL
tokens and logprobs to the sequential decode loop in exact arithmetic —
acceptance is defined against the same penalty-adjusted argmax — while
changing only the number of forward passes. These tests pin that
equivalence in f32 on CPU across the knobs that interact with it
(repetition penalty, eos, prefix caching, repeated admissions,
max_tokens truncation). On bf16 TPU the block verify can resolve argmax
near-ties differently (different reduction order) — inherent to all
speculative decoders, documented in the engine.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from open_o3_video_tpu.engine import InferenceEngine, Request, SamplingParams
from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, params as P


@pytest.fixture(scope="module")
def cfg_params():
    cfg = Qwen25VLConfig.tiny()
    return cfg, P.init(cfg, seed=0)


def _engines(cfg, params, **kw):
    base = dict(prompt_buckets=(64,), cache_dtype=jnp.float32)
    base.update(kw)
    plain = InferenceEngine(params, cfg, spec_decode=False, **base)
    spec = InferenceEngine(params, cfg, spec_decode=True, spec_draft=4, **base)
    assert spec.spec_decode
    return plain, spec


def _gen(eng, prompts, samp):
    return eng.generate(
        [Request(input_ids=list(p)) for p in prompts], samp
    )


class TestSpecEquivalence:
    def test_greedy_bit_identical(self, cfg_params):
        cfg, params = cfg_params
        plain, spec = _engines(cfg, params)
        samp = SamplingParams(temperature=0.0, repetition_penalty=1.0,
                              max_tokens=24)
        prompt = [5, 6, 7, 8, 9, 10, 11]
        a = _gen(plain, [prompt], samp)[0]
        b = _gen(spec, [prompt], samp)[0]
        assert a["token_ids"] == b["token_ids"]

    def test_repetition_penalty_bit_identical(self, cfg_params):
        """The penalty makes the argmax depend on the seen-set, which the
        spec verify scan must update in exactly the sequential order."""
        cfg, params = cfg_params
        plain, spec = _engines(cfg, params)
        samp = SamplingParams(temperature=0.0, repetition_penalty=1.3,
                              max_tokens=24)
        for prompt in ([3, 4, 5, 6], [40, 41, 42, 43, 44, 45, 46, 47]):
            a = _gen(plain, [prompt], samp)[0]
            b = _gen(spec, [prompt], samp)[0]
            assert a["token_ids"] == b["token_ids"], prompt

    def test_logprobs_match(self, cfg_params):
        cfg, params = cfg_params
        plain, spec = _engines(cfg, params)
        samp = SamplingParams(temperature=0.0, repetition_penalty=1.05,
                              max_tokens=16)
        prompt = [9, 8, 7, 6, 5]
        a = plain.generate([Request(input_ids=list(prompt))], samp,
                           return_logprobs=True)[0]
        b = spec.generate([Request(input_ids=list(prompt))], samp,
                          return_logprobs=True)[0]
        assert a["token_ids"] == b["token_ids"]
        np.testing.assert_allclose(a["logprobs"], b["logprobs"],
                                   rtol=1e-5, atol=1e-5)

    def test_eos_truncation_matches(self, cfg_params):
        """Force an early eos by making the prompt end with tokens whose
        greedy continuation hits eos quickly on SOME seed; equivalence must
        hold regardless of where (or whether) eos lands."""
        cfg, params = cfg_params
        plain, spec = _engines(cfg, params)
        samp = SamplingParams(temperature=0.0, repetition_penalty=1.0,
                              max_tokens=48)
        rng = np.random.default_rng(0)
        for _ in range(3):
            prompt = rng.integers(5, 90, size=6).tolist()
            a = _gen(plain, [prompt], samp)[0]
            b = _gen(spec, [prompt], samp)[0]
            assert a["token_ids"] == b["token_ids"], prompt

    def test_repetitive_prompt_accepts_drafts(self, cfg_params):
        """A prompt with strong bigram structure must still be exact (this
        is the case where drafts actually get accepted)."""
        cfg, params = cfg_params
        plain, spec = _engines(cfg, params)
        samp = SamplingParams(temperature=0.0, repetition_penalty=1.0,
                              max_tokens=32)
        prompt = [10, 11, 12, 13, 10, 11, 12, 13, 10, 11, 12, 13]
        a = _gen(plain, [prompt], samp)[0]
        b = _gen(spec, [prompt], samp)[0]
        assert a["token_ids"] == b["token_ids"]
        # telemetry is consistent: every emission came from a verify pass
        assert 0 < spec.spec_stats["verify_steps"] <= spec.spec_stats["emitted"]

    def test_acceptance_actually_fires(self, cfg_params):
        """Greedy decode of a fixed random net falls into a cycle once the
        repetition state recurs; from then on every continuation is a
        bigram-history match, so the spec path must emit MORE than one
        token per verify forward."""
        cfg, params = cfg_params
        _, spec = _engines(cfg, params)
        samp = SamplingParams(temperature=0.0, repetition_penalty=1.0,
                              max_tokens=64)
        out = _gen(spec, [[7, 7, 7, 7]], samp)[0]["token_ids"]
        # sanity: the stream really does cycle (deterministic for seed 0)
        tail = out[-24:]
        assert any(
            tail[i:i + 4] == tail[i + p:i + p + 4]
            for p in range(1, 12) for i in range(len(tail) - p - 4)
        ), "greedy stream did not cycle; pick a different prompt/seed"
        st = spec.spec_stats
        assert st["emitted"] / max(st["verify_steps"], 1) > 1.2, st

    def test_sequential_admissions_reuse_slot(self, cfg_params):
        """Several single-row requests through one engine call: the spec
        cursor/history must reset per admission."""
        cfg, params = cfg_params
        plain, spec = _engines(cfg, params, max_slots=1)
        samp = SamplingParams(temperature=0.0, repetition_penalty=1.05,
                              max_tokens=12)
        prompts = [[5, 6, 7], [20, 21, 22, 23], [50, 51]]
        a = _gen(plain, prompts, samp)
        b = _gen(spec, prompts, samp)
        for x, y, p in zip(a, b, prompts):
            assert x["token_ids"] == y["token_ids"], p

    def test_tiny_token_budget(self, cfg_params):
        """max_tokens smaller than the draft block: the budget gate must
        truncate emission inside the verify scan exactly like the plain
        path, even while drafts are being accepted (cycling stream)."""
        cfg, params = cfg_params
        plain, spec = _engines(cfg, params)
        for mt in (2, 3, 5):
            samp = SamplingParams(temperature=0.0, repetition_penalty=1.0,
                                  max_tokens=mt)
            a = _gen(plain, [[7, 7, 7, 7]], samp)[0]
            b = _gen(spec, [[7, 7, 7, 7]], samp)[0]
            assert a["token_ids"] == b["token_ids"], mt
            assert len(b["token_ids"]) <= mt

    def test_spec_inactive_for_batches_and_sampling(self, cfg_params):
        """Groups with >1 row or temperature > 0 must take the plain path
        (and still work) even when spec_decode is on."""
        cfg, params = cfg_params
        spec = InferenceEngine(params, cfg, prompt_buckets=(64,),
                               cache_dtype=jnp.float32, spec_decode=True)
        samp = SamplingParams(temperature=0.0, repetition_penalty=1.0,
                              max_tokens=8)
        out = spec.generate(
            [Request(input_ids=[5, 6, 7]), Request(input_ids=[8, 9, 10, 11])],
            samp,
        )
        assert all(len(o["token_ids"]) >= 1 for o in out)
        sampled = SamplingParams(temperature=0.7, repetition_penalty=1.0,
                                 max_tokens=8, seed=3)
        out = spec.generate([Request(input_ids=[5, 6, 7])], sampled)
        assert len(out[0]["token_ids"]) >= 1

    def test_prefix_cached_spec(self, cfg_params):
        """Spec decoding composes with automatic prefix caching (the
        prefix+suffix column layout feeds the drafting history)."""
        cfg, params = cfg_params
        plain = InferenceEngine(params, cfg, prompt_buckets=(64,),
                                cache_dtype=jnp.float32, spec_decode=False,
                                prefix_cache_min=8, suffix_buckets=(16,),
                                max_slots=1)
        spec = InferenceEngine(params, cfg, prompt_buckets=(64,),
                               cache_dtype=jnp.float32, spec_decode=True,
                               spec_draft=4, prefix_cache_min=8,
                               suffix_buckets=(16,), max_slots=1)
        samp = SamplingParams(temperature=0.0, repetition_penalty=1.05,
                              max_tokens=12)
        shared = list(range(30, 46))  # 16-token shared prefix
        prompts = [shared + [60, 61], shared + [70, 71, 72]]
        a = _gen(plain, prompts, samp)
        b = _gen(spec, prompts, samp)
        for x, y, p in zip(a, b, prompts):
            assert x["token_ids"] == y["token_ids"], p
