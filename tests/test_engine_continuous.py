"""Continuous-batching engine tests: queueing past max_slots, refill
correctness, arena persistence, mixed buckets."""

import numpy as np
import pytest

import jax.numpy as jnp

from open_o3_video_tpu.engine import InferenceEngine, Request, SamplingParams
from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, params as P

GREEDY = SamplingParams(temperature=0.0, repetition_penalty=1.0, max_tokens=6)


@pytest.fixture(scope="module")
def tiny_engine():
    cfg = Qwen25VLConfig.tiny()
    params = P.init(cfg, seed=0)
    return InferenceEngine(
        params, cfg, prompt_buckets=(16, 32), cache_dtype=jnp.float32,
        max_slots=2, decode_segment=4,
    )


def _prompts(k, rng):
    return [rng.integers(5, 400, size=rng.integers(4, 14)).tolist() for _ in range(k)]


class TestContinuous:
    def test_queue_past_slots_matches_solo(self, tiny_engine):
        """5 requests through 2 slots (forced refills) == solo generation."""
        rng = np.random.default_rng(0)
        prompts = _prompts(5, rng)
        solo = [
            tiny_engine.generate([Request(input_ids=p)], GREEDY)[0]["token_ids"]
            for p in prompts
        ]
        batched = tiny_engine.generate([Request(input_ids=p) for p in prompts], GREEDY)
        for i in range(5):
            assert batched[i]["token_ids"] == solo[i], i

    def test_varied_max_tokens_budget(self, tiny_engine):
        out = tiny_engine.generate(
            [Request(input_ids=[5, 6, 7])],
            SamplingParams(temperature=0.0, repetition_penalty=1.0, max_tokens=1),
        )
        assert len(out[0]["token_ids"]) == 1

    def test_arena_persists_across_calls(self, tiny_engine):
        rng = np.random.default_rng(1)
        p = _prompts(1, rng)[0]
        tiny_engine.generate([Request(input_ids=p)], GREEDY)
        keys_before = set(tiny_engine._arenas.keys())
        assert keys_before, "arena should persist after a call"
        out1 = tiny_engine.generate([Request(input_ids=p)], GREEDY)
        out2 = tiny_engine.generate([Request(input_ids=p)], GREEDY)
        assert out1[0]["token_ids"] == out2[0]["token_ids"]

    def test_mixed_buckets_one_call(self, tiny_engine):
        rng = np.random.default_rng(2)
        short = rng.integers(5, 400, size=8).tolist()   # bucket 16
        long = rng.integers(5, 400, size=24).tolist()   # bucket 32
        solo_s = tiny_engine.generate([Request(input_ids=short)], GREEDY)[0]["token_ids"]
        solo_l = tiny_engine.generate([Request(input_ids=long)], GREEDY)[0]["token_ids"]
        both = tiny_engine.generate(
            [Request(input_ids=long), Request(input_ids=short)], GREEDY
        )
        assert both[0]["token_ids"] == solo_l
        assert both[1]["token_ids"] == solo_s

    def test_logprobs_through_refill(self, tiny_engine):
        rng = np.random.default_rng(3)
        prompts = _prompts(3, rng)
        outs = tiny_engine.generate(
            [Request(input_ids=p) for p in prompts], GREEDY, return_logprobs=True
        )
        for o in outs:
            assert len(o["logprobs"]) == len(o["token_ids"])
            assert all(lp <= 0 for lp in o["logprobs"])

    def test_ring_wrap_stress_matches_solo(self, tiny_engine):
        """Long completions + repeated refills force the ring write head to
        wrap several times; every clobbered slot must belong to a finished
        span, so outputs stay identical to solo decoding."""
        rng = np.random.default_rng(7)
        prompts = [rng.integers(5, 400, size=rng.integers(4, 14)).tolist()
                   for _ in range(6)]
        long_greedy = SamplingParams(
            temperature=0.0, repetition_penalty=1.0, max_tokens=40
        )
        # 6 requests x up to 40 tokens through 2 slots with 4-step segments:
        # ~120 group steps over a 40-slot ring -> ~3 full wraps.
        solo = [
            tiny_engine.generate([Request(input_ids=p)], long_greedy)[0]["token_ids"]
            for p in prompts
        ]
        batched = tiny_engine.generate(
            [Request(input_ids=p) for p in prompts], long_greedy
        )
        for i in range(6):
            assert batched[i]["token_ids"] == solo[i], i

    def test_sampled_rows_differ(self, tiny_engine):
        """Identical prompts with temperature>0 must produce independent
        samples per row (the GSPO rollout contract)."""
        p = [5, 6, 7, 8, 9, 10]
        outs = tiny_engine.generate(
            [Request(input_ids=p)] * 4,
            SamplingParams(temperature=1.0, top_p=1.0, repetition_penalty=1.0,
                           max_tokens=8, seed=0),
        )
        seqs = {tuple(o["token_ids"]) for o in outs}
        assert len(seqs) > 1


class TestChunkedPrefill:
    def test_chunked_matches_unchunked(self):
        """prefill_chunk splits long-prompt admissions and interleaves
        decode segments for active slots; outputs must equal the
        unchunked engine's (greedy)."""
        cfg = Qwen25VLConfig.tiny()
        params = P.init(cfg, seed=0)
        rng = np.random.default_rng(11)
        # bucket 64, chunk 16; 3 requests through 2 slots force a chunked
        # admission while another slot is mid-decode
        prompts = [rng.integers(5, 400, size=rng.integers(40, 62)).tolist()
                   for _ in range(3)]
        samp = SamplingParams(temperature=0.0, repetition_penalty=1.0, max_tokens=10)

        plain = InferenceEngine(
            params, cfg, prompt_buckets=(64,), cache_dtype=jnp.float32,
            max_slots=2, decode_segment=4,
        )
        chunked = InferenceEngine(
            params, cfg, prompt_buckets=(64,), cache_dtype=jnp.float32,
            max_slots=2, decode_segment=4, prefill_chunk=16,
        )
        a = plain.generate([Request(input_ids=p) for p in prompts], samp)
        b = chunked.generate([Request(input_ids=p) for p in prompts], samp)
        for i in range(3):
            assert a[i]["token_ids"] == b[i]["token_ids"], i

    def test_chunked_with_qwen3_deepstack(self):
        """Deepstack injection is positionwise; the per-chunk row-index
        slices must land the vision features in the right chunks."""
        from open_o3_video_tpu.models.qwen25vl import tiny_qwen3
        from open_o3_video_tpu.ops.preprocess import frames_as_images_patches

        cfg = tiny_qwen3()
        params = P.init(cfg, seed=0)
        rng = np.random.default_rng(12)
        frames = rng.integers(0, 255, size=(2, 3, 28, 56), dtype=np.uint8)
        patches, grid = frames_as_images_patches(frames)
        n_tok = patches.shape[0] // cfg.vision.merge_unit
        vis_req = Request(
            input_ids=[7, 8, cfg.vision_start_token_id]
            + [cfg.image_token_id] * n_tok
            + [cfg.vision_end_token_id]
            + rng.integers(5, 90, size=40).tolist(),
            pixel_patches=patches,
            grid_thw=grid,
            vision_token_id=cfg.image_token_id,
        )
        reqs = [
            Request(input_ids=rng.integers(5, 90, size=50).tolist()),
            vis_req,
            Request(input_ids=rng.integers(5, 90, size=44).tolist()),
        ]
        samp = SamplingParams(temperature=0.0, repetition_penalty=1.0, max_tokens=8)
        plain = InferenceEngine(
            params, cfg, prompt_buckets=(64,), cache_dtype=jnp.float32,
            max_slots=2, decode_segment=4,
        )
        chunked = InferenceEngine(
            params, cfg, prompt_buckets=(64,), cache_dtype=jnp.float32,
            max_slots=2, decode_segment=4, prefill_chunk=16,
        )
        a = plain.generate(reqs, samp)
        b = chunked.generate(reqs, samp)
        for i in range(3):
            assert a[i]["token_ids"] == b[i]["token_ids"], i


class TestLongContextAdmission:
    """The 81920-token serving envelope (reference inference_example.py:18):
    prompts at/above long_prefill_threshold always prefill in chunks (memory-
    driven — a monolithic 80k prefill cannot fit next to the weights), with
    the arena itself as the rows cache on full-wave admissions."""

    def _engines(self, **kw):
        cfg = Qwen25VLConfig.tiny()
        params = P.init(cfg, seed=0)
        plain = InferenceEngine(
            params, cfg, prompt_buckets=(64,), cache_dtype=jnp.float32,
            max_slots=2, decode_segment=4,
        )
        longctx = InferenceEngine(
            params, cfg, prompt_buckets=(64,), cache_dtype=jnp.float32,
            max_slots=2, decode_segment=4,
            long_prefill_threshold=32, long_prefill_chunk=16, **kw,
        )
        return plain, longctx

    def test_single_long_request_chunked_matches_plain(self):
        """n_admit == B == 1: chunked prefill writes the arena directly."""
        plain, longctx = self._engines()
        rng = np.random.default_rng(21)
        p = rng.integers(5, 400, size=60).tolist()  # bucket 64 >= threshold 32
        samp = SamplingParams(temperature=0.0, repetition_penalty=1.0, max_tokens=8)
        a = plain.generate([Request(input_ids=p)], samp)
        b = longctx.generate([Request(input_ids=p)], samp)
        assert a[0]["token_ids"] == b[0]["token_ids"]

    def test_full_wave_two_rows_then_refill(self):
        """3 long requests through 2 slots: first admission is a full wave
        (arena-direct chunks), the refill is a partial admission (fresh rows
        + scatter); all outputs match the unchunked engine."""
        plain, longctx = self._engines()
        rng = np.random.default_rng(22)
        prompts = [rng.integers(5, 400, size=rng.integers(40, 62)).tolist()
                   for _ in range(3)]
        samp = SamplingParams(temperature=0.0, repetition_penalty=1.0, max_tokens=8)
        a = plain.generate([Request(input_ids=p) for p in prompts], samp)
        b = longctx.generate([Request(input_ids=p) for p in prompts], samp)
        for i in range(3):
            assert a[i]["token_ids"] == b[i]["token_ids"], i

    def test_default_buckets_admit_81920(self):
        """The public contract: a default-constructed engine buckets an
        80k-token prompt instead of raising (envelope == 81920)."""
        from open_o3_video_tpu.engine.engine import _bucket

        cfg = Qwen25VLConfig.tiny()
        params = P.init(cfg, seed=0)
        eng = InferenceEngine(params, cfg, cache_dtype=jnp.float32)
        assert _bucket(81920, eng.prompt_buckets) == 81920
        assert _bucket(40000, eng.prompt_buckets) == 49152
        with pytest.raises(ValueError):
            _bucket(81921, eng.prompt_buckets)

    def test_kv_budget_caps_slots(self):
        """max_kv_gb serializes a wave that would overflow the KV budget;
        outputs still match the uncapped engine (requests stream through
        fewer slots)."""
        cfg = Qwen25VLConfig.tiny()
        params = P.init(cfg, seed=0)
        uncapped = InferenceEngine(
            params, cfg, prompt_buckets=(32,), cache_dtype=jnp.float32,
            max_slots=4, decode_segment=4,
        )
        tcfg = cfg.text
        per_slot = (2 * tcfg.num_hidden_layers * (32 + 8)
                    * tcfg.num_key_value_heads * tcfg.head_dim * 4)
        capped = InferenceEngine(
            params, cfg, prompt_buckets=(32,), cache_dtype=jnp.float32,
            max_slots=4, decode_segment=4,
            max_kv_gb=1.5 * per_slot / 1e9,  # budget for exactly 1 slot
        )
        rng = np.random.default_rng(23)
        prompts = [rng.integers(5, 400, size=rng.integers(8, 28)).tolist()
                   for _ in range(3)]
        samp = SamplingParams(temperature=0.0, repetition_penalty=1.0, max_tokens=8)
        a = uncapped.generate([Request(input_ids=p) for p in prompts], samp)
        b = capped.generate([Request(input_ids=p) for p in prompts], samp)
        for i in range(3):
            assert a[i]["token_ids"] == b[i]["token_ids"], i
        assert set(capped._arenas.keys()) == {(1, 40)}  # one-slot arenas only


def test_fp8_kv_cache_engine():
    """float8_e4m3fn KV arena (the long-context memory knob: halves KV HBM
    so the 81920-token contract fits one v5e next to int8 weights).

    Mechanical soundness only: a TINY random float32 model has near-tie
    logits, so fp8's ~6% relative KV error legitimately flips greedy
    tokens — token-level quality is measured at full 7B dims on the real
    chip (bench.py longctx/quant sections), not asserted here. Pinned:
    the fp8 path runs through admission + refill + ring decode, outputs
    are well-formed with finite logprobs, and generation is deterministic."""
    cfg = Qwen25VLConfig.tiny()
    params = P.init(cfg, seed=0)
    rng = np.random.default_rng(31)
    prompts = [rng.integers(5, 400, size=rng.integers(20, 50)).tolist()
               for _ in range(3)]
    samp = SamplingParams(temperature=0.0, repetition_penalty=1.0, max_tokens=8)
    fp8 = InferenceEngine(params, cfg, prompt_buckets=(64,),
                          cache_dtype=jnp.float8_e4m3fn, max_slots=2)
    a = fp8.generate([Request(input_ids=p) for p in prompts], samp,
                     return_logprobs=True)
    b = fp8.generate([Request(input_ids=p) for p in prompts], samp)
    for i in range(3):
        assert 1 <= len(a[i]["token_ids"]) <= 8
        assert all(np.isfinite(lp) and lp <= 0 for lp in a[i]["logprobs"])
        assert a[i]["token_ids"] == b[i]["token_ids"], i  # deterministic
    assert fp8._arenas and next(iter(fp8._arenas.values()))["k"].dtype == jnp.float8_e4m3fn
