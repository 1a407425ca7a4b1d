"""w8a8 (int8 activation x int8 weight) serving path tests.

The a8 mode exists for the MXU's 2x int8 throughput on compute-bound
programs (engine prefill + vision tower); these tests pin its math and its
trace-time scoping on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, forward, get_rope_index, params as P
from open_o3_video_tpu.ops.quant import (
    DEFAULT_QUANT_PATTERNS,
    VISION_QUANT_PATTERNS,
    QuantizedLinear,
    a8_acts,
    a8_active,
    dense,
    quantize_acts,
    quantize_params,
    quantize_weight,
)


class TestQuantizeActs:
    def test_roundtrip_error_bounded(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 2.0, (5, 64)), jnp.float32)
        x_q, s = quantize_acts(x)
        assert x_q.dtype == jnp.int8
        deq = x_q.astype(jnp.float32) * s
        assert float(jnp.max(jnp.abs(deq - x))) <= float(jnp.max(s)) * 0.5 + 1e-6

    def test_zero_row_safe(self):
        x = jnp.zeros((3, 16), jnp.float32)
        x_q, s = quantize_acts(x)
        assert np.isfinite(np.asarray(s)).all()
        np.testing.assert_array_equal(np.asarray(x_q), 0)


class TestDenseA8:
    def test_matches_manual_int32_reference(self):
        """dense under a8 == exact int8 x int8 -> int32 dequant math."""
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.normal(0, 0.05, (64, 32)), jnp.float32)
        x = jnp.asarray(rng.normal(0, 1, (4, 64)), jnp.float32)
        q = quantize_weight(w, compute_dtype=jnp.float32)
        x_q, sx = quantize_acts(x)
        ref = (
            np.asarray(x_q, np.int32) @ np.asarray(q.w_q, np.int32)
        ).astype(np.float32) * np.asarray(sx) * np.asarray(q.scale, np.float32)
        with a8_acts():
            out = dense(x, q)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)

    def test_a8_close_to_w8(self):
        rng = np.random.default_rng(2)
        w = jnp.asarray(rng.normal(0, 0.05, (128, 64)), jnp.float32)
        x = jnp.asarray(rng.normal(0, 1, (8, 128)), jnp.float32)
        q = quantize_weight(w, compute_dtype=jnp.float32)
        w8 = np.asarray(dense(x, q))
        with a8_acts():
            a8 = np.asarray(dense(x, q))
        # activation quantization adds bounded extra error
        assert np.abs(a8 - w8).max() < 0.05 * np.abs(w8).max() + 1e-3

    def test_scope_is_restored(self):
        assert not a8_active()
        with a8_acts():
            assert a8_active()
            with a8_acts(False):
                assert not a8_active()
            assert a8_active()
        assert not a8_active()

    def test_traced_mode_is_baked_into_the_executable(self):
        """A program traced under a8 keeps int8 math when called outside the
        scope, and vice versa — the flag is trace-time, not run-time."""
        rng = np.random.default_rng(3)
        w = jnp.asarray(rng.normal(0, 0.05, (32, 16)), jnp.float32)
        x = jnp.asarray(rng.normal(0, 1, (2, 32)), jnp.float32)
        q = quantize_weight(w, compute_dtype=jnp.float32)

        f = jax.jit(lambda xx: dense(xx, q))
        with a8_acts():
            a8_out = np.asarray(f(x))  # traced (and cached) under a8
        outside = np.asarray(f(x))  # same executable, outside the scope
        np.testing.assert_array_equal(a8_out, outside)
        with a8_acts():
            ref = np.asarray(dense(x, q))
        np.testing.assert_allclose(outside, ref, rtol=1e-6, atol=1e-6)

    def test_plain_and_lora_unaffected(self):
        from open_o3_video_tpu.ops.quant import LoraLinear

        rng = np.random.default_rng(4)
        w = jnp.asarray(rng.normal(0, 0.05, (16, 8)), jnp.float32)
        x = jnp.asarray(rng.normal(0, 1, (3, 16)), jnp.float32)
        with a8_acts():
            np.testing.assert_array_equal(np.asarray(dense(x, w)), np.asarray(x @ w))
        lora = LoraLinear(
            w,
            jnp.asarray(rng.normal(0, 0.01, (16, 2)), jnp.float32),
            jnp.zeros((2, 8), jnp.float32),
            scale=2.0,
        )
        with a8_acts():
            np.testing.assert_allclose(
                np.asarray(dense(x, lora)), np.asarray(x @ w), rtol=1e-6
            )


class TestVisionQuant:
    def test_vision_patterns_quantize_blocks_only(self):
        cfg = Qwen25VLConfig.tiny()
        params = P.init(cfg, seed=0)
        q = quantize_params(params, DEFAULT_QUANT_PATTERNS + VISION_QUANT_PATTERNS)
        assert isinstance(q["visual"]["blocks"][0]["qkv_w"], QuantizedLinear)
        # Qwen2.5-VL's vision MLP is gated (gate/up/down); fc1/fc2 cover the
        # Qwen2-VL / Qwen3-VL variants.
        assert isinstance(q["visual"]["blocks"][0]["down_w"], QuantizedLinear)
        assert not isinstance(q["visual"]["patch_embed"], QuantizedLinear)
        assert not isinstance(q["visual"]["merger"]["fc1_w"], QuantizedLinear)

    def test_quantized_vision_forward_close(self):
        from open_o3_video_tpu.models.qwen25vl.model import encode_vision

        cfg = Qwen25VLConfig.tiny()
        params = P.init(cfg, seed=0)
        q = quantize_params(params, VISION_QUANT_PATTERNS)
        rng = np.random.default_rng(0)
        v = cfg.vision
        grid = np.array([[1, 4, 4]], np.int64)
        patch_dim = v.in_channels * v.temporal_patch_size * v.patch_size**2
        patches = jnp.asarray(rng.normal(0, 1, (16, patch_dim)), jnp.float32)
        ref = np.asarray(encode_vision(params, cfg, patches, grid))
        out = np.asarray(encode_vision(q, cfg, patches, grid))
        with a8_acts():
            out_a8 = np.asarray(encode_vision(q, cfg, patches, grid))
        scale = np.abs(ref).max()
        assert np.abs(out - ref).max() < 0.1 * scale
        assert np.abs(out_a8 - ref).max() < 0.15 * scale


class TestVisionQuantSharding:
    def test_visual_quantized_leaves_shard_like_parents(self):
        from jax.sharding import PartitionSpec as PS

        from open_o3_video_tpu.parallel import make_mesh, param_sharding_rules

        cfg = Qwen25VLConfig.tiny()
        params = quantize_params(P.init(cfg, seed=0), VISION_QUANT_PATTERNS)
        mesh = make_mesh(data=1, fsdp=2, tensor=4)
        specs = param_sharding_rules(params, mesh)
        blk = specs["visual"]["blocks"][0]
        assert blk["qkv_w"].w_q == PS("fsdp", "tensor")
        assert blk["qkv_w"].scale == PS(None, "tensor")
        assert blk["proj_w"].w_q == PS("tensor", "fsdp")
        assert blk["proj_w"].scale == PS(None, "fsdp")


class TestEngineA8:
    def test_a8_engine_generates_and_agrees_with_w8(self):
        """Greedy decode: the a8-prefill engine must produce a plausible
        completion, and on a tiny random net it should agree with the w8
        engine (identical decode path; prefill logits differ only by the
        bounded activation-quantization error)."""
        from open_o3_video_tpu.engine import InferenceEngine, Request, SamplingParams

        cfg = Qwen25VLConfig.tiny()
        params = quantize_params(P.init(cfg, seed=0))
        samp = SamplingParams(temperature=0.0, repetition_penalty=1.0, max_tokens=6)
        req = lambda: [Request(input_ids=[5, 6, 7, 8, 9, 10])]

        eng = InferenceEngine(params, cfg, prompt_buckets=(32,),
                              cache_dtype=jnp.float32, a8_prefill=False)
        ref = eng.generate(req(), samp)[0]["token_ids"]

        eng8 = InferenceEngine(params, cfg, prompt_buckets=(32,),
                               cache_dtype=jnp.float32, a8_prefill=True)
        assert eng8.a8_prefill
        out = eng8.generate(req(), samp)[0]["token_ids"]
        assert len(out) >= 1
        # First token comes from the a8 admission program; random tiny nets
        # have well-separated argmaxes, so require agreement there.
        assert out[0] == ref[0]

    def test_env_default(self, monkeypatch):
        from open_o3_video_tpu.engine import InferenceEngine

        cfg = Qwen25VLConfig.tiny()
        params = P.init(cfg, seed=0)
        monkeypatch.setenv("O3V_A8", "1")
        eng = InferenceEngine(params, cfg, prompt_buckets=(32,),
                              cache_dtype=jnp.float32)
        assert eng.a8_prefill
        monkeypatch.setenv("O3V_A8", "0")
        eng = InferenceEngine(params, cfg, prompt_buckets=(32,),
                              cache_dtype=jnp.float32)
        assert not eng.a8_prefill
