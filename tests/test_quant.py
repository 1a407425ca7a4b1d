"""Int8 weight-only quantization tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, forward, get_rope_index, params as P
from open_o3_video_tpu.ops.quant import (
    QuantizedLinear,
    dense,
    param_bytes,
    quantize_params,
    quantize_weight,
)


class TestQuantizeWeight:
    def test_roundtrip_error_bounded(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(0, 0.05, (128, 256)), jnp.float32)
        q = quantize_weight(w, compute_dtype=jnp.float32)
        assert q.w_q.dtype == jnp.int8
        deq = q.w_q.astype(jnp.float32) * q.scale
        # per-channel symmetric int8: error bounded by scale/2 per element
        max_err = float(jnp.max(jnp.abs(deq - w)))
        max_scale = float(jnp.max(q.scale))
        assert max_err <= max_scale * 0.5 + 1e-7

    def test_dense_matches_dequantized_matmul(self):
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.normal(0, 0.05, (64, 32)), jnp.float32)
        x = jnp.asarray(rng.normal(0, 1, (4, 64)), jnp.float32)
        q = quantize_weight(w, compute_dtype=jnp.float32)
        deq = q.w_q.astype(jnp.float32) * q.scale.astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(dense(x, q)), np.asarray(x @ deq), rtol=1e-5, atol=1e-5)

    def test_zero_column_safe(self):
        w = jnp.zeros((8, 4), jnp.float32)
        q = quantize_weight(w)
        assert np.isfinite(np.asarray(q.scale)).all()
        out = dense(jnp.ones((2, 8)), q)
        np.testing.assert_array_equal(np.asarray(out), 0.0)


class TestQuantizedModel:
    def test_logits_close_and_smaller(self):
        cfg = Qwen25VLConfig.tiny()
        params = P.init(cfg, seed=0)
        qparams = quantize_params(params)

        # targeted leaves converted, others untouched
        assert isinstance(qparams["text"]["layers"][0]["q_w"], QuantizedLinear)
        assert isinstance(qparams["text"]["lm_head"], QuantizedLinear)
        assert not isinstance(qparams["text"]["embed_tokens"], QuantizedLinear)
        assert not isinstance(qparams["visual"]["blocks"][0]["qkv_w"], QuantizedLinear)
        assert param_bytes(qparams) < param_bytes(params)

        rng = np.random.default_rng(0)
        ids = rng.integers(0, 400, size=(1, 12))
        pos, _ = get_rope_index(cfg, ids)
        ref, _ = forward(params, cfg, jnp.asarray(ids), jnp.asarray(pos))
        out, _ = forward(qparams, cfg, jnp.asarray(ids), jnp.asarray(pos))
        ref, out = np.asarray(ref), np.asarray(out)
        # int8 error budget: top-1 should essentially always agree on random nets
        assert (ref.argmax(-1) == out.argmax(-1)).mean() > 0.9
        assert np.abs(ref - out).max() < 0.2

    def test_quantized_engine_generates(self):
        from open_o3_video_tpu.engine import InferenceEngine, Request, SamplingParams

        cfg = Qwen25VLConfig.tiny()
        params = P.init(cfg, seed=0)
        qparams = quantize_params(params)
        eng = InferenceEngine(qparams, cfg, prompt_buckets=(32,), cache_dtype=jnp.float32)
        out = eng.generate(
            [Request(input_ids=[5, 6, 7, 8])],
            SamplingParams(temperature=0.0, repetition_penalty=1.0, max_tokens=4),
        )
        assert len(out[0]["token_ids"]) >= 1


class TestQuantizedSharding:
    def test_quantized_params_shard_and_match(self):
        import jax
        from jax.sharding import PartitionSpec as PS

        from open_o3_video_tpu.parallel import make_mesh, param_sharding_rules, shard_params
        from open_o3_video_tpu.models.qwen25vl import forward, get_rope_index

        cfg = Qwen25VLConfig.tiny()
        params = quantize_params(P.init(cfg, seed=0))
        mesh = make_mesh(data=1, fsdp=2, tensor=4)
        specs = param_sharding_rules(params, mesh)
        # quantized leaf got the parent weight's spec
        q_spec = specs["text"]["layers"][0]["q_w"]
        assert q_spec.w_q == PS("fsdp", "tensor")
        assert q_spec.scale == PS(None, "tensor")

        sharded = shard_params(params, mesh)
        rng = np.random.default_rng(0)
        ids = rng.integers(0, 400, size=(1, 8))
        pos, _ = get_rope_index(cfg, ids)
        ref, _ = forward(params, cfg, jnp.asarray(ids), jnp.asarray(pos))
        out, _ = forward(sharded, cfg, jnp.asarray(ids), jnp.asarray(pos))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


class TestQuantizedStreamingLoad:
    def test_load_streams_to_int8_and_matches_post_quant(self, tmp_path):
        """from_torch_state_dict(quantize_text=True) == quantize after a
        full-precision import: same quantized leaves, and the structure
        matches init(quantize_text=True)."""
        torch = pytest.importorskip("torch")
        from transformers.models.qwen2_5_vl import (
            Qwen2_5_VLConfig,
            Qwen2_5_VLForConditionalGeneration,
        )
        import dataclasses
        import jax
        import jax.numpy as jnp

        from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, params as P
        from open_o3_video_tpu.ops.quant import quantize_weight

        cfg = Qwen25VLConfig.tiny(dtype=jnp.float32)
        v, t = cfg.vision, cfg.text
        hf_cfg = Qwen2_5_VLConfig(
            vision_config=dict(
                depth=v.depth, hidden_size=v.hidden_size,
                intermediate_size=v.intermediate_size, num_heads=v.num_heads,
                patch_size=v.patch_size, spatial_merge_size=v.spatial_merge_size,
                temporal_patch_size=v.temporal_patch_size, window_size=v.window_size,
                fullatt_block_indexes=list(v.fullatt_block_indexes),
                out_hidden_size=v.out_hidden_size,
            ),
            text_config=dict(
                vocab_size=t.vocab_size, hidden_size=t.hidden_size,
                intermediate_size=t.intermediate_size,
                num_hidden_layers=t.num_hidden_layers,
                num_attention_heads=t.num_attention_heads,
                num_key_value_heads=t.num_key_value_heads,
                rope_scaling={"type": "mrope", "mrope_section": list(t.mrope_section)},
                tie_word_embeddings=False,
            ),
            tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        hf = Qwen2_5_VLForConditionalGeneration(hf_cfg).eval().float()

        full = P.from_torch_state_dict(hf.state_dict(), cfg)
        streamed = P.from_torch_state_dict(hf.state_dict(), cfg, quantize_text=True)

        layer_full = full["text"]["layers"][0]
        layer_q = streamed["text"]["layers"][0]
        from open_o3_video_tpu.ops.quant import QuantizedLinear

        for name in ("q_w", "o_w", "down_w"):
            assert isinstance(layer_q[name], QuantizedLinear), name
            ref_q = quantize_weight(layer_full[name])
            np.testing.assert_array_equal(
                np.asarray(layer_q[name].w_q), np.asarray(ref_q.w_q)
            )
            np.testing.assert_allclose(
                np.asarray(layer_q[name].scale), np.asarray(ref_q.scale),
                rtol=1e-6,
            )
        assert isinstance(streamed["text"]["lm_head"], QuantizedLinear)
        # non-quantized leaves untouched
        np.testing.assert_array_equal(
            np.asarray(layer_q["q_b"]), np.asarray(layer_full["q_b"])
        )
        # structure matches init(quantize_text=True) so sharding rules and
        # forward paths are identical
        ref_struct = jax.tree_util.tree_structure(
            P.init(cfg, seed=0, quantize_text=True)
        )
        assert jax.tree_util.tree_structure(streamed) == ref_struct
