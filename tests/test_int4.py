"""Int4 group-quantized matmul (ops/int4.py): packing roundtrip, Pallas
kernel (interpret mode) vs the XLA dequant reference, dense() dispatch, and
model integration on the CPU fallback path."""

import jax
import jax.numpy as jnp
import numpy as np

from open_o3_video_tpu.ops.int4 import (
    Int4Linear,
    _unpack_int4_xla,
    int4_dense,
    quantize_params_int4,
    quantize_weight_int4,
)
from open_o3_video_tpu.ops.quant import LoraLinear, dense


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, 0.02, size=(256, 192)).astype(np.float32))
    q = quantize_weight_int4(w, group=128)
    assert q.w_p.shape == (128, 192) and q.w_p.dtype == jnp.int8
    assert q.scale.shape == (2, 192)
    deq = _unpack_int4_xla(q, jnp.float32)
    # Symmetric rounding: |err| <= scale/2 per element, scale = absmax/7.
    bound = np.repeat(np.asarray(q.scale), 128, axis=0) / 2 + 1e-8
    assert np.all(np.abs(np.asarray(deq - w)) <= bound)


def test_quantize_exact_codes_roundtrip():
    # Weights that are exact multiples of the scale dequantize exactly,
    # including negative codes through the nibble packing.
    rng = np.random.default_rng(1)
    codes = rng.integers(-7, 8, size=(256, 128)).astype(np.float32)
    w = jnp.asarray(codes * 0.01)
    q = quantize_weight_int4(w, group=64)
    deq = np.asarray(_unpack_int4_xla(q, jnp.float32))
    np.testing.assert_allclose(deq, np.asarray(w), rtol=1e-6)


def test_pallas_kernel_matches_xla_reference():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, size=(3, 17, 256)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    w = jnp.asarray(rng.normal(0, 0.05, size=(256, 256)).astype(np.float32))
    q = quantize_weight_int4(w, group=128)
    ref = (x.astype(jnp.float32) @ _unpack_int4_xla(q, jnp.float32)).astype(
        jnp.bfloat16
    )
    out = int4_dense(x, q, interpret=True)
    assert out.shape == ref.shape and out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )


def test_pallas_kernel_odd_rows_padding():
    # M not a multiple of the block: padding path.
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, size=(5, 384)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    w = jnp.asarray(rng.normal(0, 0.05, size=(384, 128)).astype(np.float32))
    q = quantize_weight_int4(w, group=128)
    ref = x.astype(jnp.float32) @ _unpack_int4_xla(q, jnp.float32)
    out = int4_dense(x, q, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


def test_dense_dispatch_and_lora_base():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(0, 1, size=(4, 256)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.05, size=(256, 64)).astype(np.float32))
    q = quantize_weight_int4(w, group=128)  # N=64 -> XLA fallback path
    np.testing.assert_allclose(
        np.asarray(dense(x, q)), np.asarray(x @ _unpack_int4_xla(q)), rtol=1e-5
    )
    lora = LoraLinear(
        q,
        jnp.asarray(rng.normal(0, 0.01, size=(256, 4)).astype(np.float32)),
        jnp.zeros((4, 64), jnp.float32),
        2.0,
    )
    np.testing.assert_allclose(
        np.asarray(dense(x, lora)), np.asarray(dense(x, q)), rtol=1e-6
    )


def test_int4linear_is_pytree():
    q = quantize_weight_int4(jnp.ones((128, 8)), group=128)
    leaves, treedef = jax.tree_util.tree_flatten(q)
    assert len(leaves) == 2
    q2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(q2, Int4Linear) and q2.group == 128
    # jit through the pytree
    f = jax.jit(lambda x, w: dense(x, w))
    out = f(jnp.ones((2, 128)), q)
    assert out.shape == (2, 8)


def test_quantize_params_int4_model_forward():
    from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, get_rope_index
    from open_o3_video_tpu.models.qwen25vl import params as PM
    from open_o3_video_tpu.models.qwen25vl.model import forward

    cfg = Qwen25VLConfig.tiny(dtype=jnp.float32)
    params = PM.init(cfg, seed=5)
    # tiny dims (64) are not divisible by group=128 -> use group=32
    qparams = quantize_params_int4(params, group=32)
    assert isinstance(qparams["text"]["layers"][0]["q_w"], Int4Linear)
    assert isinstance(qparams["text"]["lm_head"], Int4Linear)
    # vision stays untouched by the text patterns
    assert not isinstance(qparams["visual"]["blocks"][0]["qkv_w"], Int4Linear)

    rng = np.random.default_rng(5)
    ids = np.asarray(rng.integers(5, 99, size=(1, 12)))
    pos, _ = get_rope_index(cfg, ids)
    ref, _ = forward(params, cfg, jnp.asarray(ids), jnp.asarray(pos))
    out, _ = forward(qparams, cfg, jnp.asarray(ids), jnp.asarray(pos))
    # int4 is lossy; just require the forward to track the bf16 logits.
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert np.isfinite(np.asarray(out)).all() and err < 2.0


def test_quantize_params_skips_indivisible():
    w = {"text": {"lm_head": jnp.ones((100, 64))}}  # 100 % 128 != 0
    out = quantize_params_int4(w, group=128)
    assert not isinstance(out["text"]["lm_head"], Int4Linear)
