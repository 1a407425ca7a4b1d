"""Chunked-KV decode attention (ops/attention.py _decode_attention_chunked):
the long-context decode memory knob must be numerically invisible vs the
dense grouped-GQA softmax path."""

import numpy as np
import pytest

import jax.numpy as jnp

from open_o3_video_tpu.ops import attention as A


def _dense_reference(q, k, v, mask):
    B, S, Hq, D = q.shape
    T, Hkv = k.shape[1], k.shape[2]
    group = Hq // Hkv
    qg = np.asarray(q, np.float64).reshape(B, S, Hkv, group, D)
    kf = np.asarray(k, np.float64)
    vf = np.asarray(v, np.float64)
    s = np.einsum("bshgd,bthd->bhgst", qg, kf) / np.sqrt(D)
    s = np.where(np.asarray(mask)[:, None, None, :, :], s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    out = np.einsum("bhgst,bthd->bshgd", p, vf)
    return out.reshape(B, S, Hq, D)


@pytest.mark.parametrize("chunk,T", [(16, 64), (16, 70), (64, 64), (13, 70)])
def test_chunked_matches_dense(chunk, T):
    rng = np.random.default_rng(0)
    B, S, Hq, Hkv, D = 2, 1, 8, 2, 16
    q = jnp.asarray(rng.normal(size=(B, S, Hq, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, Hkv, D)).astype(np.float32))
    valid = rng.random((B, T)) > 0.3
    valid[:, 0] = True  # at least one attendable key per row
    mask = jnp.asarray(np.broadcast_to(valid[:, None, :], (B, S, T)))
    ours = A._decode_attention_chunked(q, k, v, mask, chunk=chunk)
    ref = _dense_reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-5, atol=2e-5)


def test_long_decode_threshold_routes_and_matches():
    """causal_attention routes S<=8, T>=LONG_DECODE_T to the chunked path;
    outputs must equal the dense path's (threshold forced low)."""
    rng = np.random.default_rng(1)
    B, S, Hq, Hkv, D = 1, 1, 4, 2, 16
    T = 96
    q = jnp.asarray(rng.normal(size=(B, S, Hq, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, Hkv, D)).astype(np.float32))
    kv_mask = jnp.asarray(np.arange(T)[None, :] < 40)
    qpos = jnp.full((B, S), T, jnp.int32)  # validity-only (ring decode form)
    kvpos = jnp.zeros((B, T), jnp.int32)
    dense = A.causal_attention(q, k, v, q_positions=qpos, kv_positions=kvpos,
                               kv_mask=kv_mask, impl="xla")
    old_t, old_c = A.LONG_DECODE_T, A.DECODE_CHUNK
    try:
        A.LONG_DECODE_T, A.DECODE_CHUNK = 64, 32
        chunked = A.causal_attention(q, k, v, q_positions=qpos,
                                     kv_positions=kvpos, kv_mask=kv_mask,
                                     impl="xla")
    finally:
        A.LONG_DECODE_T, A.DECODE_CHUNK = old_t, old_c
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)


def test_chunked_with_fp8_cache_runs():
    """fp8-stored KV through the chunked path: block-local casts, finite out."""
    rng = np.random.default_rng(2)
    B, S, Hq, Hkv, D, T = 1, 1, 4, 2, 16, 64
    q = jnp.asarray(rng.normal(size=(B, S, Hq, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, Hkv, D))).astype(jnp.float8_e4m3fn)
    v = jnp.asarray(rng.normal(size=(B, T, Hkv, D))).astype(jnp.float8_e4m3fn)
    mask = jnp.ones((B, S, T), bool)
    out = A._decode_attention_chunked(q, k, v, mask, chunk=16)
    assert np.isfinite(np.asarray(out)).all()
    # matches dense computation on the fp8-rounded values
    ref = _dense_reference(q, k.astype(jnp.float32), v.astype(jnp.float32), mask)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)
