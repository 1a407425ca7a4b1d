"""Pallas long-context decode kernel (ops/decode_attention.py).

Must match the exact-softmax chunked/dense paths to input-dtype rounding:
- stored-dtype KV (f32 / bf16 / fp8-e4m3) cast per tile in the kernel,
- GQA grouping, per-row causal positions, slot-validity holes,
- fixed-m softmax (exp(min(s, 60)), normalize at the end),
- zero output for rows with no attendable key (never read).

Run in interpret mode on CPU; the real-chip differential is a bench leg.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from open_o3_video_tpu.ops import attention as A
from open_o3_video_tpu.ops.decode_attention import decode_attention_gqa


def _dense_reference(q, k, v, qpos, kv_valid):
    """f64 exact softmax with buffer-index causality."""
    B, S, Hq, D = q.shape
    T, Hkv = k.shape[1], k.shape[2]
    group = Hq // Hkv
    qg = np.asarray(q, np.float64).reshape(B, S, Hkv, group, D)
    kf = np.asarray(k.astype(jnp.float32), np.float64)
    vf = np.asarray(v.astype(jnp.float32), np.float64)
    idx = np.arange(T)
    mask = (np.asarray(kv_valid)[:, None, :] != 0) & (
        idx[None, None, :] <= np.asarray(qpos)[:, :, None]
    )  # (B, S, T)
    s = np.einsum("bshgd,bthd->bhgst", qg, kf) / np.sqrt(D)
    s = np.where(mask[:, None, None, :, :], s, -np.inf)
    m = s.max(-1, keepdims=True)
    any_key = np.isfinite(m)
    p = np.where(any_key, np.exp(s - np.where(any_key, m, 0.0)), 0.0)
    l = p.sum(-1, keepdims=True)
    out = np.einsum("bhgst,bthd->bhgsd", p, vf) / np.where(l == 0, 1.0, l)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, S, Hq, D)


@pytest.mark.parametrize("kv_dtype", [jnp.float32, jnp.bfloat16,
                                      jnp.float8_e4m3fn])
@pytest.mark.parametrize("S,T,block_k", [(1, 512, 128), (8, 640, 128),
                                         (4, 500, 128)])
def test_kernel_matches_dense(kv_dtype, S, T, block_k):
    rng = np.random.default_rng(0)
    B, Hq, Hkv, D = 1, 14, 2, 128
    q = jnp.asarray(rng.normal(size=(B, S, Hq, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, Hkv, D)), jnp.float32).astype(kv_dtype)
    v = jnp.asarray(rng.normal(size=(B, T, Hkv, D)), jnp.float32).astype(kv_dtype)
    valid = rng.random((B, T)) > 0.25  # holes (spec-decode invalidation)
    valid[:, :4] = True
    qpos = jnp.asarray(
        np.sort(rng.integers(8, T, size=(B, S)), axis=1).astype(np.int32)
    )
    out = decode_attention_gqa(
        q, k, v, qpos, jnp.asarray(valid), block_k=block_k, interpret=True
    )
    ref = _dense_reference(q, k, v, qpos, valid)
    tol = 3e-2 if kv_dtype == jnp.float8_e4m3fn else (
        8e-3 if kv_dtype == jnp.bfloat16 else 2e-5)
    np.testing.assert_allclose(np.asarray(out, np.float64), ref,
                               rtol=tol, atol=tol)


def test_no_attendable_key_row_emits_zero():
    rng = np.random.default_rng(1)
    B, S, Hq, Hkv, D, T = 1, 2, 4, 2, 128, 256
    q = jnp.asarray(rng.normal(size=(B, S, Hq, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, Hkv, D)).astype(np.float32))
    valid = np.zeros((B, T), bool)
    valid[:, 100:110] = True
    # query 0 sits BEFORE every valid column -> no key; query 1 sees them
    qpos = jnp.asarray([[10, 200]], jnp.int32)
    out = decode_attention_gqa(
        q, k, v, qpos, jnp.asarray(valid), block_k=128, interpret=True
    )
    out = np.asarray(out)
    assert np.all(out[0, 0] == 0.0)
    assert np.isfinite(out).all()
    ref = _dense_reference(q, k, v, qpos, valid)
    np.testing.assert_allclose(out[0, 1], ref[0, 1], rtol=2e-5, atol=2e-5)


def test_causal_attention_routes_to_kernel(monkeypatch):
    """causal_attention's long-decode branch dispatches to the Pallas
    kernel under impl=pallas + interpret, and matches the XLA chunked
    path on identical inputs."""
    rng = np.random.default_rng(2)
    B, S, Hq, Hkv, D, T = 1, 1, 4, 2, 128, 300
    q = jnp.asarray(rng.normal(size=(B, S, Hq, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, Hkv, D)).astype(np.float32))
    kv_mask = jnp.asarray(np.arange(T)[None, :] < 222)
    qpos = jnp.full((B, S), T, jnp.int32)
    kvpos = jnp.arange(T, dtype=jnp.int32)[None, :]
    monkeypatch.setenv("O3V_PALLAS_INTERPRET", "1")
    old_t = A.LONG_DECODE_T
    try:
        A.LONG_DECODE_T = 256
        ours = A.causal_attention(q, k, v, q_positions=qpos,
                                  kv_positions=kvpos, kv_mask=kv_mask,
                                  impl="pallas")
        chunked = A.causal_attention(q, k, v, q_positions=qpos,
                                     kv_positions=kvpos, kv_mask=kv_mask,
                                     impl="xla")
    finally:
        A.LONG_DECODE_T = old_t
    np.testing.assert_allclose(np.asarray(ours), np.asarray(chunked),
                               rtol=2e-5, atol=2e-5)


def test_fp8_bit_decode_recovers_exact_values():
    """The kernel's manual e4m3 bit-decode (shift into f32 fields + 2^120
    rebase / q-prescale) recovers the stored value EXACTLY for normals;
    denormals (|x| < 2^-6) flush to ZERO — the documented contract
    (module docstring): the rebase multiply reads an f32-denormal bit
    pattern and both TPU and XLA-CPU (FTZ) flush it. Pinned by making
    each query row attend exactly one valid column: the output IS that
    column's decoded v."""
    import jax

    # interesting e4m3fn values: +-denormal min/max, normal min/max, zero
    vals = np.array([2.0 ** -9, 7 * 2.0 ** -9, 2.0 ** -6, 448.0,
                     -2.0 ** -9, -448.0, 0.0, 1.5], np.float32)
    B, Hq, Hkv, D = 1, 2, 1, 128
    T = vals.size
    k = jnp.zeros((B, T, Hkv, D), jnp.float8_e4m3fn)
    v = jnp.asarray(
        np.tile(vals[None, :, None, None], (B, 1, Hkv, D))
    ).astype(jnp.float8_e4m3fn)
    # re-read what fp8 actually stored (quantization) as the expectation;
    # sub-normal magnitudes flush to (signed) zero in the kernel
    expect = np.asarray(v.astype(jnp.float32))[0, :, 0, 0]
    expect = np.where(np.abs(expect) < 2.0 ** -6, 0.0, expect)
    q = jnp.zeros((B, 1, Hq, D), jnp.float32)  # logits 0 -> weight on valid col
    for j, want in enumerate(expect):
        valid = np.zeros((B, T), np.int32)
        valid[:, j] = 1
        out = decode_attention_gqa(
            q, k, v, jnp.full((B, 1), T - 1, jnp.int32),
            jnp.asarray(valid), block_k=T, interpret=True,
        )
        got = float(np.asarray(out)[0, 0, 0, 0])
        assert got == float(want), (j, got, float(want))


def test_stacked_layer_matches_sliced(monkeypatch):
    """causal_attention(stacked_layer=i) on the full (L, B, T, Hkv, D)
    cache must equal the per-layer-slice call on every path — the stacked
    form exists so the Pallas decode kernel's operand is the carried
    buffer itself (see decode_attention_gqa docstring)."""
    rng = np.random.default_rng(5)
    L, B, S, Hq, Hkv, D, T = 3, 1, 1, 4, 2, 128, 320
    q = jnp.asarray(rng.normal(size=(B, S, Hq, D)).astype(np.float32))
    ks = jnp.asarray(rng.normal(size=(L, B, T, Hkv, D)).astype(np.float32))
    vs = jnp.asarray(rng.normal(size=(L, B, T, Hkv, D)).astype(np.float32))
    kv_mask = jnp.asarray(np.arange(T)[None, :] < 200)
    qpos = jnp.full((B, S), T, jnp.int32)
    kvpos = jnp.arange(T, dtype=jnp.int32)[None, :]
    monkeypatch.setenv("O3V_PALLAS_INTERPRET", "1")
    old_t = A.LONG_DECODE_T
    try:
        A.LONG_DECODE_T = 256  # force the long-decode dispatch
        for layer in range(L):
            stacked = A.causal_attention(
                q, ks, vs, q_positions=qpos, kv_positions=kvpos,
                kv_mask=kv_mask, impl="pallas", stacked_layer=layer,
            )
            sliced = A.causal_attention(
                q, ks[layer], vs[layer], q_positions=qpos,
                kv_positions=kvpos, kv_mask=kv_mask, impl="pallas",
            )
            np.testing.assert_allclose(
                np.asarray(stacked), np.asarray(sliced), rtol=0, atol=0
            )
            xla = A.causal_attention(
                q, ks, vs, q_positions=qpos, kv_positions=kvpos,
                kv_mask=kv_mask, impl="xla", stacked_layer=layer,
            )
            np.testing.assert_allclose(
                np.asarray(stacked), np.asarray(xla), rtol=2e-5, atol=2e-5
            )
    finally:
        A.LONG_DECODE_T = old_t
