"""Pallas flash attention vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_o3_video_tpu.ops.attention import causal_attention
from open_o3_video_tpu.ops.flash_attention import flash_attention_gqa


def _reference(q, k, v, q_pos, kv_valid):
    return causal_attention(
        q, k, v,
        q_positions=jnp.asarray(q_pos),
        kv_positions=jnp.arange(k.shape[1])[None, :].repeat(q.shape[0], 0),
        kv_mask=jnp.asarray(kv_valid, bool),
    )


@pytest.mark.parametrize(
    "B,Sq,T,Hq,Hkv,D",
    [
        (1, 16, 16, 4, 2, 64),     # prefill, GQA
        (2, 33, 33, 4, 4, 64),     # odd lengths -> padding path
        (1, 1, 48, 4, 2, 64),      # decode: 1 query vs cache
        (2, 16, 64, 8, 2, 128),    # decode-batch w/ longer cache
    ],
)
def test_matches_xla_attention(B, Sq, T, Hq, Hkv, D):
    rng = np.random.default_rng(0)
    q = rng.normal(0, 1, (B, Sq, Hq, D)).astype(np.float32)
    k = rng.normal(0, 1, (B, T, Hkv, D)).astype(np.float32)
    v = rng.normal(0, 1, (B, T, Hkv, D)).astype(np.float32)

    if Sq == T:
        q_pos = np.tile(np.arange(Sq)[None], (B, 1))
    else:
        # decode: queries sit at the end of the (partially valid) cache
        q_pos = np.tile(np.arange(T - Sq, T)[None], (B, 1))
    kv_valid = np.ones((B, T), dtype=np.int32)
    kv_valid[:, :3] = 0  # left padding

    ref = np.asarray(_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), q_pos, kv_valid))
    out = np.asarray(
        flash_attention_gqa(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(q_pos), jnp.asarray(kv_valid),
            block_q=16, block_k=16, interpret=True,
        )
    )
    # Queries with zero attendable keys differ by design (XLA path
    # self-attends to stay finite, flash emits zeros); both are pad slots
    # whose outputs are never read. Compare attendable queries only.
    attendable = q_pos >= 3  # first 3 kv slots are invalid left padding
    np.testing.assert_allclose(out[attendable], ref[attendable], atol=2e-5, rtol=2e-5)


def test_bf16_inputs():
    rng = np.random.default_rng(1)
    B, S, Hq, Hkv, D = 1, 32, 4, 2, 64
    q = jnp.asarray(rng.normal(0, 1, (B, S, Hq, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (B, S, Hkv, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (B, S, Hkv, D)), jnp.bfloat16)
    q_pos = jnp.tile(jnp.arange(S)[None], (B, 1))
    valid = jnp.ones((B, S), jnp.int32)

    out = flash_attention_gqa(q, k, v, q_pos, valid, block_q=16, block_k=16, interpret=True)
    ref = _reference(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
                     np.asarray(q_pos), np.asarray(valid))
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=2e-2, rtol=2e-2
    )


def test_fully_masked_rows_are_finite():
    rng = np.random.default_rng(2)
    B, S, H, D = 1, 16, 2, 64
    q = jnp.asarray(rng.normal(0, 1, (B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (B, S, H, D)), jnp.float32)
    q_pos = jnp.full((B, S), -1, jnp.int32)  # every query attends nothing
    valid = jnp.ones((B, S), jnp.int32)
    out = flash_attention_gqa(q, k, v, q_pos, valid, block_q=16, block_k=16, interpret=True)
    assert np.isfinite(np.asarray(out)).all()


def test_gradients_match_xla(monkeypatch):
    """Flash VJP vs autodiff through the XLA reference path."""
    rng = np.random.default_rng(5)
    B, S, Hq, Hkv, D = 2, 24, 4, 2, 64
    q = jnp.asarray(rng.normal(0, 1, (B, S, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (B, S, Hkv, D)), jnp.float32)
    q_pos = jnp.tile(jnp.arange(S)[None], (B, 1)).astype(jnp.int32)
    valid = np.ones((B, S), np.int32)
    valid[1, :2] = 0  # some padding in row 1
    valid = jnp.asarray(valid)
    # weights so the loss mixes all outputs nontrivially
    w = jnp.asarray(rng.normal(0, 1, (B, S, Hq, D)), jnp.float32)

    def loss_flash(q, k, v):
        out = flash_attention_gqa(q, k, v, q_pos, valid, block_q=8, block_k=16, interpret=True)
        return jnp.sum(out * w)

    def loss_xla(q, k, v):
        out = _reference(q, k, v, np.asarray(q_pos), np.asarray(valid))
        # zero out fully-masked pad queries to match the flash convention
        attendable = (np.asarray(q_pos) >= 0) & ~((np.arange(S)[None] < 2) & (np.arange(B)[:, None] == 1))
        out = out * jnp.asarray(attendable, jnp.float32)[:, :, None, None]
        return jnp.sum(out * w)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4,
                                   err_msg=name)


def test_gradients_decode_shape():
    """VJP with a longer KV buffer (training never hits this, but the rule
    must stay shape-consistent)."""
    rng = np.random.default_rng(6)
    B, Sq, T, H, D = 1, 8, 32, 2, 64
    q = jnp.asarray(rng.normal(0, 1, (B, Sq, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (B, T, H, D)), jnp.float32)
    q_pos = jnp.tile(jnp.arange(T - Sq, T)[None], (B, 1)).astype(jnp.int32)
    valid = jnp.ones((B, T), jnp.int32)

    def loss(q, k, v):
        return jnp.sum(flash_attention_gqa(q, k, v, q_pos, valid,
                                           block_q=8, block_k=16, interpret=True) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert grads[0].shape == q.shape
    assert grads[1].shape == k.shape
    assert grads[2].shape == v.shape
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)


def test_inference_vs_grad_forward_agree():
    """The inference forward (fixed-m softmax) and the differentiated
    forward (exact online max) must agree to f32 rounding on data whose
    logits sit far under the 60.0 clamp — i.e. always, with real inputs."""
    rng = np.random.default_rng(7)
    B, Sq, T, Hq, Hkv, D = 1, 24, 40, 4, 2, 16
    q = jnp.asarray(rng.normal(0, 1, (B, Sq, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (B, T, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (B, T, Hkv, D)), jnp.float32)
    q_pos = jnp.arange(T - Sq, T, dtype=jnp.int32)[None]
    valid = jnp.ones((B, T), jnp.int32)

    fast = flash_attention_gqa(q, k, v, q_pos, valid,
                               block_q=16, block_k=16, interpret=True)

    # jax.vjp runs the fwd_rule (exact online-max) for the primal value.
    exact, _ = jax.vjp(
        lambda q, k, v: flash_attention_gqa(
            q, k, v, q_pos, valid, block_q=16, block_k=16, interpret=True),
        q, k, v,
    )
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               rtol=2e-5, atol=2e-5)


def test_inference_forward_clamps_huge_logits_finite():
    """Logits beyond the 60.0 clamp (unreachable with real activations) must
    degrade to a finite, normalized output — never inf/nan."""
    rng = np.random.default_rng(3)
    B, Sq, T, H, D = 1, 8, 16, 2, 16
    q = jnp.asarray(100.0 * rng.normal(0, 1, (B, Sq, H, D)), jnp.float32)
    k = jnp.asarray(100.0 * rng.normal(0, 1, (B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (B, T, H, D)), jnp.float32)
    q_pos = jnp.arange(T - Sq, T, dtype=jnp.int32)[None]
    valid = jnp.ones((B, T), jnp.int32)
    out = flash_attention_gqa(q, k, v, q_pos, valid,
                              block_q=8, block_k=16, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out)).max() <= float(np.abs(np.asarray(v)).max()) + 1e-4
