"""Chunked lm_head logp scoring (per_token_logps_from_hidden): the RL/SFT
memory knob must be numerically invisible — values and gradients identical
to the dense log_softmax path (which itself mirrors the reference's row-wise
logp loop, grpo_trainer.py:371-384)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig
from open_o3_video_tpu.models.qwen25vl import params as P
from open_o3_video_tpu.models.qwen25vl.text import per_token_logps_from_hidden


@pytest.fixture(scope="module")
def setup():
    cfg = Qwen25VLConfig.tiny(dtype=jnp.float32)
    params = P.init(cfg, seed=0)
    rng = np.random.default_rng(3)
    B, S = 2, 13  # deliberately not a chunk multiple (exercises padding)
    D = cfg.text.hidden_size
    hidden = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, cfg.text.vocab_size, size=(B, S)))
    return params["text"], hidden, targets


@pytest.mark.parametrize("chunk", [4, 5, 13, 64])
def test_chunked_matches_dense(setup, chunk):
    text_params, hidden, targets = setup
    dense = per_token_logps_from_hidden(text_params, hidden, targets, None)
    chunked = per_token_logps_from_hidden(text_params, hidden, targets, chunk)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(dense),
                               rtol=1e-6, atol=1e-6)


def test_chunked_gradients_match_dense(setup):
    text_params, hidden, targets = setup

    def loss(h, chunk):
        return per_token_logps_from_hidden(text_params, h, targets, chunk).sum()

    g_dense = jax.grad(lambda h: loss(h, None))(hidden)
    g_chunk = jax.grad(lambda h: loss(h, 4))(hidden)
    np.testing.assert_allclose(np.asarray(g_chunk), np.asarray(g_dense),
                               rtol=1e-5, atol=1e-6)


def test_gspo_loss_chunked_matches_dense():
    """gspo_loss with logp_chunk/remat on == reference dense math."""
    from open_o3_video_tpu.train import gspo as G
    from open_o3_video_tpu.models.qwen25vl import get_rope_index

    cfg = Qwen25VLConfig.tiny(dtype=jnp.float32)
    params = P.init(cfg, seed=0)
    rng = np.random.default_rng(7)
    Lp, Lc, Gn = 6, 9, 2
    ids = rng.integers(5, 400, size=(Gn, Lp + Lc))
    pos, _ = get_rope_index(cfg, ids)
    attn = jnp.ones((Gn, Lp + Lc), bool)
    cmask = jnp.ones((Gn, Lc), jnp.int32)
    refs = jnp.asarray(rng.normal(-2, 0.5, (Gn, Lc)).astype(np.float32))
    adv = jnp.asarray(np.array([1.0, -1.0], np.float32))
    gcfg = G.GSPOConfig(beta=0.04)

    def run(**kw):
        loss, aux = G.gspo_loss(
            params, cfg, gcfg, jnp.asarray(ids), jnp.asarray(pos), attn,
            cmask, Lp, refs, adv, **kw,
        )
        return loss, aux["kl"]

    l0, k0 = run()
    l1, k1 = run(remat=True, logp_chunk=4)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    np.testing.assert_allclose(float(k1), float(k0), rtol=1e-6)
