"""Pipeline parallelism (parallel/pipeline.py): pipelined forward must equal
the sequential decoder, gradients must flow through the ppermute ring, and
the dryrun train step must run — all on the CPU device mesh (conftest forces
8 virtual devices)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, get_rope_index
from open_o3_video_tpu.models.qwen25vl import params as PM
from open_o3_video_tpu.models.qwen25vl.model import embed_tokens
from open_o3_video_tpu.models.qwen25vl.text import text_forward
from open_o3_video_tpu.parallel.pipeline import (
    dryrun_pipeline_step,
    pipeline_text_forward,
    shard_pipeline_params,
    stack_pipeline_params,
    unstack_pipeline_params,
)


def _setup(n_layers=4, B=4, S=10, seed=0):
    cfg = Qwen25VLConfig.tiny(dtype=jnp.float32)
    cfg = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, num_hidden_layers=n_layers)
    )
    params = PM.init(cfg, seed=seed)
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(5, 99, size=(B, S)))
    pos, _ = get_rope_index(cfg, np.asarray(ids))
    return cfg, params, ids, jnp.asarray(pos)


@pytest.mark.parametrize("n_stages,n_microbatches", [(2, 2), (4, 1), (4, 4)])
def test_pipeline_forward_matches_sequential(n_stages, n_microbatches):
    cfg, params, ids, pos = _setup()
    mesh = Mesh(np.asarray(jax.devices()[:n_stages]), axis_names=("pipe",))
    embeds = embed_tokens(params, ids)

    ref, _ = text_forward(params["text"], cfg.text, embeds, pos)
    stacked = shard_pipeline_params(
        stack_pipeline_params(params["text"]["layers"]), mesh
    )
    out = pipeline_text_forward(
        stacked, cfg.text, embeds, pos, mesh,
        n_microbatches=n_microbatches,
        final_norm=params["text"]["final_norm"],
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pipeline_gradients_match_sequential():
    cfg, params, ids, pos = _setup()
    mesh = Mesh(np.asarray(jax.devices()[:2]), axis_names=("pipe",))
    embeds = embed_tokens(params, ids)
    stacked = stack_pipeline_params(params["text"]["layers"])

    def pp_loss(stacked):
        out = pipeline_text_forward(
            shard_pipeline_params(stacked, mesh), cfg.text, embeds, pos, mesh,
            n_microbatches=2, final_norm=params["text"]["final_norm"],
        )
        return (out.astype(jnp.float32) ** 2).mean()

    def seq_loss(layers):
        out, _ = text_forward(
            dict(params["text"], layers=layers), cfg.text, embeds, pos
        )
        return (out.astype(jnp.float32) ** 2).mean()

    g_pp = jax.grad(pp_loss)(stacked)
    g_seq = stack_pipeline_params(
        [g for g in jax.grad(seq_loss)(params["text"]["layers"])]
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5
        ),
        g_pp,
        g_seq,
    )


def test_stack_unstack_roundtrip():
    _, params, _, _ = _setup(n_layers=3)
    layers = params["text"]["layers"]
    back = unstack_pipeline_params(stack_pipeline_params(layers))
    assert len(back) == 3
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        back,
        list(layers),
    )


def test_dryrun_pipeline_step_runs():
    loss = dryrun_pipeline_step(n_stages=2, n_microbatches=2)
    assert np.isfinite(loss)
