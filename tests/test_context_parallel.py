"""Context (sequence) parallelism: ring attention + sequence-sharded forward.

The TPU-native long-context extension (SURVEY.md §2.4, §5.7) — the
reference has no CP, so these tests pin the extension against the
single-device paths it must agree with:

- ring_attention == causal_attention (XLA path) on GQA shapes with left
  padding, sharded 4-way over a context axis;
- cp_text_forward / cp_per_token_logps == text_forward on a mesh that
  composes context=4 with fsdp=2 (manual ring + GSPMD param sharding in
  one program).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, get_rope_index
from open_o3_video_tpu.models.qwen25vl import params as P_init
from open_o3_video_tpu.models.qwen25vl.model import embed_tokens
from open_o3_video_tpu.models.qwen25vl.text import text_forward
from open_o3_video_tpu.ops.attention import causal_attention
from open_o3_video_tpu.ops.ring_attention import ring_attention
from open_o3_video_tpu.parallel import make_mesh, shard_params
from open_o3_video_tpu.parallel.context import cp_per_token_logps, cp_text_forward


def _ring_vs_reference(B, S, Hq, Hkv, D, pad_lens, n_cp=4, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(0, 1, (B, S, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (B, S, Hkv, D)), jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
    valid = np.ones((B, S), bool)
    for i, p in enumerate(pad_lens):
        valid[i, :p] = False  # left padding
    valid = jnp.asarray(valid)

    ref = causal_attention(
        q, k, v, q_positions=positions, kv_positions=positions,
        kv_mask=valid, impl="xla",
    )

    mesh = make_mesh(data=1, fsdp=jax.device_count() // n_cp, tensor=1, context=n_cp)
    out = jax.shard_map(
        lambda *a: ring_attention(*a, axis_name="context"),
        mesh=mesh,
        in_specs=(
            P(None, "context"), P(None, "context"), P(None, "context"),
            P(None, "context"), P(None, "context"), P(None, "context"),
        ),
        out_specs=P(None, "context"),
        axis_names={"context"},
    )(q, k, v, positions, positions, valid)
    # Padding query rows diverge by design (ref: self-attention fallback,
    # ring: zeros) — both are never read; compare valid rows only.
    ref = np.asarray(ref)[np.asarray(valid)]
    out = np.asarray(out)[np.asarray(valid)]
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_ring_attention_matches_xla_gqa():
    _ring_vs_reference(B=2, S=64, Hq=8, Hkv=2, D=16, pad_lens=[0, 11])


def test_ring_attention_matches_xla_mha_unpadded():
    _ring_vs_reference(B=1, S=32, Hq=4, Hkv=4, D=8, pad_lens=[0])


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = Qwen25VLConfig.tiny(dtype=jnp.float32)
    params = P_init.init(cfg, seed=0)
    rng = np.random.default_rng(1)
    B, S = 2, 32
    ids = rng.integers(5, cfg.text.vocab_size, (B, S))
    mask = np.ones((B, S), np.int64)
    mask[1, :5] = 0  # left padding on row 1
    ids[1, :5] = cfg.pad_token_id
    pos, _ = get_rope_index(cfg, ids, attention_mask=mask)
    return cfg, params, ids, mask, pos


def test_cp_text_forward_matches_single_device(tiny_setup):
    cfg, params, ids, mask, pos = tiny_setup
    embeds = embed_tokens(params, jnp.asarray(ids))
    valid = jnp.asarray(mask, bool)

    ref, _ = text_forward(
        params["text"], cfg.text, embeds, jnp.asarray(pos),
        attn_valid=valid, attn_impl="xla",
    )

    mesh = make_mesh(data=1, fsdp=2, tensor=1, context=4)
    sharded = shard_params(params, mesh)
    out = jax.jit(
        lambda p, e, po, va: cp_text_forward(
            p["text"], cfg.text, e, po, mesh, attn_valid=va
        )
    )(sharded, embeds, jnp.asarray(pos), valid)

    ref_np = np.asarray(ref)[np.asarray(valid)]
    out_np = np.asarray(out)[np.asarray(valid)]
    np.testing.assert_allclose(out_np, ref_np, atol=5e-5, rtol=1e-4)


def test_cp_per_token_logps_matches_single_device(tiny_setup):
    cfg, params, ids, mask, pos = tiny_setup
    embeds = embed_tokens(params, jnp.asarray(ids))
    valid = jnp.asarray(mask, bool)
    targets = jnp.asarray(np.roll(ids, -1, axis=-1) % cfg.text.vocab_size)

    hidden, _ = text_forward(
        params["text"], cfg.text, embeds, jnp.asarray(pos),
        attn_valid=valid, attn_impl="xla",
    )
    from open_o3_video_tpu.models.qwen25vl.text import logits_from_hidden

    logp = jax.nn.log_softmax(logits_from_hidden(params["text"], hidden), axis=-1)
    ref = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]

    mesh = make_mesh(data=1, fsdp=2, tensor=1, context=4)
    sharded = shard_params(params, mesh)
    out = cp_per_token_logps(
        sharded["text"], cfg.text, embeds, jnp.asarray(pos), targets, mesh,
        attn_valid=valid,
    )
    ref_np = np.asarray(ref)[np.asarray(valid)]
    out_np = np.asarray(out)[np.asarray(valid)]
    np.testing.assert_allclose(out_np, ref_np, atol=5e-5, rtol=1e-4)


def test_make_mesh_context_axis_shape():
    mesh = make_mesh(data=1, fsdp=2, tensor=1, context=4)
    assert mesh.shape == {"data": 1, "fsdp": 2, "context": 4, "tensor": 1}
    # context=1 keeps the historical 3-axis layout
    mesh3 = make_mesh(data=2, fsdp=2, tensor=2)
    assert tuple(mesh3.axis_names) == ("data", "fsdp", "tensor")
