"""Context (sequence) parallelism for long-context forwards.

The reference caps context at 16k-81k tokens on ONE device via token
budgeting + FlashAttention-2 (SURVEY.md §5.7; grpo_trainer.py:569-578,
inference_example.py:18). This module is the planned TPU-native extension
(SURVEY §2.4): shard the sequence dimension over a ``context`` mesh axis
(make_mesh(context=n)) so activation memory and attention work scale 1/n
per chip, with exact ring attention (ops/ring_attention.py) rotating KV
blocks over ICI.

Composition with the other axes is GSPMD-native: ``jax.shard_map`` is
manual ONLY over the context axis (``axis_names={axis}``); params keep
their fsdp/tensor shardings and XLA still inserts those collectives
automatically inside the region.

Use cases: scoring/prefill of 16k+ token sequences (GSPO logp passes, long
VideoMME prompts at 64 frames) where a single chip's activations would not
fit or the quadratic attention dominates.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.qwen25vl.text import logits_from_hidden, text_forward


def cp_text_forward(
    text_params: dict,
    text_cfg,
    inputs_embeds: jnp.ndarray,  # (B, S, D)
    position_ids: jnp.ndarray,  # (3, B, S) m-rope positions
    mesh: Mesh,
    *,
    attn_valid: Optional[jnp.ndarray] = None,  # (B, S) validity (left padding)
    remat: bool = False,
    axis: str = "context",
) -> jnp.ndarray:
    """Sequence-sharded decoder forward; returns final hidden (B, S, D).

    Everything in a decoder layer except attention is position-local, so the
    whole ``text_forward`` runs under one shard_map with the sequence dim
    split over ``axis`` and ``attn_impl="ring:<axis>"`` switching attention
    to the ppermute ring. Sequence positions are passed explicitly as GLOBAL
    positions (the local-default ``arange`` would restart per shard).
    """
    B, S, _ = inputs_embeds.shape
    n = mesh.shape[axis]
    assert S % n == 0, f"sequence length {S} must divide context={n}"
    seq_positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
    if attn_valid is None:
        attn_valid = jnp.ones((B, S), bool)

    def fwd(params, embeds, pos, seqp, valid):
        hidden, _ = text_forward(
            params,
            text_cfg,
            embeds,
            pos,
            seq_positions=seqp,
            attn_valid=valid,
            remat=remat,
            attn_impl=f"ring:{axis}",
        )
        return hidden

    return jax.shard_map(
        fwd,
        mesh=mesh,
        in_specs=(
            P(),  # params: manual over no axis (fsdp/tensor stay GSPMD-auto)
            P(None, axis, None),
            P(None, None, axis),
            P(None, axis),
            P(None, axis),
        ),
        out_specs=P(None, axis, None),
        axis_names={axis},
    )(text_params, inputs_embeds, position_ids, seq_positions, attn_valid)


def cp_per_token_logps(
    text_params: dict,
    text_cfg,
    inputs_embeds: jnp.ndarray,  # (B, S, D)
    position_ids: jnp.ndarray,  # (3, B, S)
    target_ids: jnp.ndarray,  # (B, S) token at each position (gather target)
    mesh: Mesh,
    *,
    attn_valid: Optional[jnp.ndarray] = None,
    axis: str = "context",
) -> jnp.ndarray:
    """log p(target_ids[t] | tokens <= t) with sequence-sharded compute.

    The CP analogue of the trainers' logp scoring (reference
    ``_get_per_token_logps``, grpo_trainer.py:371-384): the (B, S, vocab)
    logits tensor — the memory wall of long-sequence scoring — only ever
    exists sequence-sharded, (B, S/n, vocab) per device. NOTE: like the
    reference, the result at position t is the logp of the token AT t given
    tokens before t; callers shift by one as usual.
    """
    hidden = cp_text_forward(
        text_params, text_cfg, inputs_embeds, position_ids, mesh,
        attn_valid=attn_valid, axis=axis,
    )

    def score(params, hidden_blk, tgt_blk):
        logits = logits_from_hidden(params, hidden_blk)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return jnp.take_along_axis(logp, tgt_blk[..., None], axis=-1)[..., 0]

    return jax.shard_map(
        score,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(None, axis)),
        out_specs=P(None, axis),
        axis_names={axis},
    )(text_params, hidden, target_ids)
