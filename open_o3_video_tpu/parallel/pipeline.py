"""Pipeline parallelism (pp) for the text decoder: GPipe-style microbatch
streaming over a ``pipe`` mesh axis.

The reference has no pipeline parallelism (single-node ZeRO-3 only,
local_scripts/zero3.json); this is the TPU-native extension for models whose
per-layer weights outgrow even FSDP sharding (e.g. a 72B judge across
slices). The design is the SPMD schedule from the scaling playbook rather
than a torch-style per-stage process group:

- the L decoder layers are STACKED into one (L, ...) leaf per parameter and
  the leading axis is sharded over ``pipe`` — each chip holds L/n_stages
  contiguous layers;
- under ``shard_map`` every chip runs the same program: at schedule step t,
  stage s applies its local layers to microbatch ``t - s`` (garbage during
  fill/drain — the standard GPipe bubble), then ``ppermute``s its activation
  to stage s+1;
- the last stage accumulates results; one masked ``psum`` replicates the
  output. Everything is ``lax.scan``/``ppermute``/``where`` — fully
  differentiable, so one ``jax.grad`` gives pipelined backward for free
  (reverse-mode turns the forward ppermute ring into the backward ring).

Microbatches split the BATCH axis (the reference trains at 1 sample/device,
run_grpo_video.sh:11-15; batch microbatching is the shape-stable choice for
XLA — no sequence re-chunking, rope/cache semantics untouched).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.qwen25vl.text import _attention_layer, _mlp
from ..models.qwen25vl.vision import rms_norm
from ..models.qwen25vl.config import TextConfig
from ..ops.rope import mrope_cos_sin, mrope_cos_sin_interleaved


def stack_pipeline_params(layers: list) -> dict:
    """Stack a homogeneous per-layer param list into (L, ...) leaves.

    The leading axis is the pipeline axis; shard it with
    ``pipeline_param_specs`` so each chip materializes only its stage.
    """
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def unstack_pipeline_params(stacked: dict) -> list:
    """Inverse of :func:`stack_pipeline_params` (host-side, for export)."""
    n = jax.tree.leaves(stacked)[0].shape[0]
    return [jax.tree.map(lambda x: x[i], stacked) for i in range(n)]


def pipeline_param_specs(stacked: dict) -> dict:
    """PartitionSpec tree: leading (layer) axis over ``pipe``, rest whole."""
    return jax.tree.map(
        lambda x: P(*(["pipe"] + [None] * (x.ndim - 1))), stacked
    )


def shard_pipeline_params(stacked: dict, mesh: Mesh) -> dict:
    specs = pipeline_param_specs(stacked)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), stacked, specs
    )


def pipeline_text_forward(
    stacked: dict,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,  # (B, S, D)
    position_ids: jnp.ndarray,  # (3, B, S) m-rope positions
    mesh: Mesh,
    *,
    n_microbatches: int,
    final_norm: Optional[jnp.ndarray] = None,
    attn_impl: Optional[str] = None,
) -> jnp.ndarray:
    """Pipelined full-sequence decoder forward -> (B, S, D) hidden states.

    ``n_microbatches`` must divide the batch; more microbatches shrink the
    pipeline bubble (fraction (n_stages-1)/(M+n_stages-1)) at the cost of
    smaller per-step matmuls. ``final_norm`` optionally applies the final
    RMSNorm inside (replicated weights).
    """
    n_stages = mesh.shape["pipe"]
    B, S, D = inputs_embeds.shape
    M = n_microbatches
    assert B % M == 0, f"batch {B} not divisible by {M} microbatches"
    mb = B // M

    rope_fn = mrope_cos_sin_interleaved if cfg.mrope_interleaved else mrope_cos_sin
    cos, sin = rope_fn(position_ids, cfg.head_dim, cfg.mrope_section, cfg.rope_theta)
    cos = cos.astype(inputs_embeds.dtype)
    sin = sin.astype(inputs_embeds.dtype)
    seq_positions = jnp.arange(S)[None, :].repeat(mb, axis=0)

    def stage_program(local_layers, embeds, cos, sin):
        # local_layers: this stage's (L/n_stages, ...) slice of every leaf.
        stage = jax.lax.axis_index("pipe")
        perm = [(i, i + 1) for i in range(n_stages - 1)]

        def apply_layers(x, c, s):
            def layer_step(h, layer):
                hn = rms_norm(h, layer["input_norm"], cfg.rms_norm_eps)
                attn_out, _ = _attention_layer(
                    layer, cfg, hn, c, s, seq_positions,
                    None, None, 0, 0, attn_impl, None,
                )
                h = h + attn_out
                hn = rms_norm(h, layer["post_norm"], cfg.rms_norm_eps)
                return h + _mlp(layer, hn, cfg), None

            x, _ = jax.lax.scan(layer_step, x, local_layers)
            return x

        def sched_step(carry, t):
            recv, out_buf = carry
            m = t - stage  # microbatch this stage works on at step t
            mc = jnp.clip(m, 0, M - 1)
            start = mc * mb
            x_in = jnp.where(
                stage == 0,
                jax.lax.dynamic_slice_in_dim(embeds, start, mb, 0),
                recv,
            )
            c = jax.lax.dynamic_slice_in_dim(cos, start, mb, 0)
            s_ = jax.lax.dynamic_slice_in_dim(sin, start, mb, 0)
            y = apply_layers(x_in, c, s_)
            # Last stage banks microbatch m when it is real (not a bubble).
            write = (stage == n_stages - 1) & (m >= 0) & (m < M)
            cur = jax.lax.dynamic_slice_in_dim(out_buf, start, mb, 0)
            out_buf = jax.lax.dynamic_update_slice_in_dim(
                out_buf, jnp.where(write, y, cur), start, 0
            )
            y_send = jax.lax.ppermute(y, "pipe", perm) if perm else y
            return (y_send, out_buf), None

        init = (
            jnp.zeros((mb, S, D), embeds.dtype),
            jnp.zeros((B, S, D), embeds.dtype),
        )
        (_, out_buf), _ = jax.lax.scan(
            sched_step, init, jnp.arange(M + n_stages - 1)
        )
        # Replicate the last stage's buffer to every stage.
        out = jax.lax.psum(
            jnp.where(stage == n_stages - 1, out_buf, 0), "pipe"
        )
        return out

    specs = pipeline_param_specs(stacked)
    hidden = jax.shard_map(
        stage_program,
        mesh=mesh,
        in_specs=(specs, P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(stacked, inputs_embeds, cos, sin)
    if final_norm is not None:
        hidden = rms_norm(hidden, final_norm, cfg.rms_norm_eps)
    return hidden


def dryrun_pipeline_step(n_stages: int = 2, n_microbatches: int = 2) -> float:
    """One FULL pp train step (forward + backward through the ppermute ring +
    AdamW update) on a tiny decoder over a ``pipe``-axis mesh. Returns the
    loss; used by ``__graft_entry__.dryrun_multichip``."""
    import dataclasses

    import optax

    from ..models.qwen25vl import Qwen25VLConfig, get_rope_index
    from ..models.qwen25vl import params as PM
    from ..models.qwen25vl.model import embed_tokens
    from ..models.qwen25vl.text import logits_from_hidden

    cfg = Qwen25VLConfig.tiny(dtype=jnp.float32)
    cfg = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, num_hidden_layers=2 * n_stages)
    )
    params = PM.init(cfg, seed=2)
    mesh = Mesh(np.asarray(jax.devices()[:n_stages]), axis_names=("pipe",))

    stacked = shard_pipeline_params(
        stack_pipeline_params(params["text"]["layers"]), mesh
    )
    rest = {
        k: jax.device_put(v, NamedSharding(mesh, P()))
        for k, v in params["text"].items()
        if k != "layers"
    }

    rng = np.random.default_rng(3)
    B, S = 2 * n_microbatches, 12
    ids = jnp.asarray(rng.integers(5, 99, size=(B, S)))
    pos, _ = get_rope_index(cfg, np.asarray(ids))
    pos = jax.device_put(jnp.asarray(pos), NamedSharding(mesh, P()))
    ids = jax.device_put(ids, NamedSharding(mesh, P()))
    labels = jnp.roll(ids, -1, axis=-1)

    def loss_fn(stacked, rest, ids, pos, labels):
        embeds = embed_tokens({"text": rest}, ids)
        hidden = pipeline_text_forward(
            stacked, cfg.text, embeds, pos, mesh,
            n_microbatches=n_microbatches, final_norm=rest["final_norm"],
        )
        logits = logits_from_hidden(rest, hidden)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        return nll[:, :-1].mean()

    optimizer = optax.adamw(1e-5)
    opt_state = optimizer.init((stacked, rest))

    @jax.jit
    def train_step(stacked, rest, opt_state, ids, pos, labels):
        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            stacked, rest, ids, pos, labels
        )
        updates, opt_state = optimizer.update(grads, opt_state, (stacked, rest))
        stacked, rest = optax.apply_updates((stacked, rest), updates)
        return stacked, rest, opt_state, loss

    with mesh:
        stacked, rest, opt_state, loss = train_step(
            stacked, rest, opt_state, ids, pos, labels
        )
        loss.block_until_ready()
    return float(loss)
