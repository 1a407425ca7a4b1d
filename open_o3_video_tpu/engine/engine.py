"""Batched inference engine: prefill + KV-cached decode with sampling.

The TPU replacement for the vLLM engine the reference wraps
(eval/models/model_vllm.py, eval/inference_example.py:15-29):

- requests are left-padded into static length buckets (shape stability ==
  one XLA program per bucket, reused across calls)
- vision towers run per-request as cached jitted programs (one per grid
  configuration); raw uint8 frames can upload in place of f32 patches with
  normalize+patchify fused on-device
- decode is ONE fused lax.while_loop device program for the whole
  completion, with early exit once every row has emitted EOS
- sampling: temperature / top-p / repetition-penalty 1.05 (vLLM semantics)
- EOS handling mirrors the reference trainer's mask-after-first-EOS
  (grpo_trainer.py:591-596)

Scale-out: pass a mesh — params are sharded by parallel.mesh rules (tensor
axis == vLLM tensor_parallel_size; fsdp == ZeRO-3) and XLA GSPMD inserts the
collectives.
"""

from __future__ import annotations

import dataclasses

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.qwen25vl import Qwen25VLConfig, get_rope_index
from ..models.qwen25vl.model import embed_tokens, encode_vision, merge_vision_embeddings
from ..models.qwen25vl.text import init_kv_cache, logits_from_hidden, text_forward
from ..ops.sampling import sample_token


@dataclasses.dataclass
class SamplingParams:
    """Defaults mirror the reference eval wrapper (model_vllm.py:27-33)."""

    temperature: float = 0.0
    top_p: float = 1.0
    repetition_penalty: float = 1.05
    max_tokens: int = 512
    seed: int = 0


@dataclasses.dataclass
class Request:
    input_ids: Sequence[int]
    pixel_patches: Optional[np.ndarray] = None  # (S_patches, patch_dim)
    grid_thw: Optional[np.ndarray] = None  # (num, 3)
    vision_token_id: Optional[int] = None
    second_per_grid_ts: Optional[Sequence[float]] = None
    # Alternative to pixel_patches for the frames-as-images hot path: raw
    # uint8 frames (T, C, H, W). Uploaded 8x smaller than f32 patches;
    # normalize+patchify runs on-device (ops/preprocess.patchify_device).
    frames: Optional[np.ndarray] = None


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds largest bucket {buckets[-1]}")


class InferenceEngine:
    def __init__(
        self,
        params: dict,
        cfg: Qwen25VLConfig,
        *,
        mesh=None,
        prompt_buckets: Sequence[int] = (512, 1024, 2048, 4096, 8192, 16384, 32768),
        cache_dtype=jnp.bfloat16,
    ):
        self.cfg = cfg
        self.mesh = mesh
        self.prompt_buckets = tuple(prompt_buckets)
        self.cache_dtype = cache_dtype
        if mesh is not None:
            from ..parallel.mesh import shard_params

            params = shard_params(params, mesh)
        self.params = params

        self._prefill = jax.jit(self._prefill_impl)
        self._vision_fns: dict = {}
        self._decode_loop = jax.jit(
            self._decode_loop_impl,
            static_argnames=("temperature", "top_p", "repetition_penalty", "max_tokens", "prompt_len"),
        )

    # ------------------------------------------------------------------ impl

    def _prefill_impl(self, params, embeds, position_ids, seq_positions, attn_valid, cache):
        hidden, cache = text_forward(
            params["text"],
            self.cfg.text,
            embeds,
            position_ids,
            seq_positions=seq_positions,
            attn_valid=attn_valid,
            cache=cache,
            cache_offset=0,
        )
        logits = logits_from_hidden(params["text"], hidden[:, -1:, :])[:, 0]
        return logits, cache

    def _decode_loop_impl(
        self,
        params,
        first_token,  # (B,)
        first_lp,  # (B,)
        mrope_next,  # (B,) decode m-rope position of the first generated token
        attn_valid,  # (B, T)
        cache,
        rng,
        seen_mask,  # (B, V) bool
        *,
        temperature: float,
        top_p: float,
        repetition_penalty: float,
        max_tokens: int,
        prompt_len: int,
    ):
        """One fused device program for the whole decode: lax.while_loop with
        early exit once every row has emitted EOS."""
        cfg = self.cfg
        B = first_token.shape[0]
        eos = cfg.eos_token_id
        tokens_buf = jnp.zeros((B, max_tokens), jnp.int32).at[:, 0].set(first_token)
        lp_buf = jnp.zeros((B, max_tokens), jnp.float32).at[:, 0].set(first_lp)
        done0 = first_token == eos

        def cond(state):
            step, done = state[0], state[5]
            return jnp.logical_and(step < max_tokens, ~jnp.all(done))

        def body(state):
            step, token, cache, seen_mask, attn_valid, done, rng, tokens_buf, lp_buf = state
            offset = prompt_len + step - 1  # buffer slot of `token`
            attn_valid = attn_valid.at[:, offset].set(True)
            embeds = embed_tokens(params, token[:, None])
            pos = mrope_next + (step - 1)
            position_ids = jnp.broadcast_to(pos[None, :, None], (3, B, 1))
            seq_pos = jnp.full((B, 1), offset, dtype=jnp.int32)
            hidden, cache = text_forward(
                params["text"],
                cfg.text,
                embeds,
                position_ids,
                seq_positions=seq_pos,
                attn_valid=attn_valid,
                cache=cache,
                cache_offset=offset,
            )
            logits = logits_from_hidden(params["text"], hidden[:, 0, :])
            rng, sub = jax.random.split(rng)
            nxt = sample_token(
                sub,
                logits,
                temperature=temperature,
                top_p=top_p,
                seen_mask=seen_mask,
                repetition_penalty=repetition_penalty,
            )
            lp = jax.nn.log_softmax(logits, axis=-1)[jnp.arange(B), nxt]
            nxt = jnp.where(done, cfg.pad_token_id, nxt)
            seen_mask = seen_mask.at[jnp.arange(B), nxt].set(True)
            tokens_buf = tokens_buf.at[:, step].set(jnp.where(done, cfg.pad_token_id, nxt))
            lp_buf = lp_buf.at[:, step].set(jnp.where(done, 0.0, lp))
            done = done | (nxt == eos)
            return (step + 1, nxt, cache, seen_mask, attn_valid, done, rng, tokens_buf, lp_buf)

        state = (jnp.asarray(1), first_token, cache, seen_mask, attn_valid, done0, rng, tokens_buf, lp_buf)
        state = jax.lax.while_loop(cond, body, state)
        return state[7], state[8], state[0]  # tokens, logprobs, n_steps

    def _frames_to_patches(self, frames: np.ndarray) -> jnp.ndarray:
        """uint8 (T, C, H, W) -> frames-as-images patches, on-device.

        Repeating each frame along the temporal-patch axis and patchifying
        as one grid_t=T video reproduces the per-frame image patch order
        exactly (each temporal group holds one frame twice)."""
        from ..ops.preprocess import patchify_device

        tps = self.cfg.vision.temporal_patch_size

        @jax.jit
        def convert(x):
            x = jnp.repeat(x, tps, axis=0)
            return patchify_device(
                x,
                patch_size=self.cfg.vision.patch_size,
                temporal_patch_size=tps,
                merge_size=self.cfg.vision.spatial_merge_size,
                out_dtype=self.cfg.dtype,
            )

        return convert(jnp.asarray(frames))

    # ----------------------------------------------------------------- public

    def generate(
        self,
        requests: Sequence[Request],
        sampling: Optional[SamplingParams] = None,
        return_logprobs: bool = False,
    ) -> list[dict[str, Any]]:
        """Generate completions for a batch of requests.

        Returns one dict per request: {"token_ids": list[int],
        "num_prompt_tokens": int, "logprobs": optional list[float]}.
        """
        sampling = sampling or SamplingParams()
        cfg = self.cfg
        B = len(requests)
        lens = [len(r.input_ids) for r in requests]
        L = _bucket(max(lens), self.prompt_buckets)
        T = L + sampling.max_tokens
        pad_id = cfg.pad_token_id

        ids = np.full((B, L), pad_id, dtype=np.int64)
        mask = np.zeros((B, L), dtype=np.int64)
        for i, r in enumerate(requests):
            ids[i, L - lens[i] :] = np.asarray(r.input_ids)
            mask[i, L - lens[i] :] = 1

        # Host-side 3D positions + next decode position per row.
        position_ids = np.ones((3, B, L), dtype=np.int64)
        next_pos = np.zeros(B, dtype=np.int64)
        for i, r in enumerate(requests):
            row_ids = ids[i : i + 1]
            row_mask = mask[i : i + 1]
            kw = {}
            if r.grid_thw is not None:
                key = (
                    "video_grid_thw"
                    if r.vision_token_id == cfg.video_token_id
                    else "image_grid_thw"
                )
                kw[key] = np.asarray(r.grid_thw)
                if r.second_per_grid_ts is not None:
                    kw["second_per_grid_ts"] = r.second_per_grid_ts
            pos, _ = get_rope_index(cfg, row_ids, attention_mask=row_mask, **kw)
            position_ids[:, i] = pos[:, 0]
            next_pos[i] = pos[:, 0, :].max() + 1

        # Causality stream = KV buffer slot index (left padding keeps buffer
        # order == sequence order); padded slots are excluded via attn_valid.
        seq_positions = np.broadcast_to(np.arange(L, dtype=np.int64), (B, L))

        # Embed + scatter vision features per request. Requests sharing the
        # same pixel data (e.g. the G rollout copies of one RL prompt) are
        # encoded once per call.
        embeds = embed_tokens(self.params, jnp.asarray(ids))
        vis_cache: dict = {}
        for i, r in enumerate(requests):
            if r.pixel_patches is None and r.frames is None:
                continue
            grid = np.asarray(r.grid_thw)
            grid_key = tuple(map(tuple, grid.tolist()))
            vis_key = (id(r.pixel_patches), id(r.frames), grid_key)
            vis = vis_cache.get(vis_key)
            if vis is None:
                if r.frames is not None:
                    patches_dev = self._frames_to_patches(r.frames)
                else:
                    patches_dev = jnp.asarray(r.pixel_patches)
                # One jitted vision program per grid configuration — the eager
                # path would issue hundreds of device dispatches per request.
                if grid_key not in self._vision_fns:
                    self._vision_fns[grid_key] = jax.jit(
                        lambda p, x, g=grid: encode_vision(p, cfg, x, g)
                    )
                vis = self._vision_fns[grid_key](self.params, patches_dev)
                vis_cache[vis_key] = vis
            row = merge_vision_embeddings(
                cfg,
                jnp.asarray(ids[i : i + 1]),
                embeds[i : i + 1],
                vis,
                r.vision_token_id or cfg.image_token_id,
            )
            embeds = embeds.at[i : i + 1].set(row)

        attn_valid = np.zeros((B, T), dtype=bool)
        attn_valid[:, :L] = mask.astype(bool)

        cache = init_kv_cache(cfg.text, B, T, dtype=self.cache_dtype)
        logits, cache = self._prefill(
            self.params,
            embeds,
            jnp.asarray(position_ids),
            jnp.asarray(seq_positions),
            jnp.asarray(attn_valid),
            cache,
        )

        # Token-presence mask for repetition penalty (prompt tokens count).
        seen = np.zeros((B, cfg.text.vocab_size), dtype=bool)
        for i in range(B):
            seen[i, ids[i][mask[i] == 1]] = True
        seen_mask = jnp.asarray(seen)

        rng = jax.random.PRNGKey(sampling.seed)
        rng, sub = jax.random.split(rng)
        first = sample_token(
            sub,
            logits,
            temperature=sampling.temperature,
            top_p=sampling.top_p,
            seen_mask=seen_mask,
            repetition_penalty=sampling.repetition_penalty,
        )
        first_lp = jax.nn.log_softmax(logits, axis=-1)[jnp.arange(B), first]
        seen_mask = seen_mask.at[jnp.arange(B), first].set(True)

        tokens_buf, lp_buf, _ = self._decode_loop(
            self.params,
            first.astype(jnp.int32),
            first_lp,
            jnp.asarray(next_pos),
            jnp.asarray(attn_valid),
            cache,
            rng,
            seen_mask,
            temperature=sampling.temperature,
            top_p=sampling.top_p,
            repetition_penalty=sampling.repetition_penalty,
            max_tokens=sampling.max_tokens,
            prompt_len=L,
        )
        tokens_np = np.asarray(tokens_buf)
        lp_np = np.asarray(lp_buf)

        eos = cfg.eos_token_id
        results = []
        for i in range(B):
            row = tokens_np[i].tolist()
            if eos in row:
                row = row[: row.index(eos) + 1]
            out: dict[str, Any] = {
                "token_ids": row,
                "num_prompt_tokens": lens[i],
            }
            if return_logprobs:
                out["logprobs"] = lp_np[i, : len(row)].tolist()
            results.append(out)
        return results
