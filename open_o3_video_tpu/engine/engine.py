"""Batched inference engine: continuous batching over a persistent KV arena.

The TPU replacement for the vLLM engine the reference wraps
(eval/models/model_vllm.py, eval/inference_example.py:15-29). vLLM's two
core serving features are rebuilt XLA-first:

- **Persistent KV arena** (== paged KV): one (max_slots, T) cache per
  (slots, length) configuration lives on the engine across generate()
  calls; programs donate it so XLA updates in place instead of
  reallocating ~GBs per call.
- **Continuous batching** (== vLLM request admission): requests queue onto
  fixed decode slots; decode runs as fused while_loop SEGMENTS (default 64
  tokens) with early exit, and between segments finished slots are
  harvested and refilled from the queue — a straggler no longer stalls the
  whole wave, and arbitrarily many requests stream through max_slots rows.
- **Automatic prefix caching** (== vLLM enable_prefix_caching): requests
  sharing identical vision arrays and a long common token prefix (V-STAR's
  5 queries over one video, RL's G rollouts of one prompt, N TTS paths)
  prefill the shared prefix ONCE into a cached KV block; each request then
  admits only its suffix at a cache offset, with the prefix KV broadcast
  into its arena row.

Static-shape discipline: prompts are left-padded into length buckets (one
XLA program per bucket), every slot decodes at its own depth via per-row
cache offsets, and vision towers run as cached jitted programs per grid
configuration (requests sharing pixel data are encoded once per call).
Sampling: temperature / top-p / repetition-penalty 1.05 (vLLM semantics);
EOS handling mirrors the reference trainer's mask-after-first-EOS
(grpo_trainer.py:591-596).

Scale-out: pass a mesh — params are sharded by parallel.mesh rules (tensor
axis == vLLM tensor_parallel_size; fsdp == ZeRO-3) and XLA GSPMD inserts the
collectives.

Long context (the reference's 81920-token max_model_len contract,
eval/inference_example.py:18): prompts >= long_prefill_threshold always
prefill in chunks straight into the arena; ``cache_dtype=jnp.float8_e4m3fn``
halves KV HBM (an 81920-token arena drops ~4.7 -> ~2.4 GB, the difference
between fitting next to 9.5 GB of int8 weights on a 16 GB v5e or not);
``max_kv_gb`` caps concurrent decode slots to a KV budget.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import weakref

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.qwen25vl import Qwen25VLConfig, get_rope_index
from ..models.qwen25vl.model import (
    build_vision_row_index,
    embed_tokens,
    encode_vision,
    merge_vision_embeddings_by_index,
)
from ..models.qwen25vl.text import init_kv_cache, logits_from_hidden, text_forward
from ..ops.sampling import sample_token
from ..utils.profiling import StageTimer, trace_annotation


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
    # With ``frames``: resize them ON DEVICE to (h, w) before patchify
    # (PIL-bicubic parity, ops/resize.py). The host then uploads frames at
    # the DECODED resolution and never runs a resample kernel; grid_thw
    # must describe the (h, w) geometry.
    resize_hw: Optional[tuple] = None
    # Precomputed text-space vision features (n_tokens, hidden): scattered
    # at the placeholder positions verbatim, bypassing the in-engine vision
    # tower. The Aria path (its Idefics3 tower + projector run as their own
    # jitted program) and any caller with externally encoded features.
    vision_embeds: Optional[Any] = None


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
        prompt_buckets: Sequence[int] = (
            512, 1024, 2048, 4096, 8192, 16384, 32768, 49152, 65536, 81920,
        ),
        cache_dtype=jnp.bfloat16,
        max_slots: int = 8,
        decode_segment: int = 64,
        decode_attn_impl: Optional[str] = "auto",
        prefill_chunk: Optional[int] = None,
        batch_axis: Optional[str] = None,
        prefix_cache_min: int = 256,
        suffix_buckets: Sequence[int] = (64, 128, 256, 512, 1024),
        prefix_cache_entries: int = 4,
        long_prefill_threshold: int = 32768,
        long_prefill_chunk: int = 8192,
        max_kv_gb: Optional[float] = None,
        a8_prefill: Optional[bool] = None,
        spec_decode: Optional[bool] = None,
        spec_draft: Optional[int] = None,
        spec_sample: Optional[bool] = None,
        spec_surplus: Optional[int] = None,
        rollout_shard_axis: Optional[str] = None,
    ):
        self.cfg = cfg
        self.mesh = mesh
        self.prompt_buckets = tuple(prompt_buckets)
        self.cache_dtype = cache_dtype
        self.max_slots = max_slots
        self.decode_segment = decode_segment
        self.decode_attn_impl = decode_attn_impl
        # Chunked prefill (vLLM semantics): split long-prompt admissions
        # into chunks of this many tokens and run a decode segment for the
        # ACTIVE slots between chunks, so a 16k-token admission no longer
        # stalls in-flight decodes for its whole prefill. None = off.
        self.prefill_chunk = prefill_chunk
        # The 81920-token serving envelope (reference
        # eval/inference_example.py:18 max_model_len=81920): prompts at or
        # above ``long_prefill_threshold`` ALWAYS prefill in
        # ``long_prefill_chunk``-token chunks (even with no in-flight
        # decodes) — a monolithic 80k prefill's MLP transients alone are
        # ~6 GB at 7B dims, which cannot sit next to 9.5 GB of int8
        # weights + a ~5 GB KV row on a 16 GB chip.
        self.long_prefill_threshold = long_prefill_threshold
        self.long_prefill_chunk = long_prefill_chunk
        # KV HBM budget: caps concurrently decoding slots per group so
        # (slots x T) KV never exceeds this many GB — the vLLM
        # gpu_memory_utilization analog. Excess requests queue; None = no
        # cap (the pre-existing behavior).
        self.max_kv_gb = max_kv_gb
        # w8a8 prefill: trace the COMPUTE-BOUND programs (admission/prefill/
        # vision encode) with int8 activations so QuantizedLinear matmuls run
        # on the MXU's 2x int8 path (ops/quant.py a8_acts). Decode stays
        # w8-bf16 — it is HBM-bound, so a8 would change numerics for no
        # speed. No-op unless the params are int8-quantized. Env default
        # O3V_A8 (off): quality-gated by the bench's teacher-forced
        # agreement check before being defaulted on.
        if a8_prefill is None:
            a8_prefill = os.environ.get("O3V_A8", "0") == "1"
        self.a8_prefill = bool(a8_prefill)
        # Prompt-lookup speculative decoding (bs=1, greedy): each decode
        # step verifies a draft_k-token draft continued from the most
        # recent n-gram match in the prompt+generated history. Acceptance
        # replicates the sequential sampler exactly (penalty-adjusted
        # argmax, seen-set order, eos/budget truncation) — in exact
        # arithmetic outputs are bit-identical to the plain path (pinned in
        # f32, tests/test_spec_decode.py). On bf16 hardware the multi-token
        # verify reduces in a different order than the S=1 step, so argmax
        # near-ties can resolve differently (inherent to all speculative
        # decoders). Measured on v5e 28L int8: a (draft_k+1)-token verify
        # step costs ~1.02x a single decode step (weight-HBM-bound), so
        # throughput scales with mean(accepted+1). Single-row greedy groups
        # only. Env default O3V_SPEC.
        if spec_decode is None:
            spec_decode = os.environ.get("O3V_SPEC", "0") == "1"
        self.spec_decode = bool(spec_decode)
        if spec_draft is None:
            spec_draft = int(os.environ.get("O3V_SPEC_DRAFT", "7"))
        self.spec_draft = int(spec_draft)
        # Multi-row SAMPLED speculative decoding (_segment_spec_sample_impl):
        # verify blocks at shared columns with per-row validity holes;
        # distributionally exact for any temperature (sample-and-match ==
        # optimal rejection sampling for deterministic drafts), but a
        # different rng stream than the plain path. Built for GSPO rollouts
        # (G generations x temperature 1). Applies to single-wave groups
        # (every request bound in the first admission round). Env default
        # O3V_SPEC_SAMPLE; spec_surplus = extra KV columns burned by
        # rejected drafts before falling back to the plain ring path.
        if spec_sample is None:
            spec_sample = os.environ.get("O3V_SPEC_SAMPLE", "0") == "1"
        self.spec_sample = bool(spec_sample)
        if spec_surplus is None:
            spec_surplus = int(os.environ.get("O3V_SPEC_SURPLUS", "1024"))
        self.spec_surplus = int(spec_surplus)
        # Acceptance probe: the FIRST spec segment of a group is capped at
        # spec_probe emitted tokens/row; if it measures fewer than
        # spec_min_rate tokens per verify per row, speculation is disabled
        # for the rest of the group and decode finishes on the plain path.
        # Rationale (v5e, 7B int8, B=4): a (B, K1=8) verify forward costs
        # ~1.2x a plain decode step, so drafts with acceptance ~0 (e.g.
        # near-uniform sampling at random init, or prose with no repeated
        # structure) make the spec loop ~2x SLOWER than plain — the r4
        # surplus-exhaustion fallback used to bound that by accident; the
        # probe bounds it by design. 1.35 = break-even (~1.2) + margin for
        # compaction amortization.
        self.spec_probe = int(os.environ.get("O3V_SPEC_PROBE", "48"))
        self.spec_min_rate = float(os.environ.get("O3V_SPEC_MIN_RATE", "1.35"))
        # Prompt-lookup acceptance is BACK-LOADED: a fresh generation has
        # no self-repetition for its first few sentences (measured on the
        # STGR-style replay trace: ~0 accepted drafts in the first ~48
        # tokens, ~2.1/row later), so probing from token 0 wrongly reverts
        # groups that would speculate well. The first spec_warmup tokens
        # of a spec group therefore run the PLAIN path (zero overhead —
        # plain is the safe default and the same compiled program as the
        # full-length run via its dynamic step cap) and the probe measures
        # the window AFTER the trace has had a chance to build structure.
        self.spec_warmup = int(os.environ.get("O3V_SPEC_WARMUP", "48"))
        # Cumulative spec telemetry: tokens emitted per verify forward =
        # emitted / verify_steps (1.0 = no drafts accepted);
        # probe_disabled = groups where the acceptance probe reverted to
        # the plain path.
        self.spec_stats = {"verify_steps": 0, "emitted": 0, "probe_disabled": 0}
        # DP fleet mode: shard the slot-row dimension of every batch array
        # over this mesh axis, so each chip decodes its own rows — the
        # TPU-native replacement for the reference's process-per-GPU eval
        # fleet (test_vstar_multi_images.py:621-693), composing with
        # fsdp/tensor param sharding in the same programs. Scheduling turns
        # wave-based (admit all slots together, decode a wave to completion)
        # so every program keeps the full static row count.
        self._dp = batch_axis is not None
        self.batch_axis = batch_axis
        if self._dp:
            assert mesh is not None, "batch_axis requires a mesh"
            assert batch_axis in mesh.axis_names, f"no mesh axis {batch_axis!r}"
            assert jax.process_count() == 1, (
                "DP fleet mode is single-controller; use the SPMD multi-host "
                "mode for cross-process meshes"
            )
            assert max_slots % mesh.shape[batch_axis] == 0, (
                f"max_slots={max_slots} must divide over "
                f"{batch_axis}={mesh.shape[batch_axis]}"
            )
            # Chunked prefill composes with DP fleet mode: admissions are
            # full waves, so chunks write the row-sharded arena directly
            # (no interleaved decode between chunks — that benefit is
            # per-slot and does not exist wave-scheduled, but the memory
            # ceiling from long_prefill_threshold does).
        # Rollout row sharding (GSPO): shard the slot-row dimension of the
        # decode-state arrays (token/attn_valid/seen/arena/...) over this
        # mesh axis while keeping the DEFAULT slot scheduling — the middle
        # ground between replicated SPMD lockstep (every device redundantly
        # computes all B*G rollouts; the r4 inefficiency) and full DP fleet
        # wave scheduling. Each device then decodes only its row shard of
        # the hot 768-step rollout loop (GSPMD keeps row-wise ops sharded
        # and inserts collectives only for the scalar loop controls), which
        # is the reference's per-rank rollout DP (run_grpo_video.sh:11-15)
        # expressed as sharding. Host reads go through _fetch(), which
        # re-replicates non-addressable arrays; host control flow is
        # unchanged, so multi-host lockstep is preserved. Groups whose row
        # count does not divide the axis fall back to replicated per array
        # AND arena together (one _row_axis rule decides both).
        self.rollout_shard_axis = rollout_shard_axis
        if rollout_shard_axis is not None:
            assert mesh is not None, "rollout_shard_axis requires a mesh"
            assert rollout_shard_axis in mesh.axis_names, (
                f"no mesh axis {rollout_shard_axis!r}"
            )
            assert not self._dp, "rollout_shard_axis is exclusive with DP fleet mode"
        self._replicate_fn = None
        self.last_rollout_layout = None  # debug/telemetry: set per generate()
        if mesh is not None:
            from ..parallel.mesh import shard_params

            params = shard_params(params, mesh)

        # Automatic prefix caching: a common prefix shorter than this is not
        # worth the extra program launch; 0/None disables detection.
        self.prefix_cache_min = prefix_cache_min or 0
        self.suffix_buckets = tuple(suffix_buckets)
        self.prefix_cache_entries = prefix_cache_entries
        # prefix key -> {"k","v" (layers,1,P_b,..), "valid" (P_b,) np}.
        # LRU-bounded; keys are (prefix tokens, vision content digests).
        from collections import OrderedDict

        self._prefix_kv: "OrderedDict[tuple, dict]" = OrderedDict()
        # id(array) -> (sha1 digest, strong ref) memo for _vis_digest.
        self._vis_digests: "OrderedDict[int, tuple]" = OrderedDict()
        self._vis_obj_counter = 0
        self.params = params

        self._vision_fns: dict = {}
        self._arenas: dict = {}  # (n_slots, T) -> {"k","v"} persistent cache
        # Per-stage wall clock (SURVEY §5.1 — the reference had only ad-hoc
        # prints); read/reset via engine.timer.report() (bench.py surfaces it).
        self.timer = StageTimer()

        # Multi-host SPMD mode: with a mesh spanning processes, every host
        # runs the SAME schedule on the SAME (replicated) inputs — rollout
        # arrays are global replicated arrays, host-read outputs stay
        # replicated, and host control flow is deterministic, so the fleet
        # stays in jit lockstep (the multi-host GSPO rollout story).
        self._spmd = mesh is not None and jax.process_count() > 1

        def _first_impl(rng, logits, seen_mask, *, temperature, top_p,
                        repetition_penalty):
            tok = sample_token(
                rng, logits, temperature=temperature, top_p=top_p,
                seen_mask=seen_mask, repetition_penalty=repetition_penalty,
            )
            lp = jax.nn.log_softmax(logits, axis=-1)[
                jnp.arange(logits.shape[0]), tok
            ]
            return tok, lp

        self._first_sample = jax.jit(
            _first_impl,
            static_argnames=("temperature", "top_p", "repetition_penalty"),
        )
        # Host-prep programs are cached ONCE per engine: a fresh jit wrapper
        # per call would re-trace every request, and each eager op in the
        # prep path is a full round trip on a tunneled TPU.
        self._patchify_fn = jax.jit(self._patchify_impl)
        # Batched variants: N same-shape videos ride ONE host->device
        # transfer and ONE dispatch (tuple output = one round trip). On a
        # tunneled/remote backend each extra round trip costs whole
        # milliseconds (and ~100+ ms once the relay degrades after the
        # first scan-bearing program runs), so per-request puts dominate
        # vis_upload without this.
        self._patchify_batch_fn = jax.jit(
            lambda x: tuple(jax.vmap(self._patchify_impl)(x))
        )
        # Device-resize variants (Request.resize_hw): PIL-parity bicubic as
        # two matmuls fused into the normalize+patchify program. jit keys
        # on the (in, out) shape pair via the weight-matrix arguments.
        self._resize_patchify_fn = jax.jit(self._resize_patchify_impl)
        self._resize_w_cache: dict = {}  # (in_hw, out_hw) -> device weights
        self._resize_patchify_batch_fn = jax.jit(
            lambda x, wh, ww: tuple(
                jax.vmap(self._resize_patchify_impl, in_axes=(0, None, None))(
                    x, wh, ww
                )
            )
        )
        self._split_rows_fn = jax.jit(lambda x: tuple(x))
        self._embed_fn = jax.jit(lambda p, ids: embed_tokens(p, ids))
        self._embed_merge_fn = jax.jit(
            lambda p, ids, vis, row_index: merge_vision_embeddings_by_index(
                embed_tokens(p, ids), vis, row_index
            )
        )

        # Compute-bound (prefill-side) programs optionally trace under w8a8;
        # functools.wraps keeps the signature so donate_argnames resolve.
        def _a8(fn):
            if not self.a8_prefill:
                return fn
            from ..ops.quant import a8_acts

            @functools.wraps(fn)
            def wrapped(*args, **kwargs):
                with a8_acts(True):
                    return fn(*args, **kwargs)

            return wrapped

        self._a8_wrap = _a8

        # Donation lets XLA reuse the arena/state buffers in place; the CPU
        # backend does not implement donation and would warn per call.
        donate = jax.default_backend() != "cpu"
        out_kw = {}
        if self._spmd:
            # Host-read outputs (and the arena) stay fully replicated so
            # every host can fetch its addressable copy.
            from jax.sharding import NamedSharding, PartitionSpec as P_

            out_kw["out_shardings"] = NamedSharding(mesh, P_())
        self._admit = jax.jit(
            _a8(self._admit_impl),
            donate_argnames=("arena_k", "arena_v") if donate else (),
            **out_kw,
        )
        self._admit_full = jax.jit(
            _a8(self._admit_full_impl),
            donate_argnames=("arena_k", "arena_v") if donate else (),
            **out_kw,
        )
        if self._dp and not out_kw:
            # Prefix KV blocks are gathered per ROW at wave admission, so
            # they must come out replicated (params are fsdp/tensor-sharded
            # and GSPMD would otherwise pick a head sharding).
            from jax.sharding import NamedSharding, PartitionSpec as P_

            prefix_out_kw = {"out_shardings": NamedSharding(mesh, P_())}
        else:
            prefix_out_kw = out_kw
        self._prefill_prefix = jax.jit(_a8(self._prefill_prefix_impl), **prefix_out_kw)
        self._admit_suffix = jax.jit(
            _a8(self._admit_suffix_impl),
            donate_argnames=("arena_k", "arena_v") if donate else (),
            **out_kw,
        )
        self._admit_suffix_full = jax.jit(
            _a8(self._admit_suffix_full_impl),
            donate_argnames=("arena_k", "arena_v") if donate else (),
            **out_kw,
        )
        self._prefill_chunk_fn = jax.jit(
            _a8(self._prefill_chunk_impl),
            donate_argnames=("rows_k", "rows_v") if donate else (),
            **out_kw,
        )
        self._scatter_rows = jax.jit(
            self._scatter_rows_impl,
            donate_argnames=("arena_k", "arena_v") if donate else (),
            **out_kw,
        )
        self._segment = jax.jit(
            self._segment_impl,
            static_argnames=("temperature", "top_p", "repetition_penalty",
                             "n_steps", "prompt_len"),
            donate_argnames=(
                ("arena_k", "arena_v", "seen", "attn_valid",
                 "mrope_cur", "remaining", "done")
                if donate
                else ()
            ),
            **out_kw,
        )
        self._segment_spec = jax.jit(
            self._segment_spec_impl,
            static_argnames=("temperature", "top_p", "repetition_penalty",
                             "n_steps", "prompt_len", "draft_k"),
            donate_argnames=(
                ("arena_k", "arena_v", "seen", "attn_valid",
                 "mrope_cur", "remaining", "done", "hist")
                if donate
                else ()
            ),
            **out_kw,
        )
        self._segment_spec_sample = jax.jit(
            self._segment_spec_sample_impl,
            static_argnames=("temperature", "top_p", "repetition_penalty",
                             "n_steps", "prompt_len", "draft_k", "replay"),
            donate_argnames=(
                ("arena_k", "arena_v", "seen", "attn_valid",
                 "mrope_cur", "remaining", "done", "hist", "hcount", "kv_pos")
                if donate
                else ()
            ),
            **out_kw,
        )
        self._bind = jax.jit(
            self._bind_impl,
            donate_argnames=(
                ("token", "mrope_cur", "remaining", "done", "attn_valid", "seen")
                if donate
                else ()
            ),
            **out_kw,
        )
        self._bind_full = jax.jit(
            self._bind_full_impl,
            donate_argnames=("seen_rows",) if donate else (),
            **out_kw,
        )
        self._spec_compact = jax.jit(
            self._spec_compact_impl,
            static_argnames=("prompt_len",),
            donate_argnames=(
                ("arena_k", "arena_v", "attn_valid", "kv_pos")
                if donate
                else ()
            ),
            **out_kw,
        )

    # ------------------------------------------------------------------ impl

    @property
    def params(self):
        return self._params

    @params.setter
    def params(self, value):
        """Swapping serving weights invalidates the prefix-KV cache: a
        cached prefix block computed under OLD params would otherwise serve
        suffix admissions after a GSPO optimizer step (the trainer reassigns
        engine.params every step, train/gspo.py), silently mixing old- and
        new-policy KV into the rollout."""
        stale = getattr(self, "_params", None) is not value
        self._params = value
        if stale:
            self._prefix_kv.clear()

    def _admit_impl(self, params, embeds, position_ids, seq_positions,
                    attn_valid_rows, arena_k, arena_v, slots,
                    deepstack=None, ds_row_index=None):
        """Prefill ``n`` new rows and scatter their KV into arena slots.

        embeds (n, L, D); attn_valid_rows (n, T); slots (n,). Returns
        (next-token logits (n, V), arena_k, arena_v)."""
        cfg = self.cfg
        n = embeds.shape[0]
        T = arena_k.shape[2]
        cache = init_kv_cache(cfg.text, n, T, dtype=arena_k.dtype)
        hidden, cache = text_forward(
            params["text"],
            cfg.text,
            embeds,
            position_ids,
            seq_positions=seq_positions,
            attn_valid=attn_valid_rows,
            cache=cache,
            cache_offset=0,
            deepstack_embeds=deepstack,
            deepstack_row_index=ds_row_index,
        )
        logits = logits_from_hidden(params["text"], hidden[:, -1:, :])[:, 0]
        arena_k = arena_k.at[:, slots].set(cache["k"])
        arena_v = arena_v.at[:, slots].set(cache["v"])
        return logits, arena_k, arena_v

    def _admit_full_impl(self, params, embeds, position_ids, seq_positions,
                         attn_valid_rows, arena_k, arena_v,
                         deepstack=None, ds_row_index=None):
        """Prefill ALL slot rows at once, writing the arena directly.

        The DP-fleet admission path: a full wave replaces every slot, so the
        arena update is a plain dynamic_update_slice at offset 0 — no
        per-slot scatter for GSPMD to sequentialize over the row-sharded
        arena."""
        cfg = self.cfg
        hidden, cache = text_forward(
            params["text"],
            cfg.text,
            embeds,
            position_ids,
            seq_positions=seq_positions,
            attn_valid=attn_valid_rows,
            cache={"k": arena_k, "v": arena_v},
            cache_offset=0,
            deepstack_embeds=deepstack,
            deepstack_row_index=ds_row_index,
        )
        logits = logits_from_hidden(params["text"], hidden[:, -1:, :])[:, 0]
        return logits, cache["k"], cache["v"]

    def _prefill_prefix_impl(self, params, embeds, position_ids, seq_positions,
                             attn_valid_rows, deepstack=None, ds_row_index=None):
        """Prefill a SHARED prompt prefix once -> its (layers, 1, P_b, ..)
        KV block, cached and broadcast into every sharer's arena row at
        suffix admission (vLLM automatic-prefix-caching semantics)."""
        cfg = self.cfg
        P_len = embeds.shape[1]
        cache = init_kv_cache(cfg.text, embeds.shape[0], P_len, dtype=self.cache_dtype)
        _, cache = text_forward(
            params["text"],
            cfg.text,
            embeds,
            position_ids,
            seq_positions=seq_positions,
            attn_valid=attn_valid_rows,
            cache=cache,
            cache_offset=0,
            deepstack_embeds=deepstack,
            deepstack_row_index=ds_row_index,
        )
        return cache["k"], cache["v"]

    def _admit_suffix_impl(self, params, embeds, position_ids, seq_positions,
                           attn_valid_rows, arena_k, arena_v, slots,
                           prefix_k, prefix_v):
        """Prefill ``n`` suffix rows on top of a shared prefix KV block.

        The prefix block (layers, 1, P_len, H, D) is broadcast into a fresh
        (n, T) rows cache at columns [0, P_len); the suffix prefills at
        cache_offset=P_len, attending over prefix+suffix via attn_valid
        (column index == kv position, so causality holds across the seam).
        """
        cfg = self.cfg
        n = embeds.shape[0]
        T = arena_k.shape[2]
        P_len = prefix_k.shape[2]
        rows = init_kv_cache(cfg.text, n, T, dtype=arena_k.dtype)
        bshape = (prefix_k.shape[0], n) + prefix_k.shape[2:]
        rows_k = rows["k"].at[:, :, :P_len].set(
            jnp.broadcast_to(prefix_k, bshape).astype(rows["k"].dtype)
        )
        rows_v = rows["v"].at[:, :, :P_len].set(
            jnp.broadcast_to(prefix_v, bshape).astype(rows["v"].dtype)
        )
        hidden, cache = text_forward(
            params["text"],
            cfg.text,
            embeds,
            position_ids,
            seq_positions=seq_positions,
            attn_valid=attn_valid_rows,
            cache={"k": rows_k, "v": rows_v},
            cache_offset=P_len,
        )
        logits = logits_from_hidden(params["text"], hidden[:, -1:, :])[:, 0]
        arena_k = arena_k.at[:, slots].set(cache["k"])
        arena_v = arena_v.at[:, slots].set(cache["v"])
        return logits, arena_k, arena_v

    def _admit_suffix_full_impl(self, params, embeds, position_ids, seq_positions,
                                attn_valid_rows, arena_k, arena_v,
                                prefix_k_table, prefix_v_table, row_prefix_idx):
        """DP-fleet wave admission over shared prefixes: EVERY slot row is
        replaced, its prefix KV gathered per row from a replicated table of
        the wave's unique prefix blocks ((n_p, layers, 1, P, H, D)), then
        all suffixes prefill at cache_offset=P directly into the arena.
        Rows with no prefix (wave padding) gather block 0 but mask it out
        via attn_valid."""
        cfg = self.cfg
        P_len = prefix_k_table.shape[3]

        def seed(arena, table):
            pk = table[row_prefix_idx][:, :, 0]  # (B, layers, P, H, D)
            pk = jnp.moveaxis(pk, 0, 1)  # (layers, B, P, H, D)
            return arena.at[:, :, :P_len].set(pk.astype(arena.dtype))

        hidden, cache = text_forward(
            params["text"],
            cfg.text,
            embeds,
            position_ids,
            seq_positions=seq_positions,
            attn_valid=attn_valid_rows,
            cache={"k": seed(arena_k, prefix_k_table),
                   "v": seed(arena_v, prefix_v_table)},
            cache_offset=P_len,
        )
        logits = logits_from_hidden(params["text"], hidden[:, -1:, :])[:, 0]
        return logits, cache["k"], cache["v"]

    def _prefill_chunk_impl(self, params, embeds, position_ids, seq_positions,
                            attn_valid_rows, rows_k, rows_v, offset,
                            deepstack=None, ds_row_index=None):
        """One prefill chunk into a per-admission rows cache.

        ``offset`` is traced, so one program serves every chunk of a
        prompt; the returned logits are the last position's (only the final
        chunk's are consumed). ``ds_row_index`` is pre-sliced to the chunk
        (deepstack injection is positionwise)."""
        cfg = self.cfg
        hidden, cache = text_forward(
            params["text"],
            cfg.text,
            embeds,
            position_ids,
            seq_positions=seq_positions,
            attn_valid=attn_valid_rows,
            cache={"k": rows_k, "v": rows_v},
            cache_offset=offset,
            deepstack_embeds=deepstack,
            deepstack_row_index=ds_row_index,
        )
        logits = logits_from_hidden(params["text"], hidden[:, -1:, :])[:, 0]
        return logits, cache["k"], cache["v"]

    def _scatter_rows_impl(self, arena_k, arena_v, rows_k, rows_v, slots):
        return arena_k.at[:, slots].set(rows_k), arena_v.at[:, slots].set(rows_v)

    def _segment_impl(
        self,
        params,
        token,  # (B,) last sampled, not yet fed
        arena_k,
        arena_v,
        seen,  # (B, V) bool
        attn_valid,  # (B, T)
        done,  # (B,)
        rng,
        cursor,  # () group-global decode step counter (ring write head)
        mrope_cur,  # (B,) m-rope position of `token`
        remaining,  # (B,) token budget left after `token`
        step_cap=None,  # () int32 — dynamic per-call step cap <= n_steps
        *,
        temperature: float,
        top_p: float,
        repetition_penalty: float,
        n_steps: int,
        prompt_len: int,
    ):
        """Up to ``n_steps`` fused decode steps over all slots, exiting early
        once every slot is done.

        The decode region [prompt_len, T) is a RING with a single
        group-global write head: every step writes ALL rows' KV at the SAME
        buffer column (the only cache-update form XLA keeps in place — a
        per-row scatter is ~200x slower on TPU), with per-row validity bits
        carrying which slots belong to whom. The ring (size = max_tokens)
        is clobber-safe: a row is active for at most max_tokens steps, so a
        slot being overwritten always belongs to an already-finished span.
        Causality for the single-token queries is validity alone — every
        valid slot of a row IS one of its earlier tokens — so explicit
        zero kv_positions disable the positional mask.
        """
        cfg = self.cfg
        B, T = attn_valid.shape
        ring = T - prompt_len
        pad = cfg.pad_token_id
        eos = cfg.eos_token_id
        toks = jnp.full((B, n_steps), pad, jnp.int32)
        lps = jnp.zeros((B, n_steps), jnp.float32)
        emitted = jnp.zeros((B,), jnp.int32)
        kv_pos_zero = jnp.zeros((B, T), jnp.int32)
        # Dynamic step cap (defaults to the static n_steps): the sampled-
        # spec warmup runs the FIRST spec_warmup tokens of a group through
        # this plain program under a short cap — same compiled program as
        # the full-length run (n_steps stays static for shapes).
        if step_cap is None:
            step_cap = n_steps
        step_cap = jnp.asarray(step_cap, jnp.int32)

        def cond(st):
            k, done = st[0], st[6]
            return jnp.logical_and(k < step_cap, ~jnp.all(done))

        def body(st):
            (k, token, ak, av, seen, attn_valid, done, rng, cursor,
             mrope_cur, remaining, toks, lps, emitted) = st
            rows = jnp.arange(B)
            live = ~done
            s_col = prompt_len + jax.lax.rem(cursor, ring)
            attn_valid = jax.lax.dynamic_update_slice(
                attn_valid, live[:, None], (0, s_col)
            )
            embeds = embed_tokens(params, token[:, None])
            position_ids = jnp.broadcast_to(mrope_cur[None, :, None], (3, B, 1))
            # Validity-only masking, impl-independent: q_position = T makes
            # the causal test (kv slot/pos <= q_pos) pass for every slot on
            # both the Pallas kernel (which compares buffer indices) and the
            # XLA path (which compares the zero kv_positions) — attn_valid
            # alone decides, which is exactly ring-decode causality.
            # Measured on v5e (28L int8, T~2.2k): the XLA path wins decode
            # (71 vs 56 tok/s bs=1) — at S=1 the flash kernel's block
            # machinery has no causal tiles to skip and only adds overhead.
            hidden, cache = text_forward(
                params["text"],
                cfg.text,
                embeds,
                position_ids,
                seq_positions=jnp.full((B, 1), T, jnp.int32),
                attn_valid=attn_valid,
                cache={"k": ak, "v": av},
                cache_offset=s_col,
                kv_positions=kv_pos_zero,
                attn_impl=self.decode_attn_impl,
            )
            ak, av = cache["k"], cache["v"]
            logits = logits_from_hidden(params["text"], hidden[:, 0, :])
            rng, sub = jax.random.split(rng)
            nxt = sample_token(
                sub,
                logits,
                temperature=temperature,
                top_p=top_p,
                seen_mask=seen,
                repetition_penalty=repetition_penalty,
            )
            lp = jax.nn.log_softmax(logits, axis=-1)[rows, nxt]
            nxt = jnp.where(done, pad, nxt)
            seen = seen.at[rows, nxt].set(True)
            toks = toks.at[:, k].set(jnp.where(done, pad, nxt))
            lps = lps.at[:, k].set(jnp.where(done, 0.0, lp))
            emitted = emitted + live.astype(jnp.int32)
            remaining = remaining - live.astype(jnp.int32)
            done = done | (nxt == eos) | (remaining <= 0)
            mrope_cur = jnp.where(done, mrope_cur, mrope_cur + 1)
            return (k + 1, nxt, ak, av, seen, attn_valid, done, rng,
                    cursor + 1, mrope_cur, remaining, toks, lps, emitted)

        st = (jnp.asarray(0), token, arena_k, arena_v, seen, attn_valid, done,
              rng, cursor, mrope_cur, remaining, toks, lps, emitted)
        st = jax.lax.while_loop(cond, body, st)
        (_, token, arena_k, arena_v, seen, attn_valid, done, rng, cursor,
         mrope_cur, remaining, toks, lps, emitted) = st
        return (toks, lps, emitted, token, arena_k, arena_v, seen, attn_valid,
                done, rng, cursor, mrope_cur, remaining)

    def _segment_spec_impl(
        self,
        params,
        token,  # (1,) last sampled, not yet fed
        arena_k,
        arena_v,
        seen,  # (1, V) bool
        attn_valid,  # (1, T)
        done,  # (1,)
        rng,
        cursor,  # () fed-token counter (monotonic; NO ring in this path)
        mrope_cur,  # (1,)
        remaining,  # (1,)
        hist,  # (1, T) int32 — fed tokens by buffer column (prompt + decode)
        *,
        temperature: float,
        top_p: float,
        repetition_penalty: float,
        n_steps: int,
        prompt_len: int,
        draft_k: int,
    ):
        """Prompt-lookup speculative decode segment (single row, greedy).

        Each iteration drafts ``draft_k`` tokens by bigram lookup — the most
        recent earlier occurrence of (last fed token, pending token) in
        ``hist`` — then runs ONE (draft_k+1)-token cached forward (the same
        default buffer-column==position layout admissions use; cache_offset
        advances by the accepted count, so rejected drafts' stale KV/hist
        entries sit entirely inside the NEXT iteration's write window and
        are overwritten before they can be read). Acceptance replicates the
        sequential sampler exactly (penalty-adjusted argmax, seen-set
        updates, eos and budget truncation), so in exact arithmetic the
        emitted tokens are bit-identical to _segment_impl's — only the
        step count changes. (On bf16 hardware the block forward can
        resolve argmax near-ties differently; see __init__.)

        Unlike the ring path, columns are consumed monotonically: the caller
        allocates the arena with ``max_tokens + draft_k + 1`` decode columns
        so the final verify block never clamps.
        """
        cfg = self.cfg
        T = attn_valid.shape[1]
        pad = cfg.pad_token_id
        eos = cfg.eos_token_id
        K1 = draft_k + 1
        out_w = n_steps + draft_k  # emission buffer, clamp-free tail writes
        toks = jnp.full((1, out_w), pad, jnp.int32)
        lps = jnp.zeros((1, out_w), jnp.float32)
        emitted = jnp.zeros((), jnp.int32)
        n_verify = jnp.zeros((), jnp.int32)  # forward passes (telemetry)
        col_idx = jnp.arange(T)

        def cond(st):
            emitted, done = st[0], st[8]
            return jnp.logical_and(emitted < n_steps, ~jnp.all(done))

        def body(st):
            (emitted, n_verify, token, ak, av, seen, attn_valid, hist, done,
             rng, cursor, mrope_cur, remaining, toks, lps) = st
            p = prompt_len + cursor  # column where `token` is fed

            # ---- draft: most recent earlier (hist[p-1], token) bigram,
            # extrapolated periodically. The pending token is written into
            # hist FIRST so the last d columns (p-d, p] are all known; the
            # draft then cycles through that window (period d = distance to
            # the match). For a distant match (d > draft_k) this reduces to
            # the classic copy of the k tokens after the match; for a
            # looping stream (d <= draft_k) it predicts whole periods —
            # without this, the nearest match's continuation would run into
            # not-yet-generated columns and never accept.
            hist = jax.lax.dynamic_update_slice(
                hist, token.astype(jnp.int32)[None], (0, p)
            )
            h = hist[0]
            u = jax.lax.dynamic_index_in_dim(h, p - 1, keepdims=False)
            match = (
                (h == u)
                & (jnp.roll(h, -1) == token[0])
                & (col_idx < p - 1)
            )
            j = jnp.max(jnp.where(match, col_idx, -1))
            d = jnp.maximum((p - 1) - j, 1)  # match distance == period
            off = jnp.arange(draft_k, dtype=jnp.int32)
            off = off - (off // d) * d  # off mod d
            draft = jnp.take(h, (p + 1 - d) + off)
            draft = jnp.where(j >= 0, draft, pad)
            fed = jnp.concatenate([token, draft]).astype(jnp.int32)[None]  # (1, K1)

            # ---- verify: one cached multi-token forward at columns [p, p+K1).
            hist = jax.lax.dynamic_update_slice(hist, fed, (0, p))
            attn_valid = jax.lax.dynamic_update_slice(
                attn_valid, jnp.ones((1, K1), bool), (0, p)
            )
            embeds = embed_tokens(params, fed)
            block = jnp.arange(K1, dtype=jnp.int32)
            position_ids = jnp.broadcast_to(
                (mrope_cur[0] + block)[None, None, :], (3, 1, K1)
            )
            hidden, cache = text_forward(
                params["text"],
                cfg.text,
                embeds,
                position_ids,
                seq_positions=(p + block)[None, :],
                attn_valid=attn_valid,
                cache={"k": ak, "v": av},
                cache_offset=p,
                attn_impl=self.decode_attn_impl,
            )
            ak, av = cache["k"], cache["v"]
            logits = logits_from_hidden(params["text"], hidden[0])  # (K1, V)

            # ---- sequential-equivalent acceptance scan (python-unrolled:
            # draft_k is small and static).
            ok = jnp.ones((), bool)  # all drafts so far accepted
            blk_done = done[0]
            out_t = []
            out_lp = []
            n_emit = jnp.zeros((), jnp.int32)
            rem = remaining[0]
            for i in range(K1):
                li = logits[i][None]  # (1, V)
                nxt = sample_token(
                    rng, li, temperature=temperature, top_p=top_p,
                    seen_mask=seen, repetition_penalty=repetition_penalty,
                )[0]
                emit = ok & ~blk_done & (rem > 0)
                lp = jax.nn.log_softmax(logits[i])[nxt]
                out_t.append(jnp.where(emit, nxt, pad))
                out_lp.append(jnp.where(emit, lp, 0.0))
                seen = jnp.where(emit, seen.at[0, nxt].set(True), seen)
                n_emit = n_emit + emit.astype(jnp.int32)
                rem = rem - emit.astype(jnp.int32)
                blk_done = blk_done | (emit & (nxt == eos)) | (rem <= 0)
                if i < draft_k:
                    ok = ok & emit & (draft[i] == nxt)

            outs = jnp.stack(out_t).astype(jnp.int32)[None]  # (1, K1)
            outlps = jnp.stack(out_lp)[None]
            toks = jax.lax.dynamic_update_slice(toks, outs, (0, emitted))
            lps = jax.lax.dynamic_update_slice(lps, outlps, (0, emitted))
            emitted = emitted + n_emit
            # next pending token = last emitted (verified but not yet fed)
            token = jnp.full(
                (1,),
                jax.lax.dynamic_index_in_dim(
                    outs[0], jnp.maximum(n_emit - 1, 0), keepdims=False
                ),
                jnp.int32,
            )
            done = (blk_done | (n_emit == 0))[None]
            mrope_cur = mrope_cur + n_emit
            remaining = remaining - n_emit
            cursor = cursor + n_emit
            return (emitted, n_verify + 1, token, ak, av, seen, attn_valid,
                    hist, done, rng, cursor, mrope_cur, remaining, toks, lps)

        st = (emitted, n_verify, token, arena_k, arena_v, seen, attn_valid,
              hist, done, rng, jnp.asarray(cursor), mrope_cur, remaining,
              toks, lps)
        st = jax.lax.while_loop(cond, body, st)
        (emitted, n_verify, token, arena_k, arena_v, seen, attn_valid, hist,
         done, rng, cursor, mrope_cur, remaining, toks, lps) = st
        return (toks, lps, emitted[None], n_verify, token, arena_k, arena_v,
                seen, attn_valid, hist, done, rng, cursor, mrope_cur,
                remaining)

    def _spec_compact_impl(self, arena_k, arena_v, attn_valid, kv_pos, *,
                           prompt_len: int):
        """Reclaim hole columns left by rejected drafts: gather each row's
        valid decode columns to the front of the decode region (stable,
        order-preserving) and reset the shared column cursor to the max
        per-row valid count.

        Ring-decode causality in the sampled-spec path is validity +
        explicit column-index positions, so the move is legal as long as
        relative order is kept: compacted column j gets position
        prompt_len + j, which is (a) increasing in j and (b) below every
        future verify block's query positions (they start at the new
        cursor). Runs OUTSIDE the verify while-loop — run_segment calls it
        between segments when the surplus exhausts, then re-enters the
        spec loop; at the bench rollout geometry it fires a handful of
        times per 768-token step (one ~200 MB gather+scatter each, ~1 ms)
        while the loop body stays free of compaction machinery (an in-loop
        lax.cond variant measured +9 ms on EVERY verify)."""
        Ly, B, T, H, Dh = arena_k.shape
        ring = T - prompt_len
        ring_cols = jnp.arange(ring, dtype=jnp.int32)
        vdec = jax.lax.dynamic_slice(attn_valid, (0, prompt_len), (B, ring))
        n_valid = jnp.sum(vdec, axis=1).astype(jnp.int32)  # (B,)
        # stable valid-first permutation of the decode columns
        order = jnp.argsort(~vdec, axis=1, stable=True)  # (B, ring)
        idx = order[None, :, :, None, None]  # (1, B, ring, 1, 1)
        kdec = jax.lax.dynamic_slice(
            arena_k, (0, 0, prompt_len, 0, 0), (Ly, B, ring, H, Dh)
        )
        vdec_kv = jax.lax.dynamic_slice(
            arena_v, (0, 0, prompt_len, 0, 0), (Ly, B, ring, H, Dh)
        )
        kdec = jnp.take_along_axis(kdec, idx, axis=2)
        vdec_kv = jnp.take_along_axis(vdec_kv, idx, axis=2)
        arena_k = jax.lax.dynamic_update_slice(
            arena_k, kdec, (0, 0, prompt_len, 0, 0)
        )
        arena_v = jax.lax.dynamic_update_slice(
            arena_v, vdec_kv, (0, 0, prompt_len, 0, 0)
        )
        attn_valid = jax.lax.dynamic_update_slice(
            attn_valid, ring_cols[None, :] < n_valid[:, None], (0, prompt_len)
        )
        kv_pos = jax.lax.dynamic_update_slice(
            kv_pos, (prompt_len + ring_cols)[None, :], (0, prompt_len)
        )
        return arena_k, arena_v, attn_valid, kv_pos, jnp.max(n_valid)

    def _segment_spec_sample_impl(
        self,
        params,
        token,  # (B,) last sampled, not yet fed
        arena_k,
        arena_v,
        seen,  # (B, V) bool
        attn_valid,  # (B, T)
        done,  # (B,)
        rng,
        col_cursor,  # () decode COLUMNS consumed (monotonic, group-global)
        kv_pos,  # (1, T) int32 — column-index positions of decode columns
        mrope_cur,  # (B,)
        remaining,  # (B,)
        hist,  # (B, Hc) int32 — COMPACT per-row prompt+emitted history
        hcount,  # (B,) int32 — tokens committed in hist (incl. pending)
        forced=None,  # (B, W) int32 — replay stream (benchmark mode only)
        step_cap=None,  # () int32 — dynamic per-call emission cap <= n_steps
        *,
        temperature: float,
        top_p: float,
        repetition_penalty: float,
        n_steps: int,
        prompt_len: int,
        draft_k: int,
        replay: bool = False,
    ):
        """Multi-row SAMPLED speculative decode (prompt-lookup drafts).

        Sampling-correct acceptance is "sample-and-match": position i's
        sample is drawn from the true conditional given the draft prefix
        (== the accepted prefix while all earlier drafts matched); it is
        emitted either way, and drafting continues only while the sample
        equals the draft. For a DETERMINISTIC draft distribution this IS
        optimal speculative rejection sampling (acceptance probability
        p(draft) in both schemes), so emitted sequences are distributed
        exactly as the sequential sampler's — though not bit-identical to
        the plain path, which consumes a different rng stream. At
        temperature 0 it degenerates to the greedy scheme (bit-equal in
        exact arithmetic; pinned in tests/test_spec_sample.py).

        Rows accept different counts per iteration, so the greedy path's
        per-emitted-column monotonic layout (which relies on overwriting
        rejected columns) cannot be shared across rows without per-row
        scatter. Instead every iteration writes its (B, draft_k+1) verify
        block at SHARED columns (single-slice cache update, the only form
        XLA keeps in place) and afterwards marks each row's rejected
        columns INVALID — ring-decode causality is validity + explicit
        kv_positions (column index), so holes are free. Columns are
        consumed at draft_k+1 per iteration regardless of acceptance; the
        loop maintains the invariant `cols_left >= live remaining` so the
        caller can ALWAYS finish with the plain ring path (monotonic
        continuation, no wrap) when the surplus runs out.

        Rollout use (train/gspo.py): G generations of one prompt at
        temperature 1 — grounded reasoning traces repeat tag structure
        (`<obj>..</obj><box>..</box>at<t>T</t>s`), which prompt-lookup
        drafts exploit; the (draft_k+1)-token verify forward costs ~1.02x
        a single weight-HBM-bound decode step.

        ``replay=True`` (BENCHMARK ONLY, never a serving/training mode):
        position i of row b emits ``forced[b, i]`` instead of the sampled
        token. Everything else — the verify forward, logits, acceptance
        dynamics, cache writes — is real, so it measures rollout
        throughput CONDITIONAL on a given trace's repetition statistics:
        the quantity that cannot be measured without real weights, since
        random-init models emit near-uniform (repetition-free) streams.
        """
        cfg = self.cfg
        B, T = attn_valid.shape
        ring = T - prompt_len
        pad = cfg.pad_token_id
        eos = cfg.eos_token_id
        K1 = draft_k + 1
        Hc = hist.shape[1]
        out_w = n_steps + draft_k
        # Dynamic emission cap (defaults to the static n_steps): run_segment
        # passes a short cap on the FIRST spec segment of a group — an
        # acceptance probe — so the host can measure tokens/verify and
        # disable speculation when drafts don't pay for their verify
        # forwards, WITHOUT recompiling (n_steps stays static for shapes).
        if step_cap is None:
            step_cap = n_steps
        step_cap = jnp.asarray(step_cap, jnp.int32)
        rows = jnp.arange(B)
        blk = jnp.arange(K1, dtype=jnp.int32)
        toks = jnp.full((B, out_w), pad, jnp.int32)
        lps = jnp.zeros((B, out_w), jnp.float32)
        emitted = jnp.zeros((B,), jnp.int32)
        n_verify = jnp.zeros((), jnp.int32)
        hcols = jnp.arange(Hc)

        def cond(st):
            emitted, done, col_cursor, remaining = st[0], st[8], st[10], st[13]
            live_rem = jnp.max(jnp.where(done, 0, remaining))
            # surplus invariant: after this iteration (K1 columns, >=1 token
            # per live row) the plain path must still fit in cols_left.
            # Exhaustion is handled OUTSIDE the loop: run_segment compacts
            # the hole columns (self._spec_compact) and re-enters — keeping
            # the loop body free of compaction machinery, whose per-
            # iteration cost (conditional arena aliasing + validity
            # reductions in cond) measured ~+9 ms/verify on the v5e.
            fits = col_cursor + K1 + jnp.maximum(live_rem - 1, 0) <= ring
            return (~jnp.all(done)) & (jnp.max(emitted) < step_cap) & fits

        def body(st):
            (emitted, n_verify, token, ak, av, seen, attn_valid, kv_pos,
             done, rng, col_cursor, hist, hcount, remaining, mrope_cur,
             toks, lps) = st
            s_col = prompt_len + col_cursor

            # ---- draft per row: LONGEST-context prompt-lookup match in the
            # COMPACT history (context up to 3 tokens + the pending token),
            # most recent occurrence, extrapolated periodically (see the
            # greedy impl above for why periodic beats literal copy).
            # Bigram-only matching hits spurious repeats of common tokens
            # (measured 2.06 accepted tokens/row/verify on STGR-style
            # replay traces); requiring the deepest available context to
            # also match disambiguates tag skeletons from prose.
            e = hcount  # (B,) index past the pending token
            t1 = jnp.take_along_axis(hist, (e - 2)[:, None], axis=1)[:, 0]
            t2 = jnp.take_along_axis(
                hist, jnp.maximum(e - 3, 0)[:, None], axis=1
            )[:, 0]
            t3 = jnp.take_along_axis(
                hist, jnp.maximum(e - 4, 0)[:, None], axis=1
            )[:, 0]
            m1 = (
                (hist == t1[:, None])
                & (jnp.roll(hist, -1, axis=1) == token[:, None])
                & (hcols[None, :] < (e - 2)[:, None])
            )
            m2 = (
                m1
                & (jnp.roll(hist, 1, axis=1) == t2[:, None])
                & (hcols[None, :] >= 1)
                & (e >= 3)[:, None]
            )
            m3 = (
                m2
                & (jnp.roll(hist, 2, axis=1) == t3[:, None])
                & (hcols[None, :] >= 2)
                & (e >= 4)[:, None]
            )
            j1 = jnp.max(jnp.where(m1, hcols[None, :], -1), axis=1)  # (B,)
            j2 = jnp.max(jnp.where(m2, hcols[None, :], -1), axis=1)
            j3 = jnp.max(jnp.where(m3, hcols[None, :], -1), axis=1)
            j = jnp.where(j3 >= 0, j3, jnp.where(j2 >= 0, j2, j1))
            d = jnp.maximum((e - 2) - j, 1)[:, None]  # (B, 1) period
            off = jnp.arange(draft_k, dtype=jnp.int32)[None, :]
            off = off - (off // d) * d
            draft = jnp.take_along_axis(hist, (e[:, None] - d) + off, axis=1)
            draft = jnp.where((j >= 0)[:, None], draft, pad)  # (B, K)
            fed = jnp.concatenate([token[:, None], draft], axis=1).astype(
                jnp.int32
            )  # (B, K1)

            # ---- verify: one cached (B, K1) forward at SHARED columns.
            # Causality: query/key positions are COLUMN indices for decode
            # columns (prompt columns stay 0), so intra-block order works
            # and every earlier valid column passes; holes are invalid.
            attn_valid = jax.lax.dynamic_update_slice(
                attn_valid, jnp.ones((B, K1), bool), (0, s_col)
            )
            kv_pos = jax.lax.dynamic_update_slice(
                kv_pos, (s_col + blk)[None, :], (0, s_col)
            )
            embeds = embed_tokens(params, fed)
            position_ids = jnp.broadcast_to(
                mrope_cur[None, :, None] + blk[None, None, :], (3, B, K1)
            )
            hidden, cache = text_forward(
                params["text"],
                cfg.text,
                embeds,
                position_ids,
                seq_positions=jnp.broadcast_to((s_col + blk)[None, :], (B, K1)),
                attn_valid=attn_valid,
                cache={"k": ak, "v": av},
                cache_offset=s_col,
                kv_positions=jnp.broadcast_to(kv_pos, (B, T)),
                attn_impl=self.decode_attn_impl,
            )
            ak, av = cache["k"], cache["v"]
            logits = logits_from_hidden(params["text"], hidden)  # (B, K1, V)

            # ---- sample-and-match acceptance, vectorized over rows.
            rng, sub = jax.random.split(rng)
            ok = jnp.ones((B,), bool)
            blk_done = done
            out_t, out_lp = [], []
            n_emit = jnp.zeros((B,), jnp.int32)
            rem = remaining
            for i in range(K1):
                li = logits[:, i]  # (B, V)
                nxt = sample_token(
                    jax.random.fold_in(sub, i), li, temperature=temperature,
                    top_p=top_p, seen_mask=seen,
                    repetition_penalty=repetition_penalty,
                )
                if replay:
                    # forced is hist-column-aligned: the k-th emission of
                    # this block lands at hist col e + k (see the hist
                    # write below), a position that is global across
                    # segment calls — unlike the segment-local `emitted`.
                    pos_r = jnp.minimum(e + n_emit, forced.shape[1] - 1)
                    nxt = jnp.take_along_axis(
                        forced, pos_r[:, None], axis=1
                    )[:, 0]
                emit = ok & ~blk_done & (rem > 0)
                lp = jax.nn.log_softmax(li, axis=-1)[rows, nxt]
                out_t.append(jnp.where(emit, nxt, pad))
                out_lp.append(jnp.where(emit, lp, 0.0))
                seen = jnp.where(
                    emit[:, None], seen.at[rows, nxt].set(True), seen
                )
                n_emit = n_emit + emit.astype(jnp.int32)
                rem = rem - emit.astype(jnp.int32)
                blk_done = blk_done | (emit & (nxt == eos)) | (rem <= 0)
                if i < draft_k:
                    ok = ok & emit & (draft[:, i] == nxt)

            outs = jnp.stack(out_t, axis=1).astype(jnp.int32)  # (B, K1)
            outlps = jnp.stack(out_lp, axis=1)

            # per-row emission append (tiny buffers; scatter is fine here)
            idx = emitted[:, None] + blk[None, :]
            toks = toks.at[rows[:, None], idx].set(outs)
            lps = lps.at[rows[:, None], idx].set(outlps)
            # commit emitted tokens to the compact history (garbage past
            # n_emit is overwritten before any read: drafting only reads
            # columns < hcount)
            hist = hist.at[rows[:, None], e[:, None] + blk[None, :]].set(outs)
            hcount = hcount + n_emit

            # rejected/done columns become holes: fed i stays context iff
            # i < n_emit (fed[0] is the pending REAL token of a live row)
            attn_valid = jax.lax.dynamic_update_slice(
                attn_valid, blk[None, :] < n_emit[:, None], (0, s_col)
            )
            emitted = emitted + n_emit
            token = jnp.where(
                n_emit > 0,
                jnp.take_along_axis(
                    outs, jnp.maximum(n_emit - 1, 0)[:, None], axis=1
                )[:, 0],
                token,
            )
            done = blk_done | (n_emit == 0)
            mrope_cur = mrope_cur + n_emit
            remaining = remaining - n_emit
            return (emitted, n_verify + 1, token, ak, av, seen, attn_valid,
                    kv_pos, done, rng, col_cursor + K1, hist, hcount,
                    remaining, mrope_cur, toks, lps)

        st = (emitted, n_verify, token, arena_k, arena_v, seen, attn_valid,
              kv_pos, done, rng, jnp.asarray(col_cursor), hist, hcount,
              remaining, mrope_cur, toks, lps)
        st = jax.lax.while_loop(cond, body, st)
        (emitted, n_verify, token, arena_k, arena_v, seen, attn_valid, kv_pos,
         done, rng, col_cursor, hist, hcount, remaining, mrope_cur,
         toks, lps) = st
        return (toks, lps, emitted, n_verify, token, arena_k, arena_v, seen,
                attn_valid, kv_pos, hist, hcount, done, rng, col_cursor,
                mrope_cur, remaining)

    def _bind_impl(self, token, mrope_cur, remaining, done, attn_valid, seen,
                   slots, first, next_pos, attn_rows, seen_rows, row_done,
                   budget):
        """Bind ``n`` freshly admitted rows onto their decode slots — one
        program instead of six eager scatter dispatches per admission."""
        n = first.shape[0]
        token = token.at[slots].set(first.astype(jnp.int32))
        mrope_cur = mrope_cur.at[slots].set(next_pos)
        remaining = remaining.at[slots].set(budget)
        done = done.at[slots].set(row_done)
        attn_valid = attn_valid.at[slots].set(attn_rows)
        seen = seen.at[slots].set(seen_rows.at[jnp.arange(n), first].set(True))
        return token, mrope_cur, remaining, done, attn_valid, seen

    def _bind_full_impl(self, seen_rows, first, next_pos, attn_rows, row_done,
                        budget):
        """Full-wave bind (DP fleet mode): every slot is replaced, so the
        new slot state IS the admission arrays — scatter-free, which keeps
        every array cleanly row-sharded over the batch axis."""
        V = seen_rows.shape[1]
        seen = seen_rows | jax.nn.one_hot(first, V, dtype=bool)
        return (first.astype(jnp.int32), next_pos, budget, row_done,
                attn_rows, seen)

    def _patchify_impl(self, x):
        """uint8 (T, C, H, W) -> frames-as-images patches, on-device.

        Repeating each frame along the temporal-patch axis and patchifying
        as one grid_t=T video reproduces the per-frame image patch order
        exactly (each temporal group holds one frame twice)."""
        from ..ops.preprocess import patchify_device

        tps = self.cfg.vision.temporal_patch_size
        x = jnp.repeat(x, tps, axis=0)
        return patchify_device(
            x,
            patch_size=self.cfg.vision.patch_size,
            temporal_patch_size=tps,
            merge_size=self.cfg.vision.spatial_merge_size,
            out_dtype=self.cfg.dtype,
        )

    def _resize_patchify_impl(self, x, wh, ww):
        """uint8 (T, C, H, W) -> PIL-parity resize -> patches, on-device."""
        from ..ops.resize import resize_frames_device

        return self._patchify_impl(resize_frames_device(x, wh, ww))

    def _resize_weights(self, in_hw, out_hw):
        from ..ops.resize import pil_resize_weights

        key = (in_hw, out_hw)
        w = self._resize_w_cache.get(key)
        if w is None:
            w = (self._put(pil_resize_weights(in_hw[0], out_hw[0])),
                 self._put(pil_resize_weights(in_hw[1], out_hw[1])))
            self._resize_w_cache[key] = w
        return w

    def _frames_to_patches(self, frames: np.ndarray,
                           resize_hw: Optional[tuple] = None) -> jnp.ndarray:
        in_hw = tuple(np.shape(frames)[2:])
        if resize_hw is None or tuple(resize_hw) == in_hw:
            return self._patchify_fn(self._put(frames))
        wh, ww = self._resize_weights(in_hw, tuple(resize_hw))
        return self._resize_patchify_fn(self._put(frames), wh, ww)

    def prestage_frames(self, frames_list: Sequence[np.ndarray],
                        resize_hws: Optional[Sequence] = None) -> list:
        """Upload + patchify frame arrays AHEAD of their generate() call.

        Call from a prefetch thread while the engine runs the previous
        wave: device transfers are async DMA, so the upload (which can
        rival the vision tower's compute through a tunneled backend)
        overlaps device time instead of serializing in vis_upload. Pass
        each returned device buffer as ``Request.pixel_patches``; the
        admission path recognizes device-resident patches and skips the
        transfer. Same-shape entries share one stacked transfer +
        dispatch, like the in-call path. ``resize_hws`` (one entry per
        frame array, or None) requests the on-device PIL-parity resize —
        see Request.resize_hw."""
        groups: dict = {}
        for i, f in enumerate(frames_list):
            rhw = tuple(resize_hws[i]) if resize_hws and resize_hws[i] else None
            groups.setdefault((np.shape(f), rhw), []).append(i)
        out: list = [None] * len(frames_list)
        for (shape, rhw), idxs in groups.items():
            if len(idxs) == 1:
                out[idxs[0]] = self._frames_to_patches(
                    frames_list[idxs[0]], resize_hw=rhw
                )
                continue
            stacked = np.stack([np.asarray(frames_list[i]) for i in idxs])
            if rhw is not None and rhw != shape[2:]:
                wh, ww = self._resize_weights(shape[2:], rhw)
                parts = self._resize_patchify_batch_fn(
                    self._put(stacked), wh, ww
                )
            else:
                parts = self._patchify_batch_fn(self._put(stacked))
            for i, p in zip(idxs, parts):
                out[i] = p
        return out

    def prestage_patches(self, patches_list: Sequence) -> list:
        """Like :meth:`prestage_frames` for already-patchified host arrays
        (the processor path the eval wrapper uses). No device patchify —
        just the stacked transfer. ``None`` entries pass through (text-only
        requests)."""
        groups: dict = {}
        for i, p in enumerate(patches_list):
            if p is None or isinstance(p, jax.Array):
                continue
            groups.setdefault(np.shape(p), []).append(i)
        out: list = list(patches_list)
        for _, idxs in groups.items():
            if len(idxs) == 1:
                out[idxs[0]] = self._put(patches_list[idxs[0]])
                continue
            stacked = np.stack([np.asarray(patches_list[i]) for i in idxs])
            parts = self._split_rows_fn(self._put(stacked))
            for i, p in zip(idxs, parts):
                out[i] = p
        return out

    # --------------------------------------------------------------- host prep

    def _prepare_rows(self, reqs: Sequence[Request], L: int, T: int, vis_cache: dict,
                      rows_replicated: bool = False):
        """Left-pad prompts, compute rope, embed + merge vision.

        ``rows_replicated`` keeps the row dimension unsharded in DP fleet
        mode (the single-row prefix prefill cannot split 1 row over the
        batch axis).

        Returns (embeds (n,L,D) dev, position_ids (3,n,L), seq_positions
        (n,L), attn_rows (n,T) np, seen_rows (n,V) np, next_pos (n,) np)."""
        cfg = self.cfg
        n = len(reqs)
        lens = [len(r.input_ids) for r in reqs]
        pad_id = cfg.pad_token_id

        with self.timer.stage("host_prep"):
            ids = np.full((n, L), pad_id, dtype=np.int64)
            mask = np.zeros((n, L), dtype=np.int64)
            for i, r in enumerate(reqs):
                ids[i, L - lens[i]:] = np.asarray(r.input_ids)
                mask[i, L - lens[i]:] = 1

            position_ids = np.ones((3, n, L), dtype=np.int64)
            next_pos = np.zeros(n, dtype=np.int64)
            for i, r in enumerate(reqs):
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
                pos, _ = get_rope_index(
                    cfg, ids[i:i + 1], attention_mask=mask[i:i + 1], **kw
                )
                position_ids[:, i] = pos[:, 0]
                next_pos[i] = pos[:, 0, :].max() + 1

        # Embed + scatter vision features. Requests sharing the same pixel
        # data (e.g. the G rollout copies of one RL prompt) are encoded once
        # per call via vis_cache; DISTINCT requests' patches are concatenated
        # into ONE vision-tower program (bigger matmuls, fewer dispatches)
        # and split back by merged-token count.
        with self.timer.stage("vis_upload"):
            # Host->device frame/patch transfer + on-device patchify. Its
            # own stage: on a tunneled TPU the upload can rival the tower
            # compute, and lumping them misattributes "vision" time.
            pending: list[tuple] = []  # (vis_key, r, grid)
            seen_keys = set()
            for r in reqs:
                if r.pixel_patches is None and r.frames is None:
                    continue
                grid = np.asarray(r.grid_thw)
                grid_key = tuple(map(tuple, grid.tolist()))
                vis_key = (id(r.pixel_patches), id(r.frames), grid_key)
                if vis_key in vis_cache or vis_key in seen_keys:
                    continue
                seen_keys.add(vis_key)
                pending.append((vis_key, r, grid))
            # Same-shape uploads are stacked into ONE transfer + ONE
            # batched dispatch; per-request round trips only for odd
            # one-off shapes. (See _patchify_batch_fn note above.)
            patches_by_key: dict = {}
            frame_groups: dict = {}
            patch_groups: dict = {}
            for vis_key, r, _ in pending:
                if r.frames is not None:
                    rhw = tuple(r.resize_hw) if r.resize_hw else None
                    frame_groups.setdefault(
                        (np.shape(r.frames), rhw), []
                    ).append((vis_key, r))
                elif isinstance(r.pixel_patches, jax.Array):
                    # Already on device (prestage_frames from a prefetch
                    # thread): the transfer overlapped the previous wave.
                    patches_by_key[vis_key] = r.pixel_patches
                else:
                    patch_groups.setdefault(
                        np.shape(r.pixel_patches), []
                    ).append((vis_key, r))
            for (shape, rhw), group in frame_groups.items():
                if len(group) == 1:
                    vis_key, r = group[0]
                    patches_by_key[vis_key] = self._frames_to_patches(
                        r.frames, resize_hw=rhw
                    )
                    continue
                stacked = np.stack([np.asarray(r.frames) for _, r in group])
                if rhw is not None and rhw != shape[2:]:
                    wh, ww = self._resize_weights(shape[2:], rhw)
                    parts = self._resize_patchify_batch_fn(
                        self._put(stacked), wh, ww
                    )
                else:
                    parts = self._patchify_batch_fn(self._put(stacked))
                for (vis_key, _), p in zip(group, parts):
                    patches_by_key[vis_key] = p
            for shape, group in patch_groups.items():
                if len(group) == 1:
                    vis_key, r = group[0]
                    patches_by_key[vis_key] = self._put(r.pixel_patches)
                    continue
                stacked = np.stack([np.asarray(r.pixel_patches) for _, r in group])
                parts = self._split_rows_fn(self._put(stacked))
                for (vis_key, _), p in zip(group, parts):
                    patches_by_key[vis_key] = p
            jobs = [
                (vis_key, patches_by_key[vis_key], grid)
                for vis_key, _, grid in pending
            ]
            if jobs:
                jax.block_until_ready([pd for _, pd, _ in jobs])
        with self.timer.stage("vision"):
            # Group jobs by IDENTICAL grid signature so program caching stays
            # bounded: one program per (grid, group-size) instead of one per
            # arbitrary concatenation order of heterogeneous videos.
            by_grid: dict = {}
            for job in jobs:
                by_grid.setdefault(tuple(map(tuple, job[2].tolist())), []).append(job)
            fresh_vis: list = []
            for grid_key, group in by_grid.items():
                grid = group[0][2]
                all_grid = np.concatenate([g for _, _, g in group], axis=0)
                prog_key = (grid_key, len(group))
                if prog_key not in self._vision_fns:
                    self._vision_fns[prog_key] = jax.jit(
                        self._a8_wrap(
                            lambda p, x, g=all_grid: encode_vision(p, self.cfg, x, g)
                        )
                    )
                # Serving never differentiates the tower: trace with the
                # forward-only VMEM budget so frame-sized global segments
                # the backward-safe check rejects still run fused.
                from ..ops.window_attention import vit_inference_scope

                with vit_inference_scope():
                    all_vis = self._vision_fns[prog_key](
                        self.params, jnp.concatenate([pd for _, pd, _ in group], axis=0)
                    )
                fresh_vis.append(all_vis)
                n_tok = int(np.prod(grid, axis=1).sum()) // cfg.vision.merge_unit
                for j, (vis_key, _, _) in enumerate(group):
                    sl = slice(j * n_tok, (j + 1) * n_tok)
                    if isinstance(all_vis, tuple):  # Qwen3-VL: (main, deepstack)
                        vis_cache[vis_key] = (all_vis[0][sl], [d[sl] for d in all_vis[1]])
                    else:
                        vis_cache[vis_key] = all_vis[sl]
            if fresh_vis:
                # Sync so tower compute lands in THIS stage, not wherever
                # the next device_get happens to block (stage attribution).
                jax.block_until_ready(fresh_vis)
        # One fused embed(+merge) program per admission shape: the per-row
        # eager merge this replaces cost ~8 device dispatches per request —
        # each a full round trip on a tunneled TPU.
        row_dim = None if rows_replicated else 0
        ids_dev = self._put(ids, row_dim=row_dim)
        vis_entries: list = []  # unique vision tables, admission order
        vis_offsets: dict = {}  # vis_key -> row offset into the concat table
        total_vis = 0
        row_offsets: list = []
        row_tokens: list = []
        for r in reqs:
            if r.vision_embeds is not None:
                # Precomputed text-space features (the Aria projector path):
                # enter the merge table directly, no tower run.
                vis_key = ("embeds", id(r.vision_embeds))
                if vis_key not in vis_offsets:
                    entry = self._put(np.asarray(r.vision_embeds))
                    vis_offsets[vis_key] = total_vis
                    vis_entries.append(entry)
                    total_vis += entry.shape[0]
                row_offsets.append(vis_offsets[vis_key])
                row_tokens.append(r.vision_token_id or cfg.image_token_id)
                continue
            if r.pixel_patches is None and r.frames is None:
                row_offsets.append(None)
                row_tokens.append(None)
                continue
            grid_key = tuple(map(tuple, np.asarray(r.grid_thw).tolist()))
            vis_key = (id(r.pixel_patches), id(r.frames), grid_key)
            if vis_key not in vis_offsets:
                entry = vis_cache[vis_key]
                vis_offsets[vis_key] = total_vis
                vis_entries.append(entry)
                main = entry[0] if isinstance(entry, tuple) else entry
                total_vis += main.shape[0]
            row_offsets.append(vis_offsets[vis_key])
            row_tokens.append(r.vision_token_id or cfg.image_token_id)
        deepstack = None  # (tables list, row_index dev) for Qwen3-VL
        if total_vis:
            mains = [
                e[0] if isinstance(e, tuple) else e for e in vis_entries
            ]
            vis_table = mains[0] if len(mains) == 1 else jnp.concatenate(mains, axis=0)
            row_index = build_vision_row_index(ids, row_tokens, row_offsets)
            row_index_dev = self._put(row_index, row_dim=row_dim)
            with self.timer.stage("embed"):
                embeds = self._embed_merge_fn(
                    self.params, ids_dev, vis_table, row_index_dev
                )
                jax.block_until_ready(embeds)
            if any(isinstance(e, tuple) for e in vis_entries):
                # Qwen3-VL deepstack: concat each tap's tables in the SAME
                # admission order, so row_index addresses them too. Entries
                # without taps (precomputed vision_embeds rows) contribute
                # zeros — injecting zero is a no-op at those positions.
                n_taps = len(next(e for e in vis_entries if isinstance(e, tuple))[1])

                def tap(e, t):
                    if isinstance(e, tuple):
                        return e[1][t]
                    return jnp.zeros_like(e)

                tables = [
                    jnp.concatenate([tap(e, t) for e in vis_entries], axis=0)
                    if len(vis_entries) > 1
                    else tap(vis_entries[0], t)
                    for t in range(n_taps)
                ]
                deepstack = (tables, row_index_dev)
        else:
            with self.timer.stage("embed"):
                embeds = self._embed_fn(self.params, ids_dev)
                jax.block_until_ready(embeds)

        with self.timer.stage("host_prep"):
            attn_rows = np.zeros((n, T), dtype=bool)
            attn_rows[:, :L] = mask.astype(bool)

            seen_rows = np.zeros((n, cfg.text.vocab_size), dtype=bool)
            for i in range(n):
                seen_rows[i, ids[i][mask[i] == 1]] = True

        seq_positions = np.broadcast_to(np.arange(L, dtype=np.int64), (n, L))
        return (embeds, position_ids, seq_positions, attn_rows, seen_rows,
                next_pos, deepstack)

    def _put(self, x, to_i32: bool = False, row_dim: Optional[int] = None):
        """Host value -> array the jitted programs accept.

        Single-process: plain jnp.asarray. SPMD multi-host: a REPLICATED
        global array (identical host values by construction), so every
        jitted/eager op runs in fleet lockstep. DP fleet mode: arrays whose
        ``row_dim`` carries decode-slot rows are sharded over the batch
        axis, so each chip owns its rows end to end."""
        x = np.asarray(x)
        if to_i32:
            x = x.astype(np.int32)
        if self._dp and row_dim is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P_

            spec = [None] * x.ndim
            spec[row_dim] = self.batch_axis
            return jax.device_put(x, NamedSharding(self.mesh, P_(*spec)))
        if row_dim is not None and self._row_axis(x.shape[row_dim]):
            from jax.sharding import NamedSharding, PartitionSpec as P_

            spec = [None] * x.ndim
            spec[row_dim] = self.rollout_shard_axis
            return jax.device_put(x, NamedSharding(self.mesh, P_(*spec)))
        if not (self._spmd or self._dp or self.rollout_shard_axis):
            return jnp.asarray(x)
        from jax.sharding import NamedSharding, PartitionSpec as P_

        return jax.device_put(x, NamedSharding(self.mesh, P_()))

    def _row_axis(self, n: int) -> Optional[str]:
        """Rollout-row-sharding axis for an ``n``-row group, or None when
        inactive / non-divisible (the whole group then stays replicated)."""
        axis = self.rollout_shard_axis
        if axis is not None and n > 0 and n % self.mesh.shape[axis] == 0:
            return axis
        return None

    def _fetch(self, tree):
        """Device -> host for decode-state outputs. Row-sharded arrays on a
        multi-host mesh are not fully addressable; re-replicate them with a
        cached jitted identity (one allgather over the row axis) first —
        the host-visible values and control flow stay exactly those of the
        replicated engine."""
        leaves = jax.tree.leaves(tree)
        if all(getattr(l, "is_fully_addressable", True) for l in leaves):
            return jax.device_get(tree)
        from jax.sharding import NamedSharding, PartitionSpec as P_

        if self._replicate_fn is None:
            self._replicate_fn = jax.jit(
                lambda t: t,
                out_shardings=NamedSharding(self.mesh, P_()),
            )
        return jax.device_get(self._replicate_fn(tree))

    def _new_cache(self, n: int, T: int) -> dict:
        """Fresh device-side KV cache (replicated global in SPMD mode;
        slot-row-sharded in DP fleet / rollout-row-sharded mode)."""
        if self._spmd or self._dp or self.rollout_shard_axis:
            from jax.sharding import NamedSharding, PartitionSpec as P_

            if self._dp:
                spec = P_(None, self.batch_axis)
            elif self._row_axis(n):
                spec = P_(None, self.rollout_shard_axis)
            else:
                spec = P_()
            return jax.jit(
                lambda: init_kv_cache(self.cfg.text, n, T, dtype=self.cache_dtype),
                out_shardings=NamedSharding(self.mesh, spec),
            )()
        return init_kv_cache(self.cfg.text, n, T, dtype=self.cache_dtype)

    def _get_arena(self, n_slots: int, T: int) -> dict:
        key = (n_slots, T)
        arena = self._arenas.pop(key, None)
        if arena is None:
            arena = self._new_cache(n_slots, T)
        return arena

    # ----------------------------------------------------------------- public

    def generate(
        self,
        requests: Sequence[Request],
        sampling: Optional[SamplingParams] = None,
        return_logprobs: bool = False,
        replay_tokens: Optional[np.ndarray] = None,
    ) -> list[dict[str, Any]]:
        """Generate completions for any number of requests.

        Requests are grouped by prompt-length bucket; within a group they
        stream through ``max_slots`` decode slots with continuous admission.
        Returns one dict per request (input order): {"token_ids": list[int],
        "num_prompt_tokens": int, "logprobs": optional list[float]}.

        ``replay_tokens`` (BENCHMARK ONLY): (len(requests), W) int32 token
        streams replayed through the sampled-spec path instead of sampling
        — measures spec-rollout throughput conditional on a trace's
        repetition statistics (see _segment_spec_sample_impl). Requires
        spec_sample mode; ignored on paths where spec_sample is inactive."""
        sampling = sampling or SamplingParams()
        results: list = [None] * len(requests)
        prefix_lens = self._detect_prefixes(requests)
        groups: dict[tuple, list[int]] = {}
        for i, r in enumerate(requests):
            pl = prefix_lens[i]
            if pl:
                P_b = _bucket(pl, self.prompt_buckets)
                S_b = _bucket(len(r.input_ids) - pl, self.suffix_buckets)
                groups.setdefault((P_b + S_b, P_b), []).append(i)
            else:
                L = _bucket(len(r.input_ids), self.prompt_buckets)
                groups.setdefault((L, 0), []).append(i)
        for (L, P_b), idxs in groups.items():
            self._run_group(L, idxs, requests, sampling, return_logprobs,
                            results, prefix_bucket=P_b, prefix_lens=prefix_lens,
                            replay_tokens=replay_tokens)
        return results

    def _vis_digest(self, arr) -> Optional[str]:
        """Content digest of a vision array (sha1 over shape/dtype/bytes).

        Prefix clustering keys on CONTENT, not object identity, so
        equal-but-recomputed frames (e.g. the same video decoded again for
        a later eval stage) still share their prefix KV. Digests memoize by
        id() holding only a WEAK ref (a strong ref would pin up to 64
        ~20 MB frame arrays — or device vision_embeds in HBM — for the
        engine's lifetime); a dead referent means the id may be reused, so
        the entry is dropped and the newcomer re-hashed."""
        if arr is None:
            return None
        memo = self._vis_digests
        entry = memo.get(id(arr))
        if entry is not None and entry[1]() is arr:
            memo.move_to_end(id(arr))
            return entry[0]
        if not isinstance(arr, np.ndarray):
            # Device arrays (e.g. precomputed Aria vision_embeds) would
            # cost a host transfer to hash — keep identity semantics via a
            # per-object token (monotonic, so a freed id can never alias
            # an old cache entry).
            self._vis_obj_counter += 1
            digest = f"obj:{self._vis_obj_counter}"
        else:
            import hashlib

            a = np.asarray(arr)
            h = hashlib.sha1()
            h.update(str(a.shape).encode())
            h.update(str(a.dtype).encode())
            h.update(np.ascontiguousarray(a).tobytes())
            digest = h.hexdigest()
        try:
            memo[id(arr)] = (digest, weakref.ref(arr))
        except TypeError:
            # Non-weakref-able object: keep the old strong-ref behavior
            # (a fresh token per lookup would break clustering/vis_cache
            # hits for requests sharing this very object).
            memo[id(arr)] = (digest, lambda a=arr: a)
        while len(memo) > 64:
            memo.popitem(last=False)
        return digest

    def _vis_key(self, r: Request) -> tuple:
        return (
            self._vis_digest(r.pixel_patches),
            self._vis_digest(r.frames),
            self._vis_digest(r.vision_embeds),
        )

    def _detect_prefixes(self, requests: Sequence[Request]) -> list[int]:
        """Automatic prefix caching: per-request shared-prefix length (0 =
        run plain).

        Requests sharing the same vision arrays (by CONTENT — the G rollout
        copies of one RL prompt, V-STAR's 5 queries over one video, N TTS
        paths, or re-decoded copies of the same frames) are clustered; a
        cluster's shared prefix is the longest common token prefix, used
        when it is at least ``prefix_cache_min`` tokens, leaves every
        member a non-empty suffix, and contains every vision placeholder
        (suffixes run text-only)."""
        n = len(requests)
        if not self.prefix_cache_min or n < 2:
            return [0] * n
        clusters: dict[tuple, list[int]] = {}
        for i, r in enumerate(requests):
            if len(r.input_ids) <= self.prefix_cache_min:
                continue  # too short to leave a suffix behind a min prefix
            # Head tokens in the key: two requests can only share a
            # >= min-length prefix if their first min tokens agree, so
            # unrelated families (e.g. the G rollout groups of SEVERAL RL
            # prompts in one batch) cluster separately.
            head = tuple(int(t) for t in r.input_ids[: self.prefix_cache_min])
            clusters.setdefault(
                self._vis_key(r) + (head,),
                [],
            ).append(i)
        prefix_lens = [0] * n
        vis_ids = {self.cfg.image_token_id, self.cfg.video_token_id}
        for members in clusters.values():
            if len(members) < 2:
                continue
            seqs = [np.asarray(requests[i].input_ids) for i in members]
            lcp = min(len(s) for s in seqs)
            base = seqs[0]
            for s in seqs[1:]:
                m = min(lcp, len(s))
                neq = np.nonzero(base[:m] != s[:m])[0]
                lcp = int(neq[0]) if len(neq) else m
                if lcp < self.prefix_cache_min:
                    break
            # Every member keeps >= 1 suffix token (identical prompts share
            # all but their last token).
            pl = min(lcp, min(len(s) for s in seqs) - 1)
            if pl < self.prefix_cache_min or pl > self.prompt_buckets[-1]:
                continue
            # Per-member conformance: one outlier (suffix longer than the
            # largest suffix bucket, or a vision placeholder past the prefix
            # — the suffix path embeds text only) runs plain WITHOUT
            # disabling prefix sharing for its siblings.
            conforming = [
                i for i, s in zip(members, seqs)
                if len(s) - pl <= self.suffix_buckets[-1]
                and not np.isin(s[pl:], list(vis_ids)).any()
            ]
            # A prefix shared by < 2 conforming members isn't worth caching.
            if len(conforming) < 2:
                continue
            for i in conforming:
                prefix_lens[i] = pl
        return prefix_lens

    def _ensure_prefix(self, req: Request, pl: int, P_b: int, vis_cache: dict) -> dict:
        """Build (or fetch) the cached KV block for ``req``'s first ``pl``
        tokens, left-padded to the P_b bucket."""
        key = (tuple(req.input_ids[:pl]),) + self._vis_key(req) + (P_b,)
        entry = self._prefix_kv.get(key)
        if entry is not None:
            self._prefix_kv.move_to_end(key)
            return entry
        pseudo = Request(
            input_ids=list(req.input_ids[:pl]),
            pixel_patches=req.pixel_patches,
            grid_thw=req.grid_thw,
            vision_token_id=req.vision_token_id,
            second_per_grid_ts=req.second_per_grid_ts,
            frames=req.frames,
            resize_hw=req.resize_hw,
            vision_embeds=req.vision_embeds,
        )
        embeds, pos, seq_pos, attn_rows, _, _, deepstack = self._prepare_rows(
            [pseudo], P_b, P_b, vis_cache, rows_replicated=True
        )
        ds_tables, ds_idx = deepstack if deepstack is not None else (None, None)
        k, v = self._prefill_prefix(
            self.params, embeds, self._put(pos), self._put(seq_pos),
            self._put(attn_rows), ds_tables, ds_idx,
        )
        entry = {
            "k": k,
            "v": v,
            "valid": attn_rows[0],  # (P_b,) bool — real prefix tokens
        }
        self._prefix_kv[key] = entry
        while len(self._prefix_kv) > self.prefix_cache_entries:
            self._prefix_kv.popitem(last=False)
        return entry

    def _prepare_suffix_rows(self, reqs: Sequence[Request], pls: Sequence[int],
                             P_b: int, S_b: int, T: int, prefix_valid: np.ndarray):
        """Host prep for suffix-only admission on top of a shared prefix.

        Suffix tokens are left-padded into cache columns [P_b, P_b + S_b);
        M-RoPE positions come from the FULL sequence (so they continue the
        prefix's), while cache/causal positions are the column indices.
        ``prefix_valid``: (P_b,) shared, or (n, P_b) per row — rows with
        pl == 0 (DP wave padding) run prefix-less."""
        cfg = self.cfg
        n = len(reqs)
        pad_id = cfg.pad_token_id
        ids = np.full((n, S_b), pad_id, dtype=np.int64)
        position_ids = np.ones((3, n, S_b), dtype=np.int64)
        next_pos = np.zeros(n, dtype=np.int64)
        attn_rows = np.zeros((n, T), dtype=bool)
        attn_rows[:, :P_b] = np.broadcast_to(prefix_valid, (n, P_b))
        seen_rows = np.zeros((n, cfg.text.vocab_size), dtype=bool)
        for i, (r, pl) in enumerate(zip(reqs, pls)):
            full = np.asarray(r.input_ids)
            sl = len(full) - pl
            ids[i, S_b - sl:] = full[pl:]
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
            pos, _ = get_rope_index(cfg, full[None], **kw)
            position_ids[:, i, S_b - sl:] = pos[:, 0, pl:]
            next_pos[i] = pos.max() + 1
            attn_rows[i, P_b + S_b - sl:P_b + S_b] = True
            seen_rows[i, full] = True
        embeds = self._embed_fn(self.params, self._put(ids, row_dim=0))
        seq_positions = np.broadcast_to(
            np.arange(S_b, dtype=np.int64) + P_b, (n, S_b)
        )
        return embeds, position_ids, seq_positions, attn_rows, seen_rows, next_pos

    def clear_prefix_cache(self):
        self._prefix_kv.clear()

    def release_memory(self):
        """Drop persistent HBM state (KV arenas, prefix blocks, vision
        programs' cached outputs). Call between workload phases with very
        different shapes — each (slots, length) configuration otherwise
        keeps its arena alive for reuse, and a 16 GB chip running a 7B
        model has only a few GB of headroom for them."""
        self._arenas.clear()
        self._prefix_kv.clear()

    def _run_group(self, L, idxs, requests, sampling, return_logprobs, results,
                   prefix_bucket: int = 0, prefix_lens: Optional[Sequence[int]] = None,
                   replay_tokens: Optional[np.ndarray] = None):
        cfg = self.cfg
        eos = cfg.eos_token_id
        n_real = len(requests)
        if self._dp:
            # Wave scheduling: every admission fills ALL max_slots rows
            # (static row count per chip shard), so pad the queue to a wave
            # multiple with 1-token dummy rows, discarded on finalize.
            B = self.max_slots
            pad_n = (-len(idxs)) % B
            if pad_n:
                requests = list(requests) + [Request(input_ids=[eos])] * pad_n
                idxs = list(idxs) + list(range(n_real, n_real + pad_n))
        else:
            # Slot count tracks the workload (one program per count): a
            # single request must not pay 8 rows of KV traffic + sampling
            # per step.
            B = min(self.max_slots, len(idxs))
        # Prompt-lookup speculative decoding applies to single-row greedy
        # groups; its verify blocks consume columns monotonically (no ring),
        # so the arena gets draft_k+1 extra columns of headroom.
        draft_k = self.spec_draft

        def _spec_sample_ok(b: int) -> bool:
            # Multi-row SAMPLED speculation: single-wave groups only (every
            # request bound in the first admission round, no mid-flight
            # rebinding); the greedy bit-exact path wins when it applies.
            # Multi-wave groups qualify too (r5): speculation engages once
            # the final request is admitted (qpos >= len(idxs) below) over
            # whatever mix of mid-flight rows the slots then hold — the
            # in-loop hole compaction keeps the shared column cursor
            # bounded across rebinds, and the compact histories are
            # rebuilt from host state after every bind.
            return (
                self.spec_sample
                and not self._dp
                and not _spec_ok(b)
                and sampling.max_tokens > 1
            )

        def _spec_ok(b: int) -> bool:
            return (
                self.spec_decode
                and not self._dp
                and b == 1
                and sampling.temperature == 0.0
                and sampling.max_tokens > 1
            )

        if self.max_kv_gb and not self._dp:
            # Long-context admission control: cap concurrent slots so the
            # arena fits the KV budget; the remaining requests stream
            # through as slots free up.
            tcfg = cfg.text

            def _slots_for(extra_cols: int) -> int:
                t = L + sampling.max_tokens + extra_cols
                per_slot = (
                    2 * tcfg.num_hidden_layers * t * tcfg.num_key_value_heads
                    * tcfg.head_dim * jnp.dtype(self.cache_dtype).itemsize
                )
                return max(1, min(B, int(self.max_kv_gb * 1e9 / per_slot)))

            # The sampled-spec surplus columns count against the budget
            # only if the capped slot count still RUNS that path (every
            # row bound in one wave). When the surplus shrinks the cap
            # below the row count, fall back to plain slots — shrinking
            # first and then discovering the mode is disabled would keep
            # fewer slots AND no speculation. Capping to one slot can
            # newly enable greedy spec decoding; budget its draft columns.
            b_ss = _slots_for(self.spec_surplus + draft_k + 1)
            if _spec_sample_ok(b_ss) and b_ss >= len(idxs):
                B = b_ss
            else:
                b = _slots_for(0)
                B = _slots_for(draft_k + 1) if _spec_ok(b) else b
        spec_active = _spec_ok(B)
        spec_sample_active = _spec_sample_ok(B)
        T = (
            L + sampling.max_tokens
            + (draft_k + 1 if spec_active else 0)
            + (self.spec_surplus + draft_k + 1 if spec_sample_active else 0)
        )
        V = cfg.text.vocab_size
        arena = self._get_arena(B, T)
        self.last_rollout_layout = (
            f"rows_sharded({self.rollout_shard_axis}="
            f"{self.mesh.shape[self.rollout_shard_axis]})"
            if self._row_axis(B)
            else ("dp_fleet" if self._dp else "replicated")
        )

        token = self._put(np.zeros((B,), np.int32), row_dim=0)
        cursor = self._put(np.asarray(0))  # ring write head, group-global
        mrope_cur = self._put(np.zeros((B,), np.int32), row_dim=0)
        remaining = self._put(np.zeros((B,), np.int32), row_dim=0)
        done = self._put(np.ones((B,), bool), row_dim=0)
        attn_valid = self._put(np.zeros((B, T), bool), row_dim=0)
        seen = self._put(np.zeros((B, V), bool), row_dim=0)
        rng = self._put(np.asarray(jax.random.PRNGKey(sampling.seed)))

        slot_rid: list = [None] * B
        emitted: dict = {}
        lp_acc: dict = {}
        vis_cache: dict = {}
        qpos = 0
        # Fed-token history for speculative drafting (prompt + generated by
        # buffer column); rebuilt host-side at each (single-row) admission.
        hist = self._put(np.zeros((B, T), np.int32)) if spec_active else None
        # Sampled-spec state: compact per-row drafting history + committed
        # counts (built lazily once all rows are bound) and the shared
        # column-index kv_positions row.
        Hc = L + sampling.max_tokens + draft_k + 2
        kv_pos = (
            self._put(np.zeros((1, T), np.int32)) if spec_sample_active else None
        )
        hist_c = None
        hcount = None
        forced_c = None  # replay streams, hist-column-aligned (bench only)
        spec_just_compacted = False  # exhaust->compact->retry progress guard
        spec_probe_pending = True  # first spec segment runs the acceptance probe

        def finalize(s):
            rid = slot_rid[s]
            slot_rid[s] = None
            if rid >= n_real:  # DP wave padding row
                return
            row = emitted[rid]
            if eos in row:
                cut = row.index(eos) + 1
                row = row[:cut]
                lp_acc[rid] = lp_acc[rid][:cut]
            out: dict[str, Any] = {
                "token_ids": row,
                "num_prompt_tokens": len(requests[rid].input_ids),
            }
            if return_logprobs:
                out["logprobs"] = lp_acc[rid]
            results[rid] = out

        def run_segment(n_steps, interleaved=False):
            """One decode segment over the active slots + harvest."""
            nonlocal token, seen, attn_valid, done, rng, cursor, mrope_cur
            nonlocal remaining, arena, hist
            nonlocal kv_pos, hist_c, hcount, forced_c, spec_sample_active
            nonlocal spec_just_compacted, spec_probe_pending
            active = [s for s in range(B) if slot_rid[s] is not None]
            if not active:
                return
            # Sampled speculation engages once every request is bound (the
            # gate guarantees that happens in the first admission round).
            # interleaved=True marks mid-admission refill segments (chunked
            # prefill of a not-yet-bound row): those run plain, sharing the
            # monotonic column cursor; their columns keep kv_pos 0, which is
            # always-valid context for later verify blocks.
            spec_candidate = (
                spec_sample_active and not interleaved and qpos >= len(idxs)
            )
            # Warmup: run the first spec_warmup tokens of the group on the
            # PLAIN path (prompt-lookup acceptance is back-loaded; see
            # spec_warmup in __init__), then one probe segment (short
            # dynamic cap, no recompile) whose tokens/verify/row verdict
            # reverts the group to plain decode if drafts don't pay for
            # their verify forwards (see spec_probe in __init__).
            warmup_rem = 0
            if spec_candidate and spec_probe_pending:
                min_emitted = min(
                    (len(emitted[slot_rid[s]]) for s in active), default=0
                )
                warmup_rem = max(0, self.spec_warmup - min_emitted)
            spec_sample_now = spec_candidate and warmup_rem == 0
            seg_cap = n_steps
            if spec_sample_now and spec_probe_pending:
                seg_cap = max(1, min(self.spec_probe, n_steps))
            elif warmup_rem:
                seg_cap = min(warmup_rem, n_steps)
            with self.timer.stage("decode"), trace_annotation("engine.decode"):
                if spec_sample_now:
                    if hist_c is None:
                        rows_np = np.full((B, Hc), cfg.pad_token_id, np.int32)
                        counts = np.full((B,), 2, np.int32)  # done-row floor
                        for s in range(B):
                            rid = slot_rid[s]
                            if rid is None:
                                continue
                            ids0 = list(requests[rid].input_ids) + emitted[rid]
                            rows_np[s, : len(ids0)] = ids0
                            counts[s] = len(ids0)
                        hist_c = self._put(rows_np, row_dim=0)
                        hcount = self._put(counts, to_i32=True, row_dim=0)
                        if replay_tokens is not None:
                            # Align each row's remaining trace to its hist
                            # columns: emission g of row s lands at hist col
                            # counts[s] + g, and g continues from the row's
                            # already-emitted count (the bind-time sample).
                            fh = np.zeros((B, Hc), np.int32)
                            for s in range(B):
                                rid = slot_rid[s]
                                if rid is None:
                                    continue
                                tr = np.asarray(replay_tokens[rid], np.int32)
                                n_already = len(emitted[rid])
                                g_max = min(len(tr) - n_already,
                                            Hc - int(counts[s]))
                                if g_max > 0:
                                    fh[s, counts[s]:counts[s] + g_max] = (
                                        tr[n_already:n_already + g_max]
                                    )
                            forced_c = self._put(fh, row_dim=0)
                    (toks, lps, emitted_n, n_verify, token, ak, av, seen,
                     attn_valid, kv_pos, hist_c, hcount, done, rng, cursor,
                     mrope_cur, remaining) = self._segment_spec_sample(
                        self.params,
                        token,
                        arena["k"],
                        arena["v"],
                        seen,
                        attn_valid,
                        done,
                        rng,
                        cursor,
                        kv_pos,
                        mrope_cur,
                        remaining,
                        hist_c,
                        hcount,
                        forced_c,
                        jnp.asarray(seg_cap, jnp.int32),
                        temperature=sampling.temperature,
                        top_p=sampling.top_p,
                        repetition_penalty=sampling.repetition_penalty,
                        n_steps=n_steps,
                        prompt_len=L,
                        draft_k=draft_k,
                        replay=forced_c is not None,
                    )
                elif spec_active:
                    (toks, lps, emitted_n, n_verify, token, ak, av, seen,
                     attn_valid, hist, done, rng, cursor, mrope_cur,
                     remaining) = self._segment_spec(
                        self.params,
                        token,
                        arena["k"],
                        arena["v"],
                        seen,
                        attn_valid,
                        done,
                        rng,
                        cursor,
                        mrope_cur,
                        remaining,
                        hist,
                        temperature=sampling.temperature,
                        top_p=sampling.top_p,
                        repetition_penalty=sampling.repetition_penalty,
                        n_steps=n_steps,
                        prompt_len=L,
                        draft_k=draft_k,
                    )
                else:
                    (toks, lps, emitted_n, token, ak, av, seen, attn_valid,
                     done, rng, cursor, mrope_cur, remaining) = self._segment(
                        self.params,
                        token,
                        arena["k"],
                        arena["v"],
                        seen,
                        attn_valid,
                        done,
                        rng,
                        cursor,
                        mrope_cur,
                        remaining,
                        jnp.asarray(seg_cap, jnp.int32),
                        temperature=sampling.temperature,
                        top_p=sampling.top_p,
                        repetition_penalty=sampling.repetition_penalty,
                        n_steps=n_steps,
                        prompt_len=L,
                    )
                arena = {"k": ak, "v": av}
                # one batched host fetch; doubles as the device sync for the
                # stage timer
                toks_h, lps_h, emitted_h, done_h = self._fetch(
                    (toks, lps, emitted_n, done)
                )
                nv_seg = 0
                if spec_active or spec_sample_now:
                    nv_seg = int(self._fetch(n_verify))
                    self.spec_stats["verify_steps"] += nv_seg
                    self.spec_stats["emitted"] += int(emitted_h.sum())
            for s in active:
                rid = slot_rid[s]
                n = int(emitted_h[s])
                emitted[rid].extend(int(t) for t in toks_h[s, :n])
                lp_acc[rid].extend(float(x) for x in lps_h[s, :n])
                if done_h[s]:
                    finalize(s)
            if spec_sample_now and spec_probe_pending:
                # Acceptance-probe verdict: below spec_min_rate tokens per
                # verify per live row, the (B, K1) verify forwards cost more
                # than the drafts save — finish the group on the plain ring
                # path (the documented exhaustion fallback, holes stay
                # invalid). Probed once per group; 8+ verifies for a stable
                # estimate (an instant EOS-only probe stays speculative).
                spec_probe_pending = False
                rate = int(emitted_h.sum()) / max(nv_seg, 1) / max(len(active), 1)
                if nv_seg >= 8 and rate < self.spec_min_rate:
                    spec_sample_active = False
                    self.spec_stats["probe_disabled"] += 1
            if (
                spec_sample_now
                and spec_sample_active
                and not all(done_h)
                and int(emitted_h.max()) < seg_cap
            ):
                # Column surplus exhausted with rows still live (the only
                # other early exit is the n_steps segment boundary, excluded
                # above). Compact the hole columns and RE-ENTER the spec
                # loop next segment; if a segment right after a compaction
                # emitted nothing, compaction can no longer make room
                # (cc_min + K1 + live_rem > ring) — finish with the plain
                # ring path, which continues monotonically from `cursor`
                # (the loop invariant guarantees the remaining budget fits
                # without wrapping over valid columns, and compaction only
                # ever reduces the cursor).
                if spec_just_compacted and int(emitted_h.sum()) == 0:
                    spec_sample_active = False
                else:
                    ak2, av2, attn_valid, kv_pos, cursor = self._spec_compact(
                        arena["k"], arena["v"], attn_valid, kv_pos,
                        prompt_len=L,
                    )
                    arena = {"k": ak2, "v": av2}
                    spec_just_compacted = True
            elif spec_sample_now:
                spec_just_compacted = False

        def bind_new_rows(slots, rids, logits, seen_rows, attn_rows, next_pos):
            """Sample first tokens for freshly prefilled rows and bind them
            onto their decode slots (shared by the plain and shared-prefix
            admission paths; DP-wave binding stays inline below)."""
            nonlocal token, mrope_cur, remaining, done, attn_valid, seen, rng
            nonlocal hist_c, hcount, forced_c
            # Slot composition changed: the sampled-spec compact histories
            # are stale; rebuild lazily from host state (prompt + emitted)
            # at the next spec segment.
            hist_c = hcount = forced_c = None
            # Sync here so admit compute lands in the enclosing "prefill"
            # stage, then account sampling + slot binding separately.
            jax.block_until_ready(logits)
            with self.timer.stage("sample_bind"):
                n_new = len(slots)
                seen_rows_dev = self._put(seen_rows)
                rng, sub = jax.random.split(rng)
                first, first_lp = self._first_sample(
                    sub,
                    logits,
                    seen_rows_dev,
                    temperature=sampling.temperature,
                    top_p=sampling.top_p,
                    repetition_penalty=sampling.repetition_penalty,
                )
                first_h, first_lp_h = self._fetch((first, first_lp))
                row_done = np.asarray(
                    (first_h == eos) | (sampling.max_tokens <= 1)
                ).copy()
                (token, mrope_cur, remaining, done, attn_valid, seen) = self._bind(
                    token,
                    mrope_cur,
                    remaining,
                    done,
                    attn_valid,
                    seen,
                    self._put(slots, to_i32=True),
                    first,
                    self._put(next_pos, to_i32=True),
                    self._put(attn_rows),
                    seen_rows_dev,
                    self._put(row_done),
                    self._put(np.full(n_new, sampling.max_tokens - 1, np.int32)),
                )
                for j, (s, rid) in enumerate(zip(slots, rids)):
                    slot_rid[s] = rid
                    emitted[rid] = [int(first_h[j])]
                    lp_acc[rid] = [float(first_lp_h[j])]
                    if row_done[j]:
                        finalize(s)
                if spec_active:
                    # Rebuild the drafting history for the (single) fresh
                    # row and restart its monotonic column cursor — the
                    # admission rewrote columns [0, L), so the decode
                    # region starts clean. Layout-agnostic: a row's VALID
                    # prompt columns hold its tokens in order (true for
                    # plain left-padding and for the prefix+suffix layout).
                    nonlocal hist, cursor
                    row = np.full((1, T), cfg.pad_token_id, np.int32)
                    ids0 = np.asarray(requests[rids[0]].input_ids, np.int32)
                    cols = np.nonzero(np.asarray(attn_rows[0, :L]))[0]
                    row[0, cols] = ids0
                    hist = self._put(row)
                    cursor = self._put(np.asarray(0))

        def bind_wave(slots, rids, logits, seen_rows, attn_rows_dev, next_pos):
            """Sample + bind a full DP wave (every slot row replaced);
            padding rows are marked done immediately."""
            nonlocal token, mrope_cur, remaining, done, attn_valid, seen, rng
            jax.block_until_ready(logits)
            with self.timer.stage("sample_bind"):
                n_new = len(slots)
                seen_rows_dev = self._put(seen_rows, row_dim=0)
                rng, sub = jax.random.split(rng)
                first, first_lp = self._first_sample(
                    sub,
                    logits,
                    seen_rows_dev,
                    temperature=sampling.temperature,
                    top_p=sampling.top_p,
                    repetition_penalty=sampling.repetition_penalty,
                )
                first_h, first_lp_h = self._fetch((first, first_lp))
                row_done = np.asarray(
                    (first_h == eos) | (sampling.max_tokens <= 1)
                ).copy()
                for j, rid in enumerate(rids):
                    if rid >= n_real:
                        row_done[j] = True  # padding rows end immediately
                (token, mrope_cur, remaining, done, attn_valid, seen) = (
                    self._bind_full(
                        seen_rows_dev,
                        first,
                        self._put(next_pos, to_i32=True, row_dim=0),
                        attn_rows_dev,
                        self._put(row_done, row_dim=0),
                        self._put(
                            np.full(n_new, sampling.max_tokens - 1, np.int32),
                            row_dim=0,
                        ),
                    )
                )
                for j, (s, rid) in enumerate(zip(slots, rids)):
                    slot_rid[s] = rid
                    emitted[rid] = [int(first_h[j])]
                    lp_acc[rid] = [float(first_lp_h[j])]
                    if row_done[j]:
                        finalize(s)

        def admit_with_prefix_wave(slots, rids):
            """DP fleet + shared prefixes: one full wave, each row's prefix
            KV gathered from a replicated table of the wave's unique prefix
            blocks. Padding rows (rid >= n_real) run prefix-less."""
            nonlocal arena
            S_b = L - prefix_bucket
            reqs_w = [requests[r] for r in rids]
            pls = [prefix_lens[r] if r < n_real else 0 for r in rids]
            order: list = []
            idx_of: dict = {}
            entries: dict = {}
            for r, pl in zip(rids, pls):
                if pl == 0:
                    continue
                req = requests[r]
                k_ = (tuple(req.input_ids[:pl]),) + self._vis_key(req)
                if k_ not in idx_of:
                    with self.timer.stage("prefill"):
                        entries[k_] = self._ensure_prefix(
                            req, pl, prefix_bucket, vis_cache
                        )
                    idx_of[k_] = len(order)
                    order.append(k_)
            row_idx = np.zeros(len(rids), np.int32)
            prefix_valid_rows = np.zeros((len(rids), prefix_bucket), bool)
            for j, (r, pl) in enumerate(zip(rids, pls)):
                if pl == 0:
                    continue
                req = requests[r]
                k_ = (tuple(req.input_ids[:pl]),) + self._vis_key(req)
                row_idx[j] = idx_of[k_]
                prefix_valid_rows[j] = entries[k_]["valid"]
            with self.timer.stage("prefill"), trace_annotation("engine.prefill"):
                (embeds, pos, seq_pos, attn_rows, seen_rows, next_pos) = (
                    self._prepare_suffix_rows(
                        reqs_w, pls, prefix_bucket, S_b, T, prefix_valid_rows
                    )
                )
                attn_rows_dev = self._put(attn_rows, row_dim=0)
                logits, ak, av = self._admit_suffix_full(
                    self.params,
                    embeds,
                    self._put(pos, row_dim=1),
                    self._put(seq_pos, row_dim=0),
                    attn_rows_dev,
                    arena["k"],
                    arena["v"],
                    jnp.stack([entries[k_]["k"] for k_ in order]),
                    jnp.stack([entries[k_]["v"] for k_ in order]),
                    self._put(row_idx, row_dim=0),
                )
                arena = {"k": ak, "v": av}
                bind_wave(slots, rids, logits, seen_rows, attn_rows_dev, next_pos)

        def admit_with_prefix(slots, rids):
            """Shared-prefix admission: one cached prefix prefill per unique
            prefix, then text-only suffix rows at a cache offset."""
            nonlocal arena
            sub: dict = {}
            for s, rid in zip(slots, rids):
                r = requests[rid]
                k_ = (tuple(r.input_ids[:prefix_lens[rid]]),) + self._vis_key(r)
                sub.setdefault(k_, []).append((s, rid))
            S_b = L - prefix_bucket
            for pairs in sub.values():
                sub_slots = [s for s, _ in pairs]
                sub_rids = [rid for _, rid in pairs]
                sub_reqs = [requests[r] for r in sub_rids]
                pls = [prefix_lens[r] for r in sub_rids]
                with self.timer.stage("prefill"), trace_annotation("engine.prefill"):
                    entry = self._ensure_prefix(
                        sub_reqs[0], pls[0], prefix_bucket, vis_cache
                    )
                    (embeds, pos, seq_pos, attn_rows, seen_rows, next_pos) = (
                        self._prepare_suffix_rows(
                            sub_reqs, pls, prefix_bucket, S_b, T, entry["valid"]
                        )
                    )
                    logits, ak, av = self._admit_suffix(
                        self.params,
                        embeds,
                        self._put(pos),
                        self._put(seq_pos),
                        self._put(attn_rows),
                        arena["k"],
                        arena["v"],
                        self._put(sub_slots, to_i32=True),
                        entry["k"],
                        entry["v"],
                    )
                    arena = {"k": ak, "v": av}
                    bind_new_rows(sub_slots, sub_rids, logits, seen_rows,
                                  attn_rows, next_pos)

        while True:
            free = [s for s in range(B) if slot_rid[s] is None]
            n_admit = min(len(free), len(idxs) - qpos)
            if n_admit and prefix_bucket and self._dp:
                slots = free[:n_admit]
                rids = idxs[qpos:qpos + n_admit]
                qpos += n_admit
                admit_with_prefix_wave(slots, rids)
            elif n_admit and prefix_bucket:
                slots = free[:n_admit]
                rids = idxs[qpos:qpos + n_admit]
                qpos += n_admit
                admit_with_prefix(slots, rids)
            elif n_admit:
                slots = free[:n_admit]
                rids = idxs[qpos:qpos + n_admit]
                qpos += n_admit
                reqs = [requests[r] for r in rids]
                with self.timer.stage("prepare"), trace_annotation("engine.prepare"):
                    (embeds, pos, seq_pos, attn_rows, seen_rows, next_pos,
                     deepstack) = self._prepare_rows(reqs, L, T, vis_cache)
                ds_tables, ds_idx = (
                    deepstack if deepstack is not None else (None, None)
                )
                chunk = self.prefill_chunk
                # Memory-driven long-context chunking applies in DP fleet
                # mode too: every DP admission is a full wave, so the
                # chunked path writes the row-sharded arena directly.
                long_admission = (
                    L >= self.long_prefill_threshold
                    and self.long_prefill_chunk
                )
                if chunk is None and long_admission:
                    chunk = self.long_prefill_chunk  # memory-driven chunking
                chunked = (
                    chunk is not None
                    and L > chunk
                    and (
                        any(slot_rid[s] is not None for s in range(B))
                        or long_admission
                    )
                )
                with self.timer.stage("prefill"), trace_annotation("engine.prefill"):
                    if chunked:
                        # vLLM-style chunked prefill: fill a per-admission
                        # rows cache chunk by chunk, running decode segments
                        # for the ACTIVE slots in between, then scatter the
                        # rows into arena slots. When the admission replaces
                        # EVERY slot (n_admit == B — always true for a
                        # single long-context request), the arena itself is
                        # the rows cache: no second full-length KV
                        # allocation, which matters when one 81920-token
                        # row is ~5 GB.
                        assert L % chunk == 0, "prefill_chunk must divide the bucket"
                        full_wave = n_admit == B
                        # DP fleet admissions are always full waves (the
                        # scheduler pads the queue), so `rows` is the
                        # row-sharded arena itself and the per-row puts
                        # shard over the batch axis like _admit_full's.
                        assert not self._dp or full_wave
                        rd = 0 if self._dp else None
                        rows = arena if full_wave else self._new_cache(n_admit, T)
                        pos_d = self._put(pos, row_dim=(1 if self._dp else None))
                        seq_pos_d = self._put(seq_pos, row_dim=rd)
                        attn_rows_d = self._put(attn_rows, row_dim=rd)
                        attn_rows_dev = attn_rows_d  # for the DP wave bind
                        for c0 in range(0, L, chunk):
                            logits, rk, rv = self._prefill_chunk_fn(
                                self.params,
                                embeds[:, c0:c0 + chunk],
                                pos_d[:, :, c0:c0 + chunk],
                                seq_pos_d[:, c0:c0 + chunk],
                                attn_rows_d,
                                rows["k"],
                                rows["v"],
                                self._put(np.asarray(c0, np.int32)),
                                ds_tables,
                                None if ds_idx is None else ds_idx[:, c0:c0 + chunk],
                            )
                            rows = {"k": rk, "v": rv}
                            if c0 + chunk < L and not full_wave:
                                run_segment(
                                    min(self.decode_segment, sampling.max_tokens),
                                    interleaved=True,
                                )
                        if full_wave:
                            ak, av = rows["k"], rows["v"]
                        else:
                            ak, av = self._scatter_rows(
                                arena["k"], arena["v"], rows["k"], rows["v"],
                                self._put(slots, to_i32=True),
                            )
                    elif self._dp:
                        # Full wave: every slot row is replaced, arena
                        # written directly (no scatter over the row-sharded
                        # cache).
                        attn_rows_dev = self._put(attn_rows, row_dim=0)
                        logits, ak, av = self._admit_full(
                            self.params,
                            embeds,
                            self._put(pos, row_dim=1),
                            self._put(seq_pos, row_dim=0),
                            attn_rows_dev,
                            arena["k"],
                            arena["v"],
                            ds_tables,
                            ds_idx,
                        )
                    else:
                        logits, ak, av = self._admit(
                            self.params,
                            embeds,
                            self._put(pos),
                            self._put(seq_pos),
                            self._put(attn_rows),
                            arena["k"],
                            arena["v"],
                            self._put(slots, to_i32=True),
                            ds_tables,
                            ds_idx,
                        )
                    arena = {"k": ak, "v": av}
                    if self._dp:
                        bind_wave(slots, rids, logits, seen_rows,
                                  attn_rows_dev, next_pos)
                    else:
                        bind_new_rows(slots, rids, logits, seen_rows,
                                      attn_rows, next_pos)

            if n_admit:
                # Vision embeddings are consumed at admission; keep only
                # entries still referenced by QUEUED requests (e.g. later
                # rollout copies of the same prompt) so a long stream of
                # distinct videos doesn't accumulate HBM.
                pending_keys = set()
                for rid2 in idxs[qpos:]:
                    r2 = requests[rid2]
                    if r2.pixel_patches is None and r2.frames is None:
                        continue
                    gk = tuple(map(tuple, np.asarray(r2.grid_thw).tolist()))
                    pending_keys.add((id(r2.pixel_patches), id(r2.frames), gk))
                for stale in [k_ for k_ in vis_cache if k_ not in pending_keys]:
                    del vis_cache[stale]

            if all(slot_rid[s] is None for s in range(B)):
                if qpos >= len(idxs):
                    break
                continue

            # Segments exist to create refill points; with an empty queue
            # there is nothing to admit, so run the rest of the decode as
            # ONE fused program (the while_loop still exits early once
            # every row is done) — host round trips per segment are pure
            # overhead then.
            run_segment(
                sampling.max_tokens
                if (self._dp or qpos >= len(idxs))
                else min(self.decode_segment, sampling.max_tokens)
            )

        self._arenas[(B, T)] = arena  # persist for the next generate() call
