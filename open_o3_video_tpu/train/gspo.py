"""GSPO (Group Sequence Policy Optimization) trainer.

TPU-native rebuild of Qwen2VLGRPOTrainer.compute_loss
(src/r1-v/src/open_r1/trainer/grpo_trainer.py:402-742):

per step (1 prompt per data replica, mirroring bs=1/device):
1. ROLLOUT: G=4 on-TPU samples via the inference engine (== in-process
   HF .generate, grpo_trainer.py:581-586; top_p 0.95, temperature 1,
   max_new_tokens 768, grpo_trainer.py:306-313)
2. completion mask after the first EOS (:591-596)
3. policy + frozen-reference per-token logps over prompt+completion
4. k3 KL estimator: exp(clamp(ref-pol, ±10)) - x - 1 (:634-636)
5. rewards (host, pure python) -> group-normalized advantages
   (r - mean_G)/(std_G + 1e-4) with Bessel-corrected std (:674-681)
6. sequence-level clipped importance weights (gspo=True, :691-706),
   loss = mean over masked tokens then over batch
7. metrics: completion_length, per-reward means, all_wrong/all_correct
   thresholds (<=1 / >=2 on summed rewards, :722-733), reward, kl
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..grounding.rewards import REWARD_REGISTRY, RewardFn
from ..models import family_forward, is_aria
from ..models.qwen25vl import Qwen25VLConfig
from ..utils.metrics import MetricsBus
from ..utils.profiling import StageTimer


@dataclasses.dataclass
class GSPOConfig:
    """Defaults mirror run_grpo_video.sh + grpo_trainer.py."""

    num_generations: int = 4
    max_prompt_length: int = 16384
    max_completion_length: int = 768
    beta: float = 0.04
    epsilon_low: float = 0.2
    epsilon_high: float = 0.2
    gspo: bool = True  # False -> token-level GRPO importance weights
    temperature: float = 1.0
    top_p: float = 0.95
    learning_rate: float = 1e-6
    max_grad_norm: float = 5.0
    logging_steps: int = 1
    # Rematerialize decoder layers in the update's backward pass (== the
    # reference's gradient_checkpointing, run_grpo_video.sh:27).
    gradient_checkpointing: bool = True
    # Bound live logits to (G, logp_chunk, vocab) in the logp/update
    # programs (models/.../text.py per_token_logps_from_hidden) — the
    # full-dims single-chip memory knob. None = dense lm_head.
    logp_chunk: Optional[int] = 256
    # Drop the rollout engine's KV arenas + prefix blocks after each
    # rollout: at 7B dims on one 16 GB chip the update phase needs the
    # HBM, and the prefix blocks are dead after the step's weight swap
    # anyway. Costs one arena re-alloc per step.
    release_engine_memory: bool = True
    # Multi-row sampled speculative decoding for the rollout (engine
    # spec_sample): prompt-lookup drafts verified in one (draft_k+1)-token
    # forward per iteration — distributionally exact for temperature
    # sampling (sample-and-match acceptance), so rollouts remain on-policy;
    # throughput scales with the trace's self-repetition. Opt-in.
    spec_rollout: bool = False


def group_advantages(rewards: np.ndarray, num_generations: int) -> np.ndarray:
    """(r - mean_G) / (std_G + 1e-4), std with Bessel correction (torch
    .std(dim=1) semantics, grpo_trainer.py:675-681)."""
    groups = rewards.reshape(-1, num_generations)
    mean = groups.mean(axis=1, keepdims=True)
    std = groups.std(axis=1, ddof=1, keepdims=True)
    return ((groups - mean) / (std + 1e-4)).reshape(-1)


def completion_mask_after_eos(completion_ids: np.ndarray, eos_token_id: int) -> np.ndarray:
    """1 for tokens up to and including the first EOS (grpo_trainer.py:591-596)."""
    B, L = completion_ids.shape
    is_eos = completion_ids == eos_token_id
    eos_idx = np.full(B, L, dtype=np.int64)
    any_eos = is_eos.any(axis=1)
    eos_idx[any_eos] = is_eos.argmax(axis=1)[any_eos]
    return (np.arange(L)[None, :] <= eos_idx[:, None]).astype(np.int32)


def make_logps_fn(model_cfg):
    """Returns a builder for jitted per-token logp scorers over full
    (prompt+completion) sequences; one scorer per (grid, vision-token) combo
    since grid shapes are compile-time constants.

    ``vision_arr`` is the family's vision payload: flattened pixel patches
    for the Qwen families, (n_images, C, H, W) crops for Aria
    (models.family_forward).

    ``prompt_length`` (static): score ONLY the completion region — the
    hidden states are sliced BEFORE the lm_head, so the logits tensor is
    (B, Lc, vocab) instead of (B, L, vocab) (4x smaller at the reference's
    16384-prompt/768-completion envelope). ``chunk`` further bounds it via
    the scanned lm_head."""
    aria_mode = is_aria(model_cfg)

    def build(grid_thw, vision_token_id, prompt_length=None, chunk=None):
        from ..models.qwen25vl.text import per_token_logps_from_hidden

        @jax.jit
        def fn(params, input_ids, position_ids, vision_arr, attn_valid,
               vision_row_index=None):
            hidden, _ = family_forward(
                params, model_cfg, input_ids, position_ids,
                pixel_patches=None if aria_mode else vision_arr,
                grid_thw=grid_thw, vision_token_id=vision_token_id,
                pixel_values=vision_arr if aria_mode else None,
                attn_valid=attn_valid,
                vision_row_index=vision_row_index, return_hidden=True,
            )
            lo = 0 if prompt_length is None else prompt_length - 1
            return per_token_logps_from_hidden(
                params["text"], hidden[:, lo:-1], input_ids[:, lo + 1 :], chunk
            )

        return fn

    return build


def gspo_objective(
    per_token_logps: jnp.ndarray,  # (G, Lc) policy logps over completion tokens
    ref_per_token_logps: jnp.ndarray,  # (G, Lc)
    completion_mask: jnp.ndarray,  # (G, Lc)
    advantages: jnp.ndarray,  # (G,)
    cfg: GSPOConfig,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The GSPO/GRPO objective on per-token logps (grpo_trainer.py:634-706).

    Returns (loss, mean_kl). Factored out of the model forward so the math
    is differentially testable against a torch transcription of the
    reference equations (tests/test_train.py)."""
    mask = completion_mask.astype(per_token_logps.dtype)
    denom = jnp.clip(mask.sum(-1), 1.0, None)

    x_clamped = jnp.clip(ref_per_token_logps - per_token_logps, -10, 10)
    per_token_kl = jnp.exp(x_clamped) - x_clamped - 1

    log_ratio = per_token_logps - jax.lax.stop_gradient(per_token_logps)
    if cfg.gspo:
        log_iw = ((log_ratio * mask).sum(-1) / denom)[:, None]
    else:
        log_iw = log_ratio
    coef_1 = jnp.exp(log_iw)
    coef_2 = jnp.clip(coef_1, 1 - cfg.epsilon_low, 1 + cfg.epsilon_high)
    adv = advantages[:, None]
    per_token_loss = -jnp.minimum(coef_1 * adv, coef_2 * adv) + cfg.beta * per_token_kl
    loss = ((per_token_loss * mask).sum(-1) / denom).mean()
    mean_kl = ((per_token_kl * mask).sum(-1) / denom).mean()
    return loss, mean_kl


def gspo_loss(
    params: dict,
    model_cfg,
    cfg: GSPOConfig,
    input_ids: jnp.ndarray,  # (G, L) prompt+completion, right-padded
    position_ids: jnp.ndarray,  # (3, G, L)
    attn_valid: jnp.ndarray,  # (G, L)
    completion_mask: jnp.ndarray,  # (G, Lc) mask over completion tokens
    prompt_length: int,
    ref_per_token_logps: jnp.ndarray,  # (G, Lc)
    advantages: jnp.ndarray,  # (G,)
    pixel_patches: Optional[jnp.ndarray] = None,
    grid_thw=None,
    vision_token_id: Optional[int] = None,
    pixel_values: Optional[jnp.ndarray] = None,  # Aria's vision payload
    vision_row_index: Optional[jnp.ndarray] = None,
    remat: bool = False,
    logp_chunk: Optional[int] = None,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """The GSPO objective (grpo_trainer.py:634-706).

    Memory shape: the lm_head runs only over the completion slice of the
    hidden states (optionally chunk-scanned), so the update never holds a
    full-sequence logits tensor — see per_token_logps_from_hidden."""
    from ..models.qwen25vl.text import per_token_logps_from_hidden

    hidden, _ = family_forward(
        params, model_cfg, input_ids, position_ids,
        pixel_patches=pixel_patches, grid_thw=grid_thw,
        vision_token_id=vision_token_id, pixel_values=pixel_values,
        attn_valid=attn_valid,
        vision_row_index=vision_row_index, remat=remat, return_hidden=True,
    )
    per_token_logps = per_token_logps_from_hidden(
        params["text"],
        hidden[:, prompt_length - 1 : -1],
        input_ids[:, prompt_length:],
        logp_chunk,
    )  # (G, Lc)

    loss, mean_kl = gspo_objective(
        per_token_logps, ref_per_token_logps, completion_mask, advantages, cfg
    )
    return loss, {"kl": mean_kl, "policy_logps": per_token_logps}


class GSPOTrainer:
    """Drives rollout -> reward -> GSPO update. Media preparation (prompt
    building, frame interleave, tokenization) lives in data/rl_dataset.py;
    this class consumes prepared samples:

    sample = {
      "input_ids": list[int] prompt tokens (left-truncated to
                   max_prompt_length, grpo_trainer.py:569-578),
      "pixel_patches": np (S, patch_dim) or None,
      "grid_thw": np (num, 3) or None,
      "vision_token_id": int,
      "reward_kwargs": dict of dataset columns (task/answer/key_frames/...),
      "prompt": chat messages (for conversational reward formatting),
    }
    """

    def __init__(
        self,
        params: dict,
        ref_params: dict,
        model_cfg: Qwen25VLConfig,
        cfg: GSPOConfig,
        *,
        detokenize: Callable[[Sequence[int]], str],
        reward_funcs: Optional[Sequence[RewardFn]] = None,
        mesh=None,
        metrics: Optional[MetricsBus] = None,
        seed: int = 0,
        lora: "Optional[LoraConfig]" = None,
    ):
        from ..engine import InferenceEngine

        self.model_cfg = model_cfg
        self.cfg = cfg
        self.detokenize = detokenize
        self.reward_funcs = list(reward_funcs) if reward_funcs is not None else list(REWARD_REGISTRY.values())
        self.metrics = metrics or MetricsBus()
        self.mesh = mesh
        self.seed = seed
        self.lora = lora
        if lora is not None:
            # PEFT path (grpo_trainer.py:244-248): the reference model is
            # the policy with adapters DISABLED — i.e. the frozen base —
            # so no second weight copy exists.
            ref_params = params
        if mesh is not None:
            from ..parallel.mesh import shard_params

            params = shard_params(params, mesh)
            ref_params = params if lora is not None else shard_params(ref_params, mesh)
        self.params = params
        self.ref_params = ref_params
        self.adapters = None
        if lora is not None:
            from .lora import init_adapters

            self.adapters = init_adapters(params, lora, dtype=jnp.bfloat16)
            if mesh is not None:
                from ..parallel.mesh import replicate

                self.adapters = replicate(self.adapters, mesh)
        # The engine shares the trainer's (already sharded) params; passing
        # the mesh turns on SPMD lockstep mode when it spans hosts. With a
        # data axis, rollout decode-state rows (the B*G sequences) shard
        # over it so the 768-step rollout loop's device compute scales with
        # the axis instead of being replicated — the reference's per-rank
        # rollout DP (run_grpo_video.sh:11-15) expressed as sharding.
        # Groups whose row count does not divide the axis transparently
        # fall back to replicated inside the engine.
        rollout_axis = (
            "data"
            if mesh is not None and dict(mesh.shape).get("data", 1) > 1
            else None
        )
        self.engine = InferenceEngine(
            params, model_cfg, mesh=mesh, spec_sample=cfg.spec_rollout,
            rollout_shard_axis=rollout_axis,
        )

        # BENCHMARK ONLY: when set (R, W) int32, rollouts replay these token
        # streams through the spec-sample path instead of sampling — see
        # engine.generate(replay_tokens=...). Never a training mode.
        self.replay_tokens = None

        # Per-stage wall clock (rollout/reward/logps/update), SURVEY §5.1.
        self.timer = StageTimer()
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adamw(cfg.learning_rate),
        )
        self.opt_state = self.optimizer.init(
            self.adapters if self.adapters is not None else self.params
        )
        if mesh is not None:
            from ..parallel.mesh import replicate_scalars

            self.opt_state = replicate_scalars(self.opt_state, mesh)
        self._step_fns: dict[Any, Callable] = {}

    # ---------------------------------------------------------------- public

    def _degrade_invalid_vision(self, sample: dict[str, Any]) -> dict[str, Any]:
        """Strip vision from a sample whose tensors are inconsistent."""
        mcfg = self.model_cfg
        if is_aria(mcfg):
            pv = sample.get("pixel_values")
            if pv is None:
                return sample
            try:
                pv = np.asarray(pv)
                q = mcfg.query_num(mcfg.vision.num_patches_per_side ** 2)
                n_placeholders = sum(
                    1 for t in sample["input_ids"] if t == mcfg.image_token_id
                )
                ok = pv.ndim == 4 and n_placeholders == pv.shape[0] * q
            except Exception:
                ok = False
            if ok:
                return sample
            print("[warn] inconsistent vision tensors; degrading sample to text-only")
            out = dict(sample)
            out["pixel_values"] = None
            return out
        if sample.get("grid_thw") is None:
            return sample
        try:
            grid = np.asarray(sample["grid_thw"])
            patches = np.asarray(sample["pixel_patches"])
            expected = int(grid.prod(axis=1).sum())
            tok = sample.get("vision_token_id", mcfg.image_token_id)
            n_placeholders = sum(
                1 for t in sample["input_ids"] if t == tok
            )
            ok = (
                patches.shape[0] == expected
                and n_placeholders == expected // mcfg.vision.merge_unit
            )
        except Exception:
            ok = False
        if ok:
            return sample
        print("[warn] inconsistent vision tensors; degrading sample to text-only")
        out = dict(sample)
        out["pixel_patches"] = None
        out["grid_thw"] = None
        out["vision_token_id"] = None
        return out

    def step(self, sample: dict[str, Any], global_step: int, max_steps: int) -> dict[str, float]:
        """One prompt (the reference's bs=1/device path)."""
        return self.step_batch([sample], global_step, max_steps)

    def step_batch(
        self, samples: Sequence[dict[str, Any]], global_step: int, max_steps: int
    ) -> dict[str, float]:
        """One GSPO update over ``B = len(samples)`` prompts x G generations.

        The TPU-native replacement for the reference's 8-process DDP step
        (1 prompt/GPU, run_grpo_video.sh:11): all B*G sequences form one
        global batch sharded over the mesh ``data`` axis; XLA GSPMD inserts
        the gradient psum (== NCCL all-reduce) and the returned metrics are
        means over every replica (== accelerator.gather_for_metrics,
        grpo_trainer.py:711-738). Vision is encoded ONCE per prompt and
        shared across its G rows via an explicit row-index merge — the
        reference instead tiles pixel_values xG (grpo_trainer.py:601-609).
        """
        cfg, mcfg = self.cfg, self.model_cfg
        from ..engine import Request, SamplingParams

        G = cfg.num_generations
        B = len(samples)
        R = B * G  # total sequence rows
        if self.mesh is not None:
            dsize = self.mesh.shape["data"]
            assert R % dsize == 0, f"B*G={R} not divisible by data axis {dsize}"

        # Multi-host lockstep guard: every host must have built the SAME
        # batch (host-local absorption could otherwise desync the fleet
        # into a collective deadlock; fail loudly instead).
        multi_host = jax.process_count() > 1
        if multi_host:
            from ..parallel.distributed import assert_in_sync

            digest = np.asarray(
                [len(samples)]
                + [np.int64(np.sum(s2["input_ids"]) % (2**31)) for s2 in samples]
                + [int(s2.get("grid_thw") is not None
                       or s2.get("pixel_values") is not None)
                   for s2 in samples]
            )
            assert_in_sync(digest, tag="gspo step batch")

        # Degrade invalid vision BEFORE the rollout (reference absorbs vision
        # failures per step and falls back to no-vision forwards,
        # grpo_trainer.py:452-465, 611-632): a sample whose patch count
        # disagrees with its grid or placeholder count runs as text-only
        # instead of killing the step.
        # Truncate BEFORE the vision validation: a left-truncation that
        # chops leading vision placeholders (prompt > max_prompt_length)
        # would otherwise pass the count check on the full ids and then
        # silently misalign every surviving placeholder against the first
        # frames' features. Post-truncation the count check fails and the
        # sample degrades to text-only (the reference errors inside the HF
        # forward for the same input; degrade-not-crash is this module's
        # documented failure contract).
        def _truncate(s):
            ids = list(s["input_ids"])
            if len(ids) <= cfg.max_prompt_length:
                return s
            out = dict(s)
            out["input_ids"] = ids[-cfg.max_prompt_length:]
            return out

        samples = [self._degrade_invalid_vision(_truncate(s)) for s in samples]

        # Left-pad every prompt to a common length bucket so the jitted
        # logp/update programs are reused across steps (pads are masked via
        # attn_valid; positions recomputed with the mask).
        bucket = 256
        prompts = [list(s["input_ids"]) for s in samples]
        Lp = -(-max(len(p) for p in prompts) // bucket) * bucket

        # 1. rollout — ONE batched engine call for all B*G sequences
        if self.adapters is not None:
            from .lora import apply_adapters

            # rollouts use base + CURRENT adapters (zero-copy graft)
            self.engine.params = apply_adapters(
                self.params, self.adapters, self.lora.scale
            )
        else:
            self.engine.params = self.params  # rollouts always use latest policy
        aria_mode = is_aria(mcfg)
        reqs = []
        for s, p in zip(samples, prompts):
            if aria_mode:
                # The shared engine serves Aria via precomputed features
                # (Request.vision_embeds); encode with the CURRENT policy
                # params — the reference's in-process .generate likewise
                # runs the trainable tower (grpo_trainer.py:581-586).
                if s.get("pixel_values") is not None:
                    from ..models.aria import get_image_features

                    feats = get_image_features(
                        self.engine.params, mcfg, jnp.asarray(s["pixel_values"])
                    )
                    req = Request(input_ids=p, vision_embeds=feats,
                                  vision_token_id=mcfg.image_token_id)
                else:
                    req = Request(input_ids=p)
            else:
                req = Request(
                    input_ids=p,
                    pixel_patches=s.get("pixel_patches"),
                    grid_thw=s.get("grid_thw"),
                    vision_token_id=s.get("vision_token_id"),
                )
            reqs.extend([req] * G)
        with self.timer.stage("rollout"):
            outs = self.engine.generate(
                reqs,
                SamplingParams(
                    temperature=cfg.temperature,
                    top_p=cfg.top_p,
                    repetition_penalty=1.0,
                    max_tokens=cfg.max_completion_length,
                    seed=self.seed + global_step,
                ),
                replay_tokens=self.replay_tokens,
            )
        if cfg.release_engine_memory:
            self.engine.release_memory()
        completions_ids = [o["token_ids"] for o in outs]

        # 2. rewards on host (dataset columns repeated per generation,
        #    grpo_trainer.py:650-655; step_percent drives adaptive sigma
        #    :467-469). Multi-host: each host detokenizes + scores only its
        #    CONTIGUOUS prompt chunk (the reference preps per rank,
        #    run_grpo_video.sh:11-15) and the per-func reward matrix is
        #    allgathered — every host then computes identical advantages,
        #    so the lockstep update is bit-identical to replicated scoring
        #    while per-host detok/regex/rouge work drops by 1/process_count.
        n_proc = jax.process_count()
        if multi_host and B % n_proc == 0:
            b_loc = B // n_proc
            lo = jax.process_index() * b_loc * G
            hi = lo + b_loc * G
        else:
            lo, hi = 0, R
        completions_text = [self.detokenize(ids) for ids in completions_ids[lo:hi]]
        completions = [[{"role": "assistant", "content": txt}] for txt in completions_text]
        step_percent = (global_step + 1) / max_steps
        keys = set()
        for s in samples:
            keys.update(s.get("reward_kwargs", {}).keys())
        rows = [s for s in samples for _ in range(G)][lo:hi]
        reward_kwargs = {
            key: [s.get("reward_kwargs", {}).get(key) for s in rows]
            for key in keys
        }
        reward_kwargs["step_percent"] = [step_percent] * (hi - lo)
        rewards_local = np.zeros((hi - lo, len(self.reward_funcs)), dtype=np.float32)
        with self.timer.stage("reward"):
            for i, fn in enumerate(self.reward_funcs):
                rewards_local[:, i] = np.asarray(
                    fn(completions=completions, **reward_kwargs), dtype=np.float32
                )
            if (lo, hi) != (0, R):
                from jax.experimental import multihost_utils

                # (P, R/P, F) in process order == row order (contiguous chunks)
                rewards_per_func = np.asarray(
                    multihost_utils.process_allgather(rewards_local)
                ).reshape(R, len(self.reward_funcs))
            else:
                rewards_per_func = rewards_local
        rewards = rewards_per_func.sum(axis=1)
        advantages = group_advantages(rewards, G)  # group-local per prompt

        # 3. pack (left-padded prompt)+completion, right padding after EOS
        Lc = cfg.max_completion_length
        total = Lp + Lc
        ids = np.full((R, total), mcfg.pad_token_id, dtype=np.int64)
        attn_valid = np.zeros((R, total), dtype=bool)
        comp_ids = np.full((R, Lc), mcfg.pad_token_id, dtype=np.int64)
        for r in range(R):
            p = prompts[r // G]
            n_left = Lp - len(p)
            ids[r, n_left:Lp] = p
            n = min(len(completions_ids[r]), Lc)
            ids[r, Lp : Lp + n] = completions_ids[r][:n]
            attn_valid[r, n_left : Lp + n] = True
            comp_ids[r, :n] = completions_ids[r][:n]
        completion_mask = completion_mask_after_eos(comp_ids, mcfg.eos_token_id)
        # tokens past each row's real completion are masked regardless of EOS
        for r in range(R):
            completion_mask[r, len(completions_ids[r]) :] = 0

        # 4. vision: concat UNIQUE payloads across prompts; every row of a
        #    prompt maps its placeholders to the same vision rows.
        from ..models.qwen25vl import build_vision_row_index, get_rope_index

        amask = attn_valid.astype(np.int64)
        patches = grid = vision_row_index = None
        if aria_mode:
            # Aria: concat (n_images, C, H, W) crops; each image contributes
            # query_num feature rows (projector query bank), so offsets
            # count in query rows. Positions are plain sequential rope for
            # every row (models/aria/model.py get_rope_index).
            from ..models.aria import get_rope_index as aria_rope_index

            vis_tok = (mcfg.image_token_id
                       if any(s.get("pixel_values") is not None for s in samples)
                       else None)
            if vis_tok is not None:
                q = mcfg.query_num(mcfg.vision.num_patches_per_side ** 2)
                patch_list, offsets = [], []
                n_rows_feat = 0
                for s in samples:
                    if s.get("pixel_values") is not None:
                        offsets.append(n_rows_feat)
                        patch_list.append(np.asarray(s["pixel_values"]))
                        n_rows_feat += patch_list[-1].shape[0] * q
                    else:
                        offsets.append(None)  # text-only/degraded
                patches = np.concatenate(patch_list, axis=0)
                row_offsets = [offsets[r // G] for r in range(R)]
                vision_row_index = build_vision_row_index(
                    ids, mcfg.image_token_id, row_offsets
                )
            position_ids = aria_rope_index(mcfg, ids, attention_mask=amask)
        else:
            vis_samples = [s for s in samples if s.get("grid_thw") is not None]
            # Image- and video-token samples can mix freely in one batch: the
            # explicit row-index merge is token-id-agnostic, and positions
            # are computed per modality group below.
            vis_tok = (vis_samples[0].get("vision_token_id")
                       if vis_samples else None)

            if vis_samples:
                patch_list, grid_list, offsets = [], [], []
                n_merged = 0
                for s in samples:
                    if s.get("grid_thw") is not None:
                        offsets.append(n_merged)
                        patch_list.append(np.asarray(s["pixel_patches"]))
                        grid_list.append(np.asarray(s["grid_thw"]))
                        n_merged += patch_list[-1].shape[0] // mcfg.vision.merge_unit
                    else:
                        offsets.append(None)  # text-only/degraded: no mapping
                patches = np.concatenate(patch_list, axis=0)
                grid = np.concatenate(grid_list, axis=0)
                row_offsets = [offsets[r // G] for r in range(R)]
                row_toks = [samples[r // G].get("vision_token_id") for r in range(R)]
                vision_row_index = build_vision_row_index(ids, row_toks, row_offsets)

            # Positions: vision rows consume their grids in row order,
            # computed per modality group; text-only (incl. degraded) rows
            # take sequential text positions even if placeholder tokens
            # remain — matching the reference's no-vision fallback, where HF
            # computes rope without grid kwargs.
            position_ids = np.ones((3, R, total), dtype=np.int64)
            row_groups: dict = {}
            for r in range(R):
                s = samples[r // G]
                if s.get("grid_thw") is None:
                    key = None
                elif s.get("vision_token_id") == mcfg.video_token_id:
                    key = "video_grid_thw"
                else:
                    key = "image_grid_thw"
                row_groups.setdefault(key, []).append(r)
            for key, rows_ in row_groups.items():
                if key is None:
                    pos_, _ = get_rope_index(mcfg, ids[rows_], attention_mask=amask[rows_])
                else:
                    tiled = [np.asarray(samples[r // G]["grid_thw"]) for r in rows_]
                    pos_, _ = get_rope_index(
                        mcfg, ids[rows_], attention_mask=amask[rows_],
                        **{key: np.concatenate(tiled, axis=0)},
                    )
                position_ids[:, rows_] = pos_

        # 5. device placement — shard the batch over the data axis
        def put(x, spec):
            if x is None:
                return None
            x = jnp.asarray(x)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P_

                return jax.device_put(x, NamedSharding(self.mesh, P_(*spec)))
            return x

        batch_spec = ("data",)
        ids_d = put(ids, batch_spec)
        pos_d = put(position_ids, (None, "data"))
        valid_d = put(attn_valid, batch_spec)
        cmask_d = put(completion_mask, batch_spec)
        adv_d = put(advantages, batch_spec)
        vri_d = put(vision_row_index, batch_spec)
        patches_d = put(patches, (None,))  # replicated: ragged across prompts

        # 6. reference logps (frozen params, no grad); on failure retry
        #    without vision kwargs (reference degraded recompute,
        #    grpo_trainer.py:611-632).
        if aria_mode and patches is not None:
            grid_key = ("aria", tuple(patches.shape))
        else:
            grid_key = None if grid is None else tuple(map(tuple, grid.tolist()))
        logps_key = (grid_key, vis_tok, total, R)
        if ("logps", logps_key) not in self._step_fns:
            self._step_fns[("logps", logps_key)] = make_logps_fn(mcfg)(
                grid, vis_tok, prompt_length=Lp, chunk=cfg.logp_chunk
            )
        logps_fn = self._step_fns[("logps", logps_key)]
        try:
            with self.timer.stage("ref_logps"):
                ref_logps = logps_fn(
                    self.ref_params, ids_d, pos_d, patches_d, valid_d, vri_d
                )
                ref_logps.block_until_ready()
            use_vision = patches is not None
        except Exception as e:  # degraded recompute: drop vision kwargs
            if multi_host:
                # A host-local retry would desynchronize the fleet's
                # program schedule; propagate instead (all hosts see the
                # same inputs, so a deterministic failure hits every host).
                raise
            print(f"logps with vision failed ({e}); retrying without vision")
            nv_key = (None, None, total, R)
            if ("logps", nv_key) not in self._step_fns:
                self._step_fns[("logps", nv_key)] = make_logps_fn(mcfg)(
                    None, None, prompt_length=Lp, chunk=cfg.logp_chunk
                )
            logps_fn = self._step_fns[("logps", nv_key)]
            # The reference's degraded recompute drops the grid kwargs, so
            # HF recomputes rope WITHOUT them — degraded rows must take
            # sequential text positions (the convention stated above), not
            # the vision-grid positions computed for the healthy path.
            # (Aria's positions are sequential either way.)
            if not aria_mode:
                pos_nv, _ = get_rope_index(mcfg, ids, attention_mask=amask)
                pos_d = put(pos_nv, (None, "data"))
            ref_logps = logps_fn(self.ref_params, ids_d, pos_d, None, valid_d, None)
            use_vision = False
            logps_key = nv_key

        # 7. loss + update (jitted per shape bucket)
        upd_key = ("update", logps_key, Lp, self.adapters is not None)
        if upd_key not in self._step_fns:
            g_ = grid if use_vision else None
            vt_ = vis_tok if use_vision else None

            def vision_kw(arr):
                # family-correct vision payload for gspo_loss
                if aria_mode:
                    return {"pixel_values": arr}
                return {"pixel_patches": arr, "grid_thw": g_,
                        "vision_token_id": vt_}

            if self.adapters is not None:
                from .lora import apply_adapters

                lora_scale = self.lora.scale

                @jax.jit
                def update_fn(adapters, opt_state, base, ids, position_ids,
                              attn_valid, completion_mask, ref_logps,
                              advantages, patches, vri):
                    # PEFT update: grads through the adapter tree only —
                    # no base-sized gradient/optimizer buffers.
                    (loss, aux), grads = jax.value_and_grad(
                        lambda ad: gspo_loss(
                            apply_adapters(base, ad, lora_scale), mcfg, cfg,
                            ids, position_ids, attn_valid, completion_mask,
                            Lp, ref_logps, advantages, **vision_kw(patches),
                            vision_row_index=vri,
                            remat=cfg.gradient_checkpointing,
                            logp_chunk=cfg.logp_chunk,
                        ),
                        has_aux=True,
                    )(adapters)
                    updates, opt_state = self.optimizer.update(grads, opt_state, adapters)
                    adapters = optax.apply_updates(adapters, updates)
                    return adapters, opt_state, loss, aux["kl"]
            else:

                @jax.jit
                def update_fn(params, opt_state, ids, position_ids, attn_valid,
                              completion_mask, ref_logps, advantages, patches, vri):
                    (loss, aux), grads = jax.value_and_grad(
                        lambda p: gspo_loss(
                            p, mcfg, cfg, ids, position_ids, attn_valid,
                            completion_mask, Lp, ref_logps, advantages,
                            **vision_kw(patches),
                            vision_row_index=vri,
                            remat=cfg.gradient_checkpointing,
                            logp_chunk=cfg.logp_chunk,
                        ),
                        has_aux=True,
                    )(params)
                    updates, opt_state = self.optimizer.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return params, opt_state, loss, aux["kl"]

            self._step_fns[upd_key] = update_fn

        with self.timer.stage("update"):
            upd_args = (
                ids_d, pos_d, valid_d, cmask_d, ref_logps, adv_d,
                patches_d if use_vision else None,
                vri_d if use_vision else None,
            )
            if self.adapters is not None:
                self.adapters, self.opt_state, loss, kl = self._step_fns[upd_key](
                    self.adapters, self.opt_state, self.params, *upd_args
                )
            else:
                self.params, self.opt_state, loss, kl = self._step_fns[upd_key](
                    self.params, self.opt_state, *upd_args
                )
            loss.block_until_ready()

        # 8. metrics — means over ALL replicas' rows
        #    (== gather_for_metrics, grpo_trainer.py:711-738)
        from ..parallel.distributed import scalar

        groups = rewards.reshape(B, G)
        metrics = {
            "loss": scalar(loss),
            "kl": scalar(kl),
            "reward": float(rewards.mean()),
            "reward_std": float(groups.std(axis=1, ddof=1).mean()),
            "completion_length": float(completion_mask.sum(1).mean()),
            "all_wrong": float((groups <= 1).all(axis=1).mean()),
            "all_correct": float((groups >= 2).all(axis=1).mean()),
        }
        for i, fn in enumerate(self.reward_funcs):
            metrics[f"rewards/{getattr(fn, '__name__', f'fn{i}')}"] = float(
                rewards_per_func[:, i].mean()
            )
        self.metrics.push(**metrics)
        return metrics
