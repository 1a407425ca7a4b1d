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
from ..models.qwen25vl import Qwen25VLConfig, forward
from ..utils.metrics import MetricsBus


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


def make_logps_fn(model_cfg: Qwen25VLConfig):
    """Returns a builder for jitted per-token logp scorers over full
    (prompt+completion) sequences; one scorer per (grid, vision-token) combo
    since grid shapes are compile-time constants."""

    def build(grid_thw, vision_token_id):
        @jax.jit
        def fn(params, input_ids, position_ids, pixel_patches, attn_valid):
            logits, _ = forward(
                params, model_cfg, input_ids, position_ids,
                pixel_patches=pixel_patches, grid_thw=grid_thw,
                vision_token_id=vision_token_id, attn_valid=attn_valid,
            )
            logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
            tgt = input_ids[:, 1:]
            return jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]

        return fn

    return build


def gspo_loss(
    params: dict,
    model_cfg: Qwen25VLConfig,
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
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """The GSPO objective (grpo_trainer.py:634-706)."""
    logits, _ = forward(
        params, model_cfg, input_ids, position_ids,
        pixel_patches=pixel_patches, grid_thw=grid_thw,
        vision_token_id=vision_token_id, attn_valid=attn_valid,
    )
    logp_all = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    token_logps = jnp.take_along_axis(logp_all, input_ids[:, 1:][..., None], axis=-1)[..., 0]
    per_token_logps = token_logps[:, prompt_length - 1 :]  # (G, Lc)

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
    ):
        from ..engine import InferenceEngine

        self.model_cfg = model_cfg
        self.cfg = cfg
        self.detokenize = detokenize
        self.reward_funcs = list(reward_funcs) if reward_funcs is not None else list(REWARD_REGISTRY.values())
        self.metrics = metrics or MetricsBus()
        self.mesh = mesh
        self.seed = seed
        if mesh is not None:
            from ..parallel.mesh import shard_params

            params = shard_params(params, mesh)
            ref_params = shard_params(ref_params, mesh)
        self.params = params
        self.ref_params = ref_params
        self.engine = InferenceEngine(params, model_cfg)

        self.optimizer = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adamw(cfg.learning_rate),
        )
        self.opt_state = self.optimizer.init(self.params)
        self._step_fns: dict[Any, Callable] = {}

    # ---------------------------------------------------------------- public

    def step(self, sample: dict[str, Any], global_step: int, max_steps: int) -> dict[str, float]:
        cfg, mcfg = self.cfg, self.model_cfg
        from ..engine import Request, SamplingParams

        G = cfg.num_generations
        prompt_ids = list(sample["input_ids"])[-cfg.max_prompt_length :]
        # Left-pad the prompt to a length bucket so the jitted logp/update
        # programs are reused across prompts instead of recompiling per
        # length (pads are masked via attn_valid; positions recomputed).
        bucket = 256
        Lp_real = len(prompt_ids)
        Lp_pad = -(-Lp_real // bucket) * bucket
        n_left_pad = Lp_pad - Lp_real
        prompt_ids_padded = [self.model_cfg.pad_token_id] * n_left_pad + prompt_ids

        # 1. rollout
        req = Request(
            input_ids=prompt_ids,
            pixel_patches=sample.get("pixel_patches"),
            grid_thw=sample.get("grid_thw"),
            vision_token_id=sample.get("vision_token_id"),
        )
        self.engine.params = self.params  # rollouts always use latest policy
        outs = self.engine.generate(
            [req] * G,
            SamplingParams(
                temperature=cfg.temperature,
                top_p=cfg.top_p,
                repetition_penalty=1.0,
                max_tokens=cfg.max_completion_length,
                seed=self.seed + global_step,
            ),
        )
        completions_ids = [o["token_ids"] for o in outs]
        completions_text = [self.detokenize(ids) for ids in completions_ids]
        completions = [[{"role": "assistant", "content": txt}] for txt in completions_text]

        # 2. rewards on host (dataset columns repeated per generation,
        #    grpo_trainer.py:650-655; step_percent drives adaptive sigma :467-469)
        step_percent = (global_step + 1) / max_steps
        reward_kwargs = {
            key: [value] * G for key, value in sample.get("reward_kwargs", {}).items()
        }
        reward_kwargs["step_percent"] = [step_percent] * G
        rewards_per_func = np.zeros((G, len(self.reward_funcs)), dtype=np.float32)
        for i, fn in enumerate(self.reward_funcs):
            rewards_per_func[:, i] = np.asarray(
                fn(completions=completions, **reward_kwargs), dtype=np.float32
            )
        rewards = rewards_per_func.sum(axis=1)
        advantages = group_advantages(rewards, G)

        # 3. pack (left-padded prompt)+completion, right padding after EOS
        Lc = cfg.max_completion_length
        Lp = Lp_pad
        total = Lp + Lc
        ids = np.full((G, total), mcfg.pad_token_id, dtype=np.int64)
        attn_valid = np.zeros((G, total), dtype=bool)
        comp_ids = np.full((G, Lc), mcfg.pad_token_id, dtype=np.int64)
        for g in range(G):
            ids[g, :Lp] = prompt_ids_padded
            n = min(len(completions_ids[g]), Lc)
            ids[g, Lp : Lp + n] = completions_ids[g][:n]
            attn_valid[g, n_left_pad : Lp + n] = True
            comp_ids[g, :n] = completions_ids[g][:n]
        completion_mask = completion_mask_after_eos(comp_ids, mcfg.eos_token_id)
        # tokens past each row's real completion are masked regardless of EOS
        for g in range(G):
            completion_mask[g, len(completions_ids[g]) :] = 0

        from ..models.qwen25vl import get_rope_index

        kw = {}
        if sample.get("grid_thw") is not None:
            key = (
                "video_grid_thw"
                if sample.get("vision_token_id") == mcfg.video_token_id
                else "image_grid_thw"
            )
            kw[key] = np.asarray(sample["grid_thw"])
        position_ids, _ = get_rope_index(
            mcfg, ids, attention_mask=attn_valid.astype(np.int64), **kw
        )

        patches = sample.get("pixel_patches")
        grid = sample.get("grid_thw")
        vis_tok = sample.get("vision_token_id")

        # 4. reference logps (frozen params, no grad)
        logps_key = (None if grid is None else tuple(map(tuple, np.asarray(grid).tolist())), vis_tok, total)
        if ("logps", logps_key) not in self._step_fns:
            self._step_fns[("logps", logps_key)] = make_logps_fn(mcfg)(grid, vis_tok)
        logps_fn = self._step_fns[("logps", logps_key)]
        ref_logps = logps_fn(
            self.ref_params,
            jnp.asarray(ids),
            jnp.asarray(position_ids),
            None if patches is None else jnp.asarray(patches),
            jnp.asarray(attn_valid),
        )[:, Lp - 1 :]

        # 5. loss + update (jitted per shape bucket)
        upd_key = ("update", logps_key)
        if upd_key not in self._step_fns:

            @jax.jit
            def update_fn(params, opt_state, ids, position_ids, attn_valid,
                          completion_mask, ref_logps, advantages, patches):
                (loss, aux), grads = jax.value_and_grad(
                    lambda p: gspo_loss(
                        p, mcfg, cfg, ids, position_ids, attn_valid,
                        completion_mask, Lp, ref_logps, advantages,
                        pixel_patches=patches, grid_thw=grid, vision_token_id=vis_tok,
                    ),
                    has_aux=True,
                )(params)
                updates, opt_state = self.optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, loss, aux["kl"]

            self._step_fns[upd_key] = update_fn

        self.params, self.opt_state, loss, kl = self._step_fns[upd_key](
            self.params,
            self.opt_state,
            jnp.asarray(ids),
            jnp.asarray(position_ids),
            jnp.asarray(attn_valid),
            jnp.asarray(completion_mask),
            ref_logps,
            jnp.asarray(advantages),
            None if patches is None else jnp.asarray(patches),
        )

        # 6. metrics (grpo_trainer.py:711-738)
        groups = rewards.reshape(-1, G)
        metrics = {
            "loss": float(loss),
            "kl": float(kl),
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
