"""Trainer tests: SFT learnability, GSPO math + end-to-end step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, get_rope_index, params as P
from open_o3_video_tpu.train import gspo as G
from open_o3_video_tpu.train import sft as S


@pytest.fixture(scope="module")
def tiny():
    cfg = Qwen25VLConfig.tiny()
    return cfg, P.init(cfg, seed=0)


class TestSFT:
    def test_loss_decreases(self, tiny):
        cfg, params = tiny
        rng = np.random.default_rng(0)
        ids = rng.integers(5, 400, size=(2, 16))
        labels = ids.copy()
        labels[:, :8] = S.IGNORE_INDEX  # prompt part masked
        pos, _ = get_rope_index(cfg, ids)
        batch = {
            "input_ids": jnp.asarray(ids),
            "labels": jnp.asarray(labels),
            "position_ids": jnp.asarray(pos),
        }
        tcfg = S.SFTConfig(learning_rate=5e-3, gradient_checkpointing=True)
        opt = S.make_optimizer(tcfg)
        opt_state = opt.init(params)
        step = S.make_train_step(cfg, tcfg, opt)
        p = params
        losses = []
        for _ in range(5):
            p, opt_state, m = step(p, opt_state, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], losses

    def test_mask_labels(self):
        ids = np.array([[1, 151652, 151656, 151653, 7, 0]])
        labels = S.mask_labels(ids, pad_token_id=0, visual_token_ids=(151652, 151653, 151656))
        assert labels.tolist() == [[1, -100, -100, -100, 7, -100]]

    def test_loss_ignores_masked(self, tiny):
        cfg, params = tiny
        ids = np.array([[5, 6, 7, 8]])
        pos, _ = get_rope_index(cfg, ids)
        all_masked = {
            "input_ids": jnp.asarray(ids),
            "labels": jnp.full_like(jnp.asarray(ids), S.IGNORE_INDEX),
            "position_ids": jnp.asarray(pos),
        }
        loss, aux = S.sft_loss(params, cfg, all_masked, remat=False)
        assert float(loss) == 0.0
        assert int(aux["num_target_tokens"]) == 0


class TestGSPOMath:
    def test_group_advantages_bessel(self):
        torch = pytest.importorskip("torch")
        rewards = np.array([1.0, 2.0, 3.0, 4.0, 0.0, 0.0, 1.0, 3.0], dtype=np.float32)
        ours = G.group_advantages(rewards, 4)
        r = torch.tensor(rewards).view(-1, 4)
        mean = r.mean(dim=1).repeat_interleave(4)
        std = r.std(dim=1).repeat_interleave(4)
        theirs = ((torch.tensor(rewards) - mean) / (std + 1e-4)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-6)

    def test_completion_mask_after_eos(self):
        eos = 99
        ids = np.array([
            [5, 6, 99, 7, 8],   # eos at 2 -> mask through index 2
            [5, 6, 7, 8, 9],    # no eos -> all ones
        ])
        mask = G.completion_mask_after_eos(ids, eos)
        assert mask.tolist() == [[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]]

    def test_gspo_loss_direction(self, tiny):
        """Positive-advantage completions should gain probability."""
        cfg, params = tiny
        import optax

        rng = np.random.default_rng(1)
        Lp, Lc, Gn = 6, 4, 2
        prompt = rng.integers(5, 400, size=Lp)
        comps = rng.integers(5, 400, size=(Gn, Lc))
        ids = np.concatenate([np.tile(prompt, (Gn, 1)), comps], axis=1)
        attn_valid = np.ones_like(ids, dtype=bool)
        comp_mask = np.ones((Gn, Lc), dtype=np.int32)
        pos, _ = get_rope_index(cfg, ids)
        adv = np.array([2.0, -2.0], dtype=np.float32)

        gcfg = G.GSPOConfig(beta=0.0)
        build = G.make_logps_fn(cfg)
        logps_fn = build(None, None)
        ref_logps = logps_fn(params, jnp.asarray(ids), jnp.asarray(pos), None,
                             jnp.asarray(attn_valid))[:, Lp - 1:]

        def loss_fn(p):
            loss, _ = G.gspo_loss(
                p, cfg, gcfg, jnp.asarray(ids), jnp.asarray(pos),
                jnp.asarray(attn_valid), jnp.asarray(comp_mask), Lp,
                ref_logps, jnp.asarray(adv),
            )
            return loss

        grads = jax.grad(loss_fn)(params)
        opt = optax.sgd(1e-2)
        updates, _ = opt.update(grads, opt.init(params))
        new_params = optax.apply_updates(params, updates)

        before = np.asarray(logps_fn(params, jnp.asarray(ids), jnp.asarray(pos), None,
                                     jnp.asarray(attn_valid))[:, Lp - 1:])
        after = np.asarray(logps_fn(new_params, jnp.asarray(ids), jnp.asarray(pos), None,
                                    jnp.asarray(attn_valid))[:, Lp - 1:])
        # row 0 (adv +2): completion logp up; row 1 (adv -2): down
        assert after[0].sum() > before[0].sum()
        assert after[1].sum() < before[1].sum()


class TestGSPOTrainerStep:
    def test_full_step_runs_and_updates(self, tiny):
        cfg, params = tiny
        ref_params = jax.tree.map(lambda x: x.copy(), params)

        def detok(ids):
            # Produce a trace with valid tags so rewards exercise real paths.
            return "<think>I see it at <t>3.0</t>s</think><answer>a red ball</answer>"

        trainer = G.GSPOTrainer(
            params, ref_params, cfg,
            G.GSPOConfig(num_generations=4, max_completion_length=8, max_prompt_length=64),
            detokenize=detok,
        )
        sample = {
            "input_ids": [5, 6, 7, 8, 9, 10],
            "reward_kwargs": {
                "task": "temporal-spatial free-form QA",
                "answer": "a red ball",
                "key_frames": [{"time": 3.0, "idx": 0}],
                "key_items": {"0": {"ball": [[0.1, 0.1, 0.4, 0.4]]}},
                "image_size": (100, 100),
                "image_size_refine": (100, 100),
            },
        }
        before = np.asarray(trainer.params["text"]["layers"][0]["q_w"])
        m = trainer.step(sample, global_step=0, max_steps=10)
        after = np.asarray(trainer.params["text"]["layers"][0]["q_w"])
        assert np.isfinite(m["loss"])
        assert m["reward"] > 0  # format+acc+temporal rewards fire on the canned trace
        assert m["completion_length"] > 0
        # With identical completions the group advantage is 0, so policy
        # gradients vanish; KL term still produces a (possibly tiny) update.
        assert "kl" in m and np.isfinite(m["kl"])


class TestGSPOObjectiveDifferential:
    """Gradient-level differential of the GSPO/GRPO objective against a
    torch transcription of the reference equations
    (grpo_trainer.py:634-706): k3 KL, sequence-level (or token-level)
    clipped importance weights, masked means."""

    @staticmethod
    def _torch_objective(per_token_logps, ref_logps, mask, advantages,
                         beta, eps_low, eps_high, gspo):
        import torch

        mask = mask.to(per_token_logps.dtype)
        denom = mask.sum(-1).clamp(min=1.0)
        x = torch.clamp(ref_logps - per_token_logps, -10, 10)
        per_token_kl = torch.exp(x) - x - 1
        log_ratio = per_token_logps - per_token_logps.detach()
        if gspo:
            log_iw = ((log_ratio * mask).sum(-1) / denom).unsqueeze(1)
        else:
            log_iw = log_ratio
        coef_1 = torch.exp(log_iw)
        coef_2 = torch.clamp(coef_1, 1 - eps_low, 1 + eps_high)
        adv = advantages.unsqueeze(1)
        per_token_loss = -torch.min(coef_1 * adv, coef_2 * adv) + beta * per_token_kl
        return ((per_token_loss * mask).sum(-1) / denom).mean()

    @pytest.mark.parametrize("gspo", [True, False])
    def test_value_and_grad_match_reference_math(self, gspo):
        torch = pytest.importorskip("torch")

        rng = np.random.default_rng(11)
        Gn, Lc = 4, 12
        logps = rng.normal(-2.0, 1.0, (Gn, Lc))
        refs = logps + rng.normal(0, 0.5, (Gn, Lc))
        mask = (rng.random((Gn, Lc)) > 0.3).astype(np.float64)
        mask[:, 0] = 1.0  # no fully-empty rows
        adv = rng.normal(0, 1.5, (Gn,))

        cfg = G.GSPOConfig(beta=0.04, epsilon_low=0.2, epsilon_high=0.2, gspo=gspo)

        t_logps = torch.tensor(logps, requires_grad=True, dtype=torch.float64)
        t_loss = self._torch_objective(
            t_logps, torch.tensor(refs), torch.tensor(mask), torch.tensor(adv),
            cfg.beta, cfg.epsilon_low, cfg.epsilon_high, gspo,
        )
        t_loss.backward()

        def jax_loss(lp):
            loss, _ = G.gspo_objective(
                lp, jnp.asarray(refs), jnp.asarray(mask), jnp.asarray(adv), cfg
            )
            return loss

        with jax.enable_x64(True):
            j_loss, j_grad = jax.value_and_grad(jax_loss)(jnp.asarray(logps))

        np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=1e-10)
        np.testing.assert_allclose(
            np.asarray(j_grad), t_logps.grad.numpy(), rtol=1e-8, atol=1e-10
        )

    def test_kl_clamp_boundary(self):
        """The k3 estimator clamps ref-pol at +-10 before exp (the clamp is
        inside the gradient path, grpo_trainer.py:634-636)."""
        cfg = G.GSPOConfig(beta=1.0, gspo=True)
        logps = jnp.asarray([[-30.0]])
        refs = jnp.asarray([[0.0]])  # ref - pol = 30 -> clamped to 10
        mask = jnp.asarray([[1.0]])
        adv = jnp.asarray([0.0])
        loss, kl = G.gspo_objective(logps, refs, mask, adv, cfg)
        expected = float(np.exp(10) - 10 - 1)
        assert np.isclose(float(kl), expected)
        # clamped region: d kl / d logps == 0 except the -x term... the
        # clamp zeroes the whole branch's gradient in torch semantics too
        g = jax.grad(lambda lp: G.gspo_objective(lp, refs, mask, adv, cfg)[0])(logps)
        assert np.isfinite(np.asarray(g)).all()


class TestReviewRegressions:
    def test_truncation_degrades_chopped_vision(self, tiny, capsys):
        """A prompt longer than max_prompt_length whose left-truncation
        chops vision placeholders must run text-only (degrade), never with
        misaligned features."""
        from open_o3_video_tpu.ops.preprocess import frames_as_images_patches

        cfg, params = tiny
        ref_params = jax.tree.map(lambda x: x.copy(), params)
        trainer = G.GSPOTrainer(
            params, ref_params, cfg,
            G.GSPOConfig(num_generations=4, max_completion_length=4,
                         max_prompt_length=16),
            detokenize=lambda ids: "<answer>x</answer>",
        )
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, (2, 3, 28, 28), dtype=np.uint8)
        patches, grid = frames_as_images_patches(frames)
        n_tok = patches.shape[0] // 4
        # placeholders at the FRONT so a 16-token left-truncation chops them
        ids = ([cfg.vision_start_token_id] + [cfg.image_token_id] * n_tok
               + [cfg.vision_end_token_id] + list(range(5, 45)))
        sample = {
            "input_ids": ids,
            "pixel_patches": patches, "grid_thw": grid,
            "vision_token_id": cfg.image_token_id,
            "reward_kwargs": {
                "task": "temporal-spatial free-form QA", "answer": "x",
                "key_frames": [], "key_items": {},
                "image_size": (28, 28), "image_size_refine": (28, 28),
            },
        }
        m = trainer.step(sample, global_step=0, max_steps=2)
        assert np.isfinite(m["loss"])
        assert "degrading sample to text-only" in capsys.readouterr().out

    def test_visual_mask_ids_by_family(self):
        import dataclasses

        from open_o3_video_tpu.data.sft_dataset import visual_mask_ids

        cfg = Qwen25VLConfig.tiny()
        assert visual_mask_ids(cfg) == (cfg.image_token_id,)
        q2 = dataclasses.replace(cfg, model_type="qwen2_vl")
        assert visual_mask_ids(q2) == (
            cfg.vision_start_token_id, cfg.vision_end_token_id,
            cfg.video_token_id,
        )

    def test_all_hosts_ok_single_process(self):
        from open_o3_video_tpu.parallel import distributed as D

        assert D.all_hosts_ok(True) is True
        assert D.all_hosts_ok(False) is False

    def test_merge_adapters_dequantizes_vision_leaves(self, tiny):
        from open_o3_video_tpu.ops.quant import (
            DEFAULT_QUANT_PATTERNS,
            QuantizedLinear,
            VISION_QUANT_PATTERNS,
            quantize_params,
        )
        from open_o3_video_tpu.train import lora as L

        cfg, params = tiny
        base = quantize_params(
            params, DEFAULT_QUANT_PATTERNS + VISION_QUANT_PATTERNS
        )
        lcfg = L.LoraConfig(rank=2, alpha=4)
        adapters = L.init_adapters(base, lcfg, dtype=jnp.bfloat16)
        merged = L.merge_adapters(base, adapters, lcfg.scale)
        leaves = jax.tree.leaves(
            merged, is_leaf=lambda x: isinstance(x, QuantizedLinear)
        )
        assert not any(isinstance(x, QuantizedLinear) for x in leaves)
