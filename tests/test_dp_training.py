"""Data-parallel training tests on the 8-device virtual CPU mesh.

Covers the reference's 8-process DDP semantics (run_sft_video.sh:13,
run_grpo_video.sh:11): a (data=4) global batch must train, shard over the
mesh data axis, and agree with the bs=1 step on identical rows.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P_

from open_o3_video_tpu.data.sft_dataset import pack_sft_batch
from open_o3_video_tpu.models.qwen25vl import (
    Qwen25VLConfig,
    build_vision_row_index,
    forward,
    get_rope_index,
    params as P,
)
from open_o3_video_tpu.parallel import make_mesh, shard_params
from open_o3_video_tpu.train import gspo as G
from open_o3_video_tpu.train import sft as S


@pytest.fixture(scope="module")
def tiny():
    cfg = Qwen25VLConfig.tiny()
    return cfg, P.init(cfg, seed=0)


def _vision_single(cfg, rng, n_text=3):
    """Fabricated collate_sft output: one row with a 4x4 image grid."""
    grid = np.array([[1, 4, 4]], dtype=np.int64)
    patches = rng.normal(0, 1, (16, cfg.vision.patch_dim)).astype(np.float32)
    ids = np.array(
        [[5, 6, cfg.vision_start_token_id]
         + [cfg.image_token_id] * 4
         + [cfg.vision_end_token_id]
         + list(rng.integers(5, 400, size=n_text))]
    )
    labels = ids.copy()
    labels[ids == cfg.image_token_id] = S.IGNORE_INDEX
    pos, _ = get_rope_index(cfg, ids, image_grid_thw=grid)
    return {
        "input_ids": ids,
        "labels": labels,
        "position_ids": pos,
        "pixel_patches": patches,
        "grid_thw": grid,
    }


class TestVisionRowIndexMerge:
    def test_shared_vision_rows_match_tiled(self, tiny):
        """G rows sharing one vision encoding == per-row cumsum merge."""
        cfg, params = tiny
        rng = np.random.default_rng(0)
        single = _vision_single(cfg, rng)
        ids1 = single["input_ids"]
        Gn = 3
        ids = np.tile(ids1, (Gn, 1))
        grid = single["grid_thw"]
        pos, _ = get_rope_index(cfg, ids, image_grid_thw=np.tile(grid, (Gn, 1)))

        # reference semantics: tile the patches xG, cumsum merge
        tiled_patches = np.tile(single["pixel_patches"], (Gn, 1))
        tiled_grid = np.tile(grid, (Gn, 1))
        ref, _ = forward(
            params, cfg, jnp.asarray(ids), jnp.asarray(pos),
            pixel_patches=jnp.asarray(tiled_patches), grid_thw=tiled_grid,
            vision_token_id=cfg.image_token_id,
        )

        # shared path: encode once, map every row to the same vision rows
        vri = build_vision_row_index(ids, cfg.image_token_id, [0] * Gn)
        out, _ = forward(
            params, cfg, jnp.asarray(ids), jnp.asarray(pos),
            pixel_patches=jnp.asarray(single["pixel_patches"]), grid_thw=grid,
            vision_token_id=cfg.image_token_id,
            vision_row_index=jnp.asarray(vri),
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


class TestSFTDataParallel:
    def test_pack_sft_batch_shapes(self, tiny):
        cfg, _ = tiny
        rng = np.random.default_rng(1)
        singles = [_vision_single(cfg, rng, n_text=3 + i) for i in range(3)]
        batch = pack_sft_batch(singles, cfg, pad_multiple=8)
        B = 3
        assert batch["input_ids"].shape[0] == B
        assert batch["input_ids"].shape[1] % 8 == 0
        assert batch["position_ids"].shape[:2] == (3, B)
        assert batch["pixel_patches"].shape[0] == 3 * 16
        assert batch["grid_thw"].shape == (3, 3)
        # placeholders of row b map to row b's vision rows
        vri = batch["vision_row_index"]
        for b in range(B):
            got = vri[b][vri[b] >= 0]
            np.testing.assert_array_equal(got, np.arange(4) + 4 * b)
        # pad labels ignored
        lens = [s["input_ids"].shape[1] for s in singles]
        for b in range(B):
            assert (batch["labels"][b, lens[b]:] == S.IGNORE_INDEX).all()

    def test_dp4_train_step_matches_bs1(self, tiny):
        """(data=4) step on 4 identical rows == bs=1 step: same loss, and
        the updated params agree."""
        cfg, params = tiny
        rng = np.random.default_rng(2)
        single = _vision_single(cfg, rng)
        tcfg = S.SFTConfig(learning_rate=1e-2, gradient_checkpointing=False)
        opt = S.make_optimizer(tcfg)

        def run(batch, p0, mesh=None):
            step = S.make_train_step(cfg, tcfg, opt)
            opt_state = opt.init(p0)
            return step(p0, opt_state, batch)

        # bs=1 unsharded
        b1 = pack_sft_batch([single], cfg, pad_multiple=8)
        b1 = {k: (jnp.asarray(v) if k not in ("grid_thw", "vision_token_id") else v)
              for k, v in b1.items()}
        p1, _, m1 = run(b1, params)

        # data=4 x fsdp=2 mesh, 4 identical rows
        mesh = make_mesh(data=4, fsdp=2, tensor=1)
        sharded = shard_params(params, mesh)
        b4 = pack_sft_batch([single] * 4, cfg, pad_multiple=8)
        dev = {}
        for k, v in b4.items():
            if k in ("grid_thw", "vision_token_id"):
                dev[k] = v
            elif k == "position_ids":
                dev[k] = jax.device_put(jnp.asarray(v), NamedSharding(mesh, P_(None, "data")))
            elif k == "pixel_patches":
                dev[k] = jax.device_put(jnp.asarray(v), NamedSharding(mesh, P_()))
            else:
                dev[k] = jax.device_put(jnp.asarray(v), NamedSharding(mesh, P_("data")))
        p4, _, m4 = run(dev, sharded, mesh)

        assert np.isclose(float(m1["loss"]), float(m4["loss"]), atol=1e-5), (
            float(m1["loss"]), float(m4["loss"]))
        q1 = np.asarray(p1["text"]["layers"][0]["q_w"])
        q4 = np.asarray(p4["text"]["layers"][0]["q_w"])
        np.testing.assert_allclose(q4, q1, atol=1e-4, rtol=1e-4)
        # and it actually moved
        assert not np.allclose(q1, np.asarray(params["text"]["layers"][0]["q_w"]))


class TestGSPODataParallel:
    def _mk_sample(self, cfg, rng, with_vision=True):
        sample = {
            "input_ids": [5, 6, cfg.vision_start_token_id]
            + [cfg.image_token_id] * 4
            + [cfg.vision_end_token_id, 7, 8],
            "reward_kwargs": {"task": "General video QA", "answer": "y"},
        }
        if with_vision:
            sample["pixel_patches"] = rng.normal(0, 1, (16, cfg.vision.patch_dim)).astype(np.float32)
            sample["grid_thw"] = np.array([[1, 4, 4]], dtype=np.int64)
            sample["vision_token_id"] = cfg.image_token_id
        else:
            sample["input_ids"] = [5, 6, 7, 8, 9]
        return sample

    def test_vision_step_regression(self, tiny):
        """step() with a vision sample used to IndexError in get_rope_index
        (grid never tiled per generation); must complete now."""
        cfg, params = tiny
        ref = jax.tree.map(lambda x: x.copy(), params)
        tr = G.GSPOTrainer(
            params, ref, cfg,
            G.GSPOConfig(num_generations=2, max_completion_length=4, max_prompt_length=64),
            detokenize=lambda ids: "<think>x</think><answer>y</answer>",
        )
        m = tr.step(self._mk_sample(cfg, np.random.default_rng(0)), 0, 10)
        assert np.isfinite(m["loss"])

    def test_dp_batch_step_on_mesh(self, tiny):
        """B=4 prompts x G=2 on a (data=4, fsdp=2) mesh: one update, metrics
        averaged over all replicas, params move under nonzero advantages."""
        cfg, params = tiny
        ref = jax.tree.map(lambda x: x.copy(), params)
        rng = np.random.default_rng(3)
        mesh = make_mesh(data=4, fsdp=2, tensor=1)

        # Deterministic detok that varies per call so groups get nonzero
        # advantage spread (acc reward fires on 'y' only half the time).
        calls = {"n": 0}

        def detok(ids):
            calls["n"] += 1
            ans = "y" if calls["n"] % 2 else "z"
            return f"<think>x</think><answer>{ans}</answer>"

        tr = G.GSPOTrainer(
            params, ref, cfg,
            G.GSPOConfig(num_generations=2, max_completion_length=4, max_prompt_length=64),
            detokenize=detok,
            mesh=mesh,
        )
        samples = [self._mk_sample(cfg, rng) for _ in range(4)]
        before = np.asarray(jax.device_get(tr.params["text"]["layers"][0]["q_w"]))
        m = tr.step_batch(samples, global_step=0, max_steps=10)
        after = np.asarray(jax.device_get(tr.params["text"]["layers"][0]["q_w"]))
        assert np.isfinite(m["loss"])
        assert m["completion_length"] > 0
        assert not np.allclose(before, after)

    def test_group_advantages_are_group_local(self):
        r = np.array([1.0, 3.0, 10.0, 10.0], dtype=np.float32)  # two groups of 2
        adv = G.group_advantages(r, 2)
        # group 2 has zero spread -> zero advantage regardless of group 1
        assert adv[2] == adv[3] == 0.0
        assert adv[0] < 0 < adv[1]

    def test_degraded_vision_sample_absorbed(self, tiny):
        """A sample with corrupt vision tensors runs text-only instead of
        killing the step (reference degraded recompute,
        grpo_trainer.py:452-465, 611-632)."""
        cfg, params = tiny
        ref = jax.tree.map(lambda x: x.copy(), params)
        rng = np.random.default_rng(5)
        tr = G.GSPOTrainer(
            params, ref, cfg,
            G.GSPOConfig(num_generations=2, max_completion_length=4, max_prompt_length=64),
            detokenize=lambda ids: "<think>x</think><answer>y</answer>",
        )
        bad = self._mk_sample(cfg, rng)
        bad["pixel_patches"] = bad["pixel_patches"][:8]  # disagrees with grid
        good = self._mk_sample(cfg, rng)
        m = tr.step_batch([bad, good], global_step=0, max_steps=10)
        assert np.isfinite(m["loss"])
        assert m["reward"] > 0

    def test_mixed_text_and_vision_batch(self, tiny):
        """A batch mixing text-only and vision prompts packs correctly."""
        cfg, params = tiny
        ref = jax.tree.map(lambda x: x.copy(), params)
        rng = np.random.default_rng(4)
        tr = G.GSPOTrainer(
            params, ref, cfg,
            G.GSPOConfig(num_generations=2, max_completion_length=4, max_prompt_length=64),
            detokenize=lambda ids: "<think>x</think><answer>y</answer>",
        )
        samples = [self._mk_sample(cfg, rng), self._mk_sample(cfg, rng, with_vision=False)]
        m = tr.step_batch(samples, global_step=0, max_steps=10)
        assert np.isfinite(m["loss"])

    def test_mixed_image_and_video_token_batch(self, tiny):
        """Image-token and video-token prompts can share one batch (the
        row-index merge is token-agnostic; rope groups per modality)."""
        cfg, params = tiny
        ref = jax.tree.map(lambda x: x.copy(), params)
        rng = np.random.default_rng(6)
        tr = G.GSPOTrainer(
            params, ref, cfg,
            G.GSPOConfig(num_generations=2, max_completion_length=4, max_prompt_length=64),
            detokenize=lambda ids: "<think>x</think><answer>y</answer>",
        )
        img = self._mk_sample(cfg, rng)
        vid = self._mk_sample(cfg, rng)
        vid["input_ids"] = [5, 6, cfg.vision_start_token_id] \
            + [cfg.video_token_id] * 4 + [cfg.vision_end_token_id, 7, 8]
        vid["vision_token_id"] = cfg.video_token_id
        m = tr.step_batch([img, vid], global_step=0, max_steps=10)
        assert np.isfinite(m["loss"])
