"""Aria model-family parity: our JAX variant vs HF transformers (CPU).

The reference dispatches between Qwen2-VL / Qwen2.5-VL / Aria by model name
(grpo_trainer.py:211-219); this covers the Aria branch: Idefics3-style
vision tower, cross-attention projector with a learned query bank, and the
llama-style MoE text decoder (routed top-k + shared experts) — implemented
as the ``router`` branch of the shared text stack, with the expert axis
sharded over ``tensor`` (expert parallelism).
"""

import dataclasses

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from open_o3_video_tpu.models.aria import (
    AriaConfig,
    forward,
    get_image_features,
    params as P,
    tiny_aria,
)


@pytest.fixture(scope="module")
def tiny_pair():
    from transformers.models.aria import (
        AriaConfig as HFAriaConfig,
        AriaForConditionalGeneration,
        AriaTextConfig,
    )
    from transformers.models.idefics3 import Idefics3VisionConfig

    ours = tiny_aria()
    v, t = ours.vision, ours.text
    vc = Idefics3VisionConfig(
        hidden_size=v.hidden_size,
        intermediate_size=v.intermediate_size,
        num_hidden_layers=v.num_hidden_layers,
        num_attention_heads=v.num_attention_heads,
        image_size=v.image_size,
        patch_size=v.patch_size,
        num_channels=v.in_channels,
        hidden_act="gelu_pytorch_tanh",
    )
    tc = AriaTextConfig(
        vocab_size=t.vocab_size,
        hidden_size=t.hidden_size,
        intermediate_size=t.intermediate_size,
        num_hidden_layers=t.num_hidden_layers,
        num_attention_heads=t.num_attention_heads,
        num_key_value_heads=t.num_key_value_heads,
        rope_theta=t.rope_theta,
        rms_norm_eps=t.rms_norm_eps,
        attention_bias=False,
        moe_num_experts=t.moe_num_experts,
        moe_topk=t.moe_topk,
        moe_num_shared_experts=t.moe_num_shared_experts,
        tie_word_embeddings=False,
    )
    hf_cfg = HFAriaConfig(
        vision_config=vc,
        text_config=tc,
        projector_patch_to_query_dict={p: q for p, q in ours.patch_to_query},
        image_token_id=ours.image_token_id,
    )
    torch.manual_seed(0)
    hf_model = AriaForConditionalGeneration(hf_cfg).eval().float()
    ours_params = P.from_torch_state_dict(hf_model.state_dict(), ours)
    return hf_model, ours_params, ours


def test_config_roundtrip():
    cfg = tiny_aria()
    again = AriaConfig.from_hf_dict(cfg.to_hf_dict())
    assert dataclasses.replace(again, dtype=cfg.dtype) == cfg


def test_text_only_moe_parity(tiny_pair):
    """MoE decoder (routed top-k + shared experts) matches HF logits."""
    hf_model, ours_params, cfg = tiny_pair
    rng = np.random.default_rng(0)
    input_ids = rng.integers(5, 400, size=(2, 12))
    with torch.no_grad():
        hf_logits = hf_model(input_ids=torch.tensor(input_ids)).logits.numpy()
    ours_logits, _ = forward(ours_params, cfg, jnp.asarray(input_ids))
    np.testing.assert_allclose(
        np.asarray(ours_logits), hf_logits, atol=2e-4, rtol=2e-3
    )


def test_image_features_parity(tiny_pair):
    """Vision tower + projector produce HF's image features."""
    hf_model, ours_params, cfg = tiny_pair
    rng = np.random.default_rng(1)
    pix = rng.normal(0, 1, size=(2, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)
    with torch.no_grad():
        hf_feats = hf_model.model.get_image_features(
            torch.tensor(pix), vision_feature_layer=-1
        )
    if isinstance(hf_feats, (list, tuple)):
        hf_feats = hf_feats[0]
    ours = get_image_features(ours_params, cfg, jnp.asarray(pix))
    np.testing.assert_allclose(
        np.asarray(ours), hf_feats.reshape(-1, hf_feats.shape[-1]).numpy(),
        atol=2e-5, rtol=2e-4,
    )


def test_multimodal_parity(tiny_pair):
    """Image features scattered at image-token positions match HF end-to-end."""
    hf_model, ours_params, cfg = tiny_pair
    rng = np.random.default_rng(2)
    q_num = cfg.query_num((cfg.vision.image_size // cfg.vision.patch_size) ** 2)
    pix = rng.normal(0, 1, size=(1, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)
    ids = (
        rng.integers(5, 400, size=4).tolist()
        + [cfg.image_token_id] * q_num
        + rng.integers(5, 400, size=3).tolist()
    )
    input_ids = np.array([ids])
    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.tensor(input_ids),
            pixel_values=torch.tensor(pix),
        ).logits.numpy()
    ours_logits, _ = forward(
        ours_params, cfg, jnp.asarray(input_ids), pixel_values=jnp.asarray(pix)
    )
    np.testing.assert_allclose(
        np.asarray(ours_logits), hf_logits, atol=5e-4, rtol=5e-3
    )


def test_greedy_generate_parity(tiny_pair):
    """Cached decode through the shared text stack matches HF generate."""
    from open_o3_video_tpu.models.qwen25vl.text import init_kv_cache

    hf_model, ours_params, cfg = tiny_pair
    rng = np.random.default_rng(3)
    prompt = rng.integers(5, 400, size=10).tolist()
    with torch.no_grad():
        hf_out = hf_model.generate(
            input_ids=torch.tensor([prompt]),
            attention_mask=torch.ones(1, len(prompt), dtype=torch.long),
            max_new_tokens=8,
            do_sample=False,
        )
    hf_completion = hf_out[0, len(prompt):].tolist()

    cache = init_kv_cache(cfg.text, batch=1, max_len=len(prompt) + 8, dtype=jnp.float32)
    ids = jnp.asarray([prompt])
    logits, cache = forward(ours_params, cfg, ids, cache=cache, cache_offset=0)
    out = []
    tok = int(np.asarray(logits)[0, -1].argmax())
    for step in range(8):
        out.append(tok)
        if tok == cfg.eos_token_id:
            break
        pos = len(prompt) + step
        logits, cache = forward(
            ours_params, cfg, jnp.asarray([[tok]]), cache=cache, cache_offset=pos
        )
        tok = int(np.asarray(logits)[0, -1].argmax())
    assert out == hf_completion


def test_moe_expert_parallel_sharding(tiny_pair):
    """Expert-parallel forward on the 8-device mesh == unsharded logits."""
    from open_o3_video_tpu.parallel import make_mesh
    from open_o3_video_tpu.parallel.mesh import shard_params

    _, ours_params, cfg = tiny_pair
    rng = np.random.default_rng(4)
    input_ids = rng.integers(5, 400, size=(2, 8))
    ref_logits, _ = forward(ours_params, cfg, jnp.asarray(input_ids))
    mesh = make_mesh(data=1, fsdp=2, tensor=4)
    sharded = shard_params(ours_params, mesh)
    ep_logits, _ = forward(sharded, cfg, jnp.asarray(input_ids))
    np.testing.assert_allclose(
        np.asarray(ep_logits), np.asarray(ref_logits), atol=1e-4, rtol=1e-4
    )


def test_engine_serves_aria(tiny_pair):
    """The shared engine serves Aria: MoE text decode + precomputed vision
    features via Request.vision_embeds, matching HF generate."""
    from open_o3_video_tpu.engine import InferenceEngine, Request, SamplingParams
    from open_o3_video_tpu.models.aria import get_image_features

    hf_model, ours_params, cfg = tiny_pair
    engine = InferenceEngine(
        ours_params, cfg, prompt_buckets=(32, 64), cache_dtype=jnp.float32
    )
    rng = np.random.default_rng(5)

    # Text-only request vs HF generate.
    prompt = rng.integers(5, 400, size=10).tolist()
    with torch.no_grad():
        hf_out = hf_model.generate(
            input_ids=torch.tensor([prompt]),
            attention_mask=torch.ones(1, len(prompt), dtype=torch.long),
            max_new_tokens=6,
            do_sample=False,
        )
    out = engine.generate(
        [Request(input_ids=prompt)],
        SamplingParams(temperature=0.0, repetition_penalty=1.0, max_tokens=6),
    )
    assert out[0]["token_ids"] == hf_out[0, len(prompt):].tolist()

    # Vision request: tower+projector run as their own program, features
    # enter the engine via vision_embeds.
    q_num = cfg.query_num((cfg.vision.image_size // cfg.vision.patch_size) ** 2)
    pix = rng.normal(0, 1, size=(1, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)
    ids = (
        rng.integers(5, 400, size=4).tolist()
        + [cfg.image_token_id] * q_num
        + rng.integers(5, 400, size=3).tolist()
    )
    with torch.no_grad():
        hf_out = hf_model.generate(
            input_ids=torch.tensor([ids]),
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            pixel_values=torch.tensor(pix),
            max_new_tokens=6,
            do_sample=False,
        )
    feats = get_image_features(ours_params, cfg, jnp.asarray(pix))
    out = engine.generate(
        [Request(input_ids=ids, vision_embeds=feats,
                 vision_token_id=cfg.image_token_id)],
        SamplingParams(temperature=0.0, repetition_penalty=1.0, max_tokens=6),
    )
    assert out[0]["token_ids"] == hf_out[0, len(ids):].tolist()


def test_safetensors_roundtrip_and_load_model(tmp_path):
    """Aria export -> reload round-trips, and models.load_model dispatches
    on the config.json model_type for both families."""
    import json
    import os

    from open_o3_video_tpu.models import load_model

    cfg = tiny_aria()
    params = P.init(cfg, seed=5)
    d = tmp_path / "aria_ckpt"
    os.makedirs(d)
    P.save_safetensors(params, cfg, str(d / "model.safetensors"))
    with open(d / "config.json", "w") as f:
        json.dump(cfg.to_hf_dict(), f)
    params2, cfg2, fam = load_model(str(d), dtype=jnp.float32)
    assert cfg2.model_type == "aria" and fam.__name__.endswith(".aria")
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-6
        ),
        params, params2,
    )
    with pytest.raises(ValueError):
        load_model(str(d), quantize_text=True)  # Qwen-family-only option


class TestAriaTraining:
    """Trainer family-dispatch (reference trains AriaForConditionalGeneration
    through the same GRPO/SFT code as the Qwen families,
    grpo_trainer.py:40-55,211-219): SFT loss/grad parity vs HF and a full
    GSPO step on tiny Aria through the shared trainers."""

    def _sft_batch(self, cfg, rng):
        from open_o3_video_tpu.models.aria import get_rope_index
        from open_o3_video_tpu.train import sft as S

        q_num = cfg.query_num(cfg.vision.num_patches_per_side ** 2)
        pix = rng.normal(0, 1, size=(1, 3, cfg.vision.image_size,
                                     cfg.vision.image_size)).astype(np.float32)
        ids = np.array([
            rng.integers(5, 400, size=3).tolist()
            + [cfg.image_token_id] * q_num
            + rng.integers(5, 400, size=6).tolist()
        ])
        labels = S.mask_labels(ids, cfg.pad_token_id, (cfg.image_token_id,))
        labels[0, :4] = S.IGNORE_INDEX  # prompt region unsupervised
        pos = get_rope_index(cfg, ids)
        return {
            "input_ids": jnp.asarray(ids),
            "position_ids": jnp.asarray(pos),
            "labels": jnp.asarray(labels),
            "pixel_values": jnp.asarray(pix),
        }, ids, labels, pix

    def test_sft_loss_and_grad_parity(self, tiny_pair):
        """sft_loss on Aria == HF CE (labels with -100), and gradients agree
        (embed-table grad elementwise + global grad norm, which is layout-
        invariant under the transposed linear storage)."""
        from open_o3_video_tpu.train.sft import sft_loss

        hf_model, ours_params, cfg = tiny_pair
        rng = np.random.default_rng(7)
        batch, ids, labels, pix = self._sft_batch(cfg, rng)

        hf_model.zero_grad()
        out = hf_model(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(pix),
            labels=torch.tensor(labels),
        )
        out.loss.backward()

        def loss_fn(p):
            loss, _ = sft_loss(p, cfg, batch, remat=False, logp_chunk=None)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(ours_params)
        np.testing.assert_allclose(
            float(loss), float(out.loss), rtol=2e-4, atol=2e-5
        )
        hf_embed_grad = (
            hf_model.model.language_model.embed_tokens.weight.grad.numpy()
        )
        np.testing.assert_allclose(
            np.asarray(grads["text"]["embed_tokens"]), hf_embed_grad,
            atol=1e-5, rtol=1e-3,
        )
        hf_gnorm = float(
            torch.sqrt(sum((p.grad ** 2).sum() for p in hf_model.parameters()
                           if p.grad is not None))
        )
        import optax

        np.testing.assert_allclose(
            float(optax.global_norm(grads)), hf_gnorm, rtol=2e-3
        )

    def test_sft_train_step_runs(self, tiny_pair):
        """The shared make_train_step consumes an Aria batch (family
        dispatch in train/sft.py) and updates params."""
        from open_o3_video_tpu.train import sft as S

        _, ours_params, cfg = tiny_pair
        rng = np.random.default_rng(8)
        batch, *_ = self._sft_batch(cfg, rng)
        scfg = S.SFTConfig(learning_rate=1e-3, gradient_checkpointing=False,
                           logp_chunk=None)
        opt = S.make_optimizer(scfg)
        params = jax.tree.map(lambda x: x.copy(), ours_params)
        opt_state = opt.init(params)
        step = S.make_train_step(cfg, scfg, opt)
        before = np.asarray(params["text"]["embed_tokens"]).copy()
        params, opt_state, m = step(params, opt_state, batch)
        assert np.isfinite(float(m["loss"]))
        assert not np.allclose(np.asarray(params["text"]["embed_tokens"]), before)

    def test_gspo_step_on_aria(self, tiny_pair):
        """Full GSPO step (rollout via the shared engine with precomputed
        vision_embeds -> rewards -> ref logps -> update) on tiny Aria."""
        from open_o3_video_tpu.train import gspo as G

        _, ours_params, cfg = tiny_pair
        rng = np.random.default_rng(9)
        params = jax.tree.map(lambda x: x.copy(), ours_params)
        ref_params = jax.tree.map(lambda x: x.copy(), ours_params)
        # Token-dependent reward so group advantages are nonzero (with the
        # canned identical trace the GSPO gradient is exactly 0 at step 0:
        # zero advantages and a KL whose gradient vanishes at pol == ref).
        def tok_reward(completions, **kw):
            return [
                float(np.mean([int(t) < 256 for t in c[0]["content"].split()]))
                for c in completions
            ]

        trainer = G.GSPOTrainer(
            params, ref_params, cfg,
            G.GSPOConfig(num_generations=4, max_completion_length=8,
                         max_prompt_length=64),
            detokenize=lambda ids: " ".join(str(i) for i in ids),
            reward_funcs=[tok_reward],
        )
        q_num = cfg.query_num(cfg.vision.num_patches_per_side ** 2)
        pix = rng.normal(0, 1, size=(2, 3, cfg.vision.image_size,
                                     cfg.vision.image_size)).astype(np.float32)
        sample = {
            "input_ids": (
                rng.integers(5, 400, size=4).tolist()
                + [cfg.image_token_id] * (2 * q_num)
                + rng.integers(5, 400, size=3).tolist()
            ),
            "pixel_values": pix,
            "reward_kwargs": {
                "task": "temporal-spatial free-form QA",
                "answer": "a red ball",
                "key_frames": [{"time": 3.0, "idx": 0}],
                "key_items": {"0": {"ball": [[0.1, 0.1, 0.4, 0.4]]}},
                "image_size": (100, 100),
                "image_size_refine": (100, 100),
            },
        }
        before = np.asarray(trainer.params["text"]["embed_tokens"]).copy()
        m = trainer.step(sample, global_step=0, max_steps=10)
        assert np.isfinite(m["loss"]) and m["completion_length"] > 0
        assert m["reward"] > 0
        # nonzero advantages -> policy-gradient update moves the params
        assert not np.allclose(
            np.asarray(trainer.params["text"]["embed_tokens"]), before
        )

    def test_gspo_degrades_bad_aria_vision(self, tiny_pair, capsys):
        """Mismatched pixel_values/placeholder counts degrade to text-only
        (the reference's absorb-vision-failures contract)."""
        from open_o3_video_tpu.train import gspo as G

        _, ours_params, cfg = tiny_pair
        rng = np.random.default_rng(10)
        params = jax.tree.map(lambda x: x.copy(), ours_params)
        trainer = G.GSPOTrainer(
            params, jax.tree.map(lambda x: x.copy(), ours_params), cfg,
            G.GSPOConfig(num_generations=4, max_completion_length=4,
                         max_prompt_length=64),
            detokenize=lambda ids: "<answer>x</answer>",
        )
        pix = rng.normal(0, 1, size=(1, 3, cfg.vision.image_size,
                                     cfg.vision.image_size)).astype(np.float32)
        sample = {
            "input_ids": [5, 6, cfg.image_token_id, 7, 8],  # 1 != query_num
            "pixel_values": pix,
            "reward_kwargs": {
                "task": "temporal-spatial free-form QA", "answer": "x",
                "key_frames": [], "key_items": {},
                "image_size": (28, 28), "image_size_refine": (28, 28),
            },
        }
        m = trainer.step(sample, global_step=0, max_steps=2)
        assert np.isfinite(m["loss"])
        assert "degrading sample to text-only" in capsys.readouterr().out
