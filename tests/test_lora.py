"""LoRA / PEFT path — the reference plumbs peft_config through both entry
points (grpo.py:98, sft_multi_task.py:479) and scores RL reference logps
with adapters disabled (grpo_trainer.py:244-248, 624-631).

TPU-native shape: adapters are their own small pytree grafted onto the
frozen base as LoraLinear leaves; training differentiates the adapter tree
only (no base-sized gradient buffers), and the base may be int8 (QLoRA).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, forward, get_rope_index
from open_o3_video_tpu.models.qwen25vl import params as P
from open_o3_video_tpu.ops.quant import LoraLinear, dense, quantize_weight
from open_o3_video_tpu.train.lora import (
    LoraConfig,
    apply_adapters,
    init_adapters,
    merge_adapters,
)


def test_dense_lora_math():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(8, 2)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(2, 6)).astype(np.float32))
    out = dense(x, LoraLinear(w, a, b, 0.5))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(x @ w + 0.5 * ((x @ a) @ b)), rtol=1e-5
    )


def test_hf_target_names_normalize():
    assert LoraConfig.normalize_targets(["q_proj", "v_proj"]) == ("q_w", "v_w")
    assert LoraConfig.normalize_targets(["q_w", "down_proj"]) == ("q_w", "down_w")


@pytest.fixture(scope="module")
def base_setup():
    cfg = Qwen25VLConfig.tiny(dtype=jnp.float32)
    params = P.init(cfg, seed=0)
    lcfg = LoraConfig(rank=4, alpha=8.0, target_modules=("q_w", "v_w"), seed=1)
    return cfg, params, lcfg


def _logits(params, cfg, ids):
    pos, _ = get_rope_index(cfg, ids)
    out, _ = forward(params, cfg, jnp.asarray(ids), jnp.asarray(pos))
    return np.asarray(out)


def test_zero_init_matches_base(base_setup):
    """PEFT init (B = 0): step-0 forward reproduces the base exactly."""
    cfg, params, lcfg = base_setup
    adapters = init_adapters(params, lcfg)
    combined = apply_adapters(params, adapters, lcfg.scale)
    rng = np.random.default_rng(2)
    ids = rng.integers(5, 400, size=(2, 9))
    np.testing.assert_allclose(
        _logits(combined, cfg, ids), _logits(params, cfg, ids), atol=1e-5
    )


def test_merge_matches_applied(base_setup):
    cfg, params, lcfg = base_setup
    adapters = init_adapters(params, lcfg, dtype=jnp.float32)
    # give B real values so the delta is nonzero
    adapters = jax.tree.map(
        lambda x: x + 0.02 * jnp.sin(jnp.arange(x.size, dtype=jnp.float32)).reshape(x.shape),
        adapters,
    )
    combined = apply_adapters(params, adapters, lcfg.scale)
    merged = merge_adapters(params, adapters, lcfg.scale)
    rng = np.random.default_rng(3)
    ids = rng.integers(5, 400, size=(1, 8))
    np.testing.assert_allclose(
        _logits(merged, cfg, ids), _logits(combined, cfg, ids), atol=2e-4
    )


def test_sft_lora_step_updates_adapters_only(base_setup):
    from open_o3_video_tpu.train.sft import (
        SFTConfig, make_lora_train_step, make_optimizer,
    )

    cfg, params, lcfg = base_setup
    train_cfg = SFTConfig(learning_rate=1e-2, total_steps=4)
    optimizer = make_optimizer(train_cfg)
    adapters = init_adapters(params, lcfg, dtype=jnp.float32)
    opt_state = optimizer.init(adapters)
    step = make_lora_train_step(cfg, train_cfg, optimizer, lcfg.scale)

    rng = np.random.default_rng(4)
    ids = rng.integers(5, 400, size=(2, 12))
    pos, _ = get_rope_index(cfg, ids)
    batch = {
        "input_ids": jnp.asarray(ids),
        "position_ids": jnp.asarray(pos),
        "labels": jnp.asarray(ids),
    }
    base_before = jax.tree.map(lambda x: np.asarray(x), params)
    a2, opt_state, m = step(adapters, opt_state, batch, params)
    assert np.isfinite(float(m["loss"]))
    # adapters moved (B leaves leave zero), base untouched
    moved = jax.tree.map(
        lambda x, y: float(jnp.abs(x - y).max()), adapters, a2
    )
    assert max(jax.tree.leaves(moved)) > 0
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), y),
        params, base_before,
    )
    # a second step keeps training
    _, _, m2 = step(a2, opt_state, batch, params)
    assert float(m2["loss"]) != float(m["loss"])


def test_qlora_int8_base(base_setup):
    """int8 frozen base + bf16 adapters: the single-chip 7B training mode."""
    from open_o3_video_tpu.train.sft import (
        SFTConfig, make_lora_train_step, make_optimizer,
    )

    cfg, _, lcfg = base_setup
    params_q = P.init(cfg, seed=0, quantize_text=True)
    adapters = init_adapters(params_q, lcfg, dtype=jnp.float32)
    train_cfg = SFTConfig(learning_rate=1e-2, total_steps=2)
    optimizer = make_optimizer(train_cfg)
    opt_state = optimizer.init(adapters)
    step = make_lora_train_step(cfg, train_cfg, optimizer, lcfg.scale)
    rng = np.random.default_rng(5)
    ids = rng.integers(5, 400, size=(1, 10))
    pos, _ = get_rope_index(cfg, ids)
    batch = {
        "input_ids": jnp.asarray(ids),
        "position_ids": jnp.asarray(pos),
        "labels": jnp.asarray(ids),
    }
    a2, _, m = step(adapters, opt_state, batch, params_q)
    assert np.isfinite(float(m["loss"]))
    # merged export dequantizes the base
    merged = merge_adapters(params_q, a2, lcfg.scale)
    assert merged["text"]["layers"][0]["q_w"].dtype == jnp.float32


def test_engine_serves_adapted_params(base_setup):
    """Rollouts run base + adapters through the unchanged engine."""
    from open_o3_video_tpu.engine import InferenceEngine, Request, SamplingParams

    cfg, params, lcfg = base_setup
    adapters = init_adapters(params, lcfg)
    combined = apply_adapters(params, adapters, lcfg.scale)
    eng = InferenceEngine(combined, cfg, prompt_buckets=(32,), cache_dtype=jnp.float32)
    base_eng = InferenceEngine(params, cfg, prompt_buckets=(32,), cache_dtype=jnp.float32)
    reqs = [Request(input_ids=list(range(40, 52)))]
    samp = SamplingParams(temperature=0.0, max_tokens=6)
    # B = 0 -> adapted generation identical to base
    assert eng.generate(reqs, samp)[0]["token_ids"] == base_eng.generate(reqs, samp)[0]["token_ids"]


def test_gspo_lora_step(base_setup):
    """GSPO with use_peft: ref logps come from the frozen base (adapters
    disabled), grads flow through the adapter tree only."""
    from open_o3_video_tpu.train.gspo import GSPOConfig, GSPOTrainer

    cfg, params, lcfg = base_setup
    gcfg = GSPOConfig(
        num_generations=2, max_prompt_length=64, max_completion_length=8,
        learning_rate=1e-3,
    )
    trainer = GSPOTrainer(
        params, params, cfg, gcfg,
        detokenize=lambda ids: " ".join(map(str, ids)),
        reward_funcs=[lambda completions, **kw: [1.0 - 0.1 * i for i in range(len(completions))]],
        lora=lcfg,
    )
    assert trainer.adapters is not None
    assert trainer.ref_params is trainer.params  # adapter-disabled reference
    sample = {"input_ids": list(range(30, 60)), "task": "general video QA",
              "answer": "x", "prompt": [{"role": "user", "content": "q"}]}
    before = jax.tree.map(lambda x: np.asarray(x), trainer.adapters)
    m = trainer.step(sample, global_step=0, max_steps=4)
    assert np.isfinite(m["loss"])
    moved = jax.tree.map(
        lambda x, y: float(jnp.abs(jnp.asarray(x) - y).max()),
        trainer.adapters, before,
    )
    assert max(jax.tree.leaves(moved)) > 0


def test_sharded_combined_tree_matches_unsharded(base_setup):
    """shard_params on a LoRA-combined tree shards the frozen base by the
    same rules as the plain tree (the (/base)? rule variants) and keeps
    the forward exact."""
    from open_o3_video_tpu.parallel import make_mesh
    from open_o3_video_tpu.parallel.mesh import param_sharding_rules, shard_params

    cfg, params, lcfg = base_setup
    adapters = init_adapters(params, lcfg, dtype=jnp.float32)
    adapters = jax.tree.map(lambda x: x + 0.01, adapters)
    combined = apply_adapters(params, adapters, lcfg.scale)
    rng = np.random.default_rng(6)
    ids = rng.integers(5, 400, size=(2, 8))
    ref = _logits(combined, cfg, ids)

    mesh = make_mesh(data=1, fsdp=2, tensor=4)
    specs = param_sharding_rules(combined, mesh)
    # The frozen base inside the wrapper gets the same spec as unwrapped.
    wrapped_spec = specs["text"]["layers"][0]["q_w"].base
    plain_spec = param_sharding_rules(params, mesh)["text"]["layers"][0]["q_w"]
    assert wrapped_spec == plain_spec
    sharded = shard_params(combined, mesh)
    np.testing.assert_allclose(_logits(sharded, cfg, ids), ref, atol=1e-4)
