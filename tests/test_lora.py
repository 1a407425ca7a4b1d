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


def test_differential_vs_hf_peft():
    """Differential: our adapter math == the actual PEFT library on the
    same tiny model with identical A/B weights (q_proj/v_proj targets,
    matching TRL's get_peft_config -> get_peft_model path, grpo.py:98)."""
    torch = pytest.importorskip("torch")
    peft = pytest.importorskip("peft")
    from transformers.models.qwen2_5_vl import (
        Qwen2_5_VLConfig,
        Qwen2_5_VLForConditionalGeneration,
    )

    cfg = Qwen25VLConfig.tiny(dtype=jnp.float32)
    t, v = cfg.text, cfg.vision
    hf_cfg = Qwen2_5_VLConfig(
        vision_config=dict(
            depth=v.depth, hidden_size=v.hidden_size,
            intermediate_size=v.intermediate_size, num_heads=v.num_heads,
            patch_size=v.patch_size, spatial_merge_size=v.spatial_merge_size,
            temporal_patch_size=v.temporal_patch_size, window_size=v.window_size,
            fullatt_block_indexes=list(v.fullatt_block_indexes),
            out_hidden_size=v.out_hidden_size,
        ),
        text_config=dict(
            vocab_size=t.vocab_size, hidden_size=t.hidden_size,
            intermediate_size=t.intermediate_size,
            num_hidden_layers=t.num_hidden_layers,
            num_attention_heads=t.num_attention_heads,
            num_key_value_heads=t.num_key_value_heads,
            rms_norm_eps=t.rms_norm_eps, rope_theta=t.rope_theta,
            rope_scaling={"type": "mrope", "mrope_section": list(t.mrope_section)},
            tie_word_embeddings=False,
        ),
        image_token_id=cfg.image_token_id, video_token_id=cfg.video_token_id,
        vision_start_token_id=cfg.vision_start_token_id,
        vision_end_token_id=cfg.vision_end_token_id,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf_base = Qwen2_5_VLForConditionalGeneration(hf_cfg).eval().float()
    ours_params = P.from_torch_state_dict(hf_base.state_dict(), cfg)

    rank, alpha = 4, 8.0
    peft_model = peft.get_peft_model(
        hf_base,
        peft.LoraConfig(r=rank, lora_alpha=alpha,
                        target_modules=["q_proj", "v_proj"], lora_dropout=0.0),
    ).eval().float()
    # give the adapters real values (PEFT inits B=0)
    torch.manual_seed(1)
    with torch.no_grad():
        for name, p_ in peft_model.named_parameters():
            if "lora_" in name:
                p_.copy_(0.05 * torch.randn_like(p_))

    # copy PEFT's A/B into our adapter tree (HF stores output-major)
    lcfg = LoraConfig(rank=rank, alpha=alpha, target_modules=("q_w", "v_w"))
    adapters = init_adapters(ours_params, lcfg, dtype=jnp.float32)
    sd = peft_model.state_dict()
    leaf_of = {"q_proj": "q_w", "v_proj": "v_w"}
    for key, val in sd.items():
        if "lora_A" not in key and "lora_B" not in key:
            continue
        parts = key.split(".")
        i = int(parts[parts.index("layers") + 1])
        proj = parts[parts.index("self_attn") + 1]
        which = "a" if "lora_A" in key else "b"
        adapters["layers"][i][leaf_of[proj]][which] = jnp.asarray(
            val.numpy().T, dtype=jnp.float32
        )

    rng = np.random.default_rng(7)
    ids = rng.integers(5, 400, size=(2, 10))
    with torch.no_grad():
        hf_logits = peft_model(input_ids=torch.tensor(ids)).logits.numpy()
    ours = _logits(apply_adapters(ours_params, adapters, lcfg.scale), cfg, ids)
    np.testing.assert_allclose(ours, hf_logits, atol=5e-4, rtol=5e-3)


def test_merge_preserves_base_dtype(base_setup):
    """PEFT merge_and_unload keeps the base dtype: merging bf16 adapters
    over a float32 base must NOT downcast the checkpoint to bf16."""
    cfg, params, _ = base_setup  # float32 base
    lcfg = LoraConfig(rank=2, alpha=4.0, target_modules=("q_w", "v_w"))
    adapters = init_adapters(params, lcfg, dtype=jnp.bfloat16)
    merged = merge_adapters(params, adapters, lcfg.scale)
    layer0 = merged["text"]["layers"][0]
    assert layer0["q_w"].dtype == jnp.float32  # merged target keeps base dtype
    assert layer0["k_w"].dtype == jnp.float32  # untouched leaf unchanged
    # Explicit out_dtype still controls what dequantized int8 leaves become.
    from open_o3_video_tpu.models.qwen25vl import params as P2

    params_q = P2.init(cfg, seed=0, quantize_text=True)
    adapters_q = init_adapters(params_q, lcfg, dtype=jnp.bfloat16)
    merged_q = merge_adapters(params_q, adapters_q, lcfg.scale,
                              out_dtype=jnp.float32)
    assert merged_q["text"]["layers"][0]["q_w"].dtype == jnp.float32
    assert merged_q["text"]["layers"][0]["k_w"].dtype == jnp.float32
