"""72B-judge memory story: the sharded int8 load path at Qwen2.5-72B
GEOMETRY (8192 hidden, 64/8 GQA heads) on the 8-virtual-device mesh.

The reference judges V-STAR with Qwen2.5-72B-Instruct spread over 4 GPUs
via device_map="auto" (eval/test/eval_vstar.py:20-24). Here the judge
shards tensor-parallel over ICI with int8 decoder weights: bf16 72B is
144 GB > a v5e-8's 128 GB HBM, int8 is ~72 GB (~9 GB/chip), so
--load_in_int8 is the difference between fitting and not. Depth and MLP
width are reduced for the CPU test; the sharding-relevant dims (hidden,
head counts, head_dim) are the real 72B's.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_o3_video_tpu.data.processor import ByteTokenizer, O3VideoProcessor
from open_o3_video_tpu.eval.judge import EngineJudge
from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig
from open_o3_video_tpu.models.qwen25vl import params as P
from open_o3_video_tpu.ops.quant import QuantizedLinear
from open_o3_video_tpu.parallel import make_mesh


def judge_72b_geometry_config():
    """Qwen2.5-72B text geometry (hidden 8192, 64 q / 8 kv heads,
    head_dim 128) at reduced depth/MLP/vocab for a CPU-feasible dryrun."""
    cfg = Qwen25VLConfig.tiny(dtype=jnp.float32)
    return dataclasses.replace(
        cfg,
        text=dataclasses.replace(
            cfg.text,
            hidden_size=8192,
            num_attention_heads=64,
            num_key_value_heads=8,
            mrope_section=(16, 24, 24),  # real 72B rope split (head_dim 128)
            intermediate_size=1024,   # real: 29568 — size-only reduction
            num_hidden_layers=2,      # real: 80 — size-only reduction
        ),
    )


@pytest.mark.slow
def test_int8_judge_shards_and_scores_on_8way_mesh():
    cfg = judge_72b_geometry_config()
    mesh = make_mesh(tensor=8)
    # The --load_in_int8 path: decoder quantized at init/load, THEN sharded
    # by the engine over the tensor axis (EngineJudge does exactly this for
    # a checkpoint dir via load_pretrained(quantize_text=True)).
    params = P.init(cfg, seed=0, quantize_text=True)
    layer0 = params["text"]["layers"][0]
    assert isinstance(layer0["q_w"], QuantizedLinear)
    assert layer0["q_w"].w_q.dtype == jnp.int8

    judge = EngineJudge(
        params, mesh=mesh, cfg=cfg, max_new_tokens=4,
        processor=O3VideoProcessor(tokenizer=ByteTokenizer.for_config(cfg)),
    )
    # int8 leaves actually sharded over the tensor axis (not replicated).
    q_w = judge.engine.params["text"]["layers"][0]["q_w"]
    spec = q_w.w_q.sharding.spec
    assert "tensor" in jax.tree.leaves(tuple(spec)), spec

    jobs = [
        ("What color?", "red", "red"),
        ("How many?", "three", "two"),
        ("Where?", "left", "on the left side"),
    ]
    ratings = judge.batch(jobs)
    assert len(ratings) == 3
    assert all(isinstance(r, int) for r in ratings)

    # And the batch path agrees with single calls under sharding.
    assert [judge(*j) for j in jobs] == ratings


@pytest.mark.slow
def test_int4_judge_shards_and_scores_on_8way_mesh():
    """--load_in_int4: packed int4 decoder (~36 GB at real 72B size, ~4.5
    GB/chip at tensor=8) shards and scores. A MEMORY knob: the measured
    decode ceiling of any int4 kernel on v5e is 1.00x int8
    (scripts/profile_int4_pallas.py), so its value is headroom."""
    from open_o3_video_tpu.ops.int4 import Int4Linear

    cfg = judge_72b_geometry_config()
    mesh = make_mesh(tensor=8)
    params = P.init(cfg, seed=0, quantize_text="int4")
    layer0 = params["text"]["layers"][0]
    assert isinstance(layer0["q_w"], Int4Linear)
    assert layer0["q_w"].w_p.dtype == jnp.int8
    assert layer0["q_w"].w_p.shape == (8192 // 2, 8192)  # packed rows

    judge = EngineJudge(
        params, mesh=mesh, cfg=cfg, max_new_tokens=4,
        processor=O3VideoProcessor(tokenizer=ByteTokenizer.for_config(cfg)),
    )
    q_w = judge.engine.params["text"]["layers"][0]["q_w"]
    spec = q_w.w_p.sharding.spec
    assert "tensor" in jax.tree.leaves(tuple(spec)), spec

    jobs = [("What color?", "red", "red"), ("How many?", "three", "two")]
    ratings = judge.batch(jobs)
    assert len(ratings) == 2 and all(isinstance(r, int) for r in ratings)
