"""scripts/hbm_feasibility.py: the analytic accounting must match reality.

The 7B multi-chip envelopes can't run here (one real chip), so the tool's
credibility rests on its static part being EXACT: per-device parameter
bytes computed from eval_shape + PARAM_RULES must equal the bytes actually
placed on each device when the same tree is sharded on the 8-device CPU
mesh at tiny dims (VERDICT r3 "multichip evidence" gap)."""

import importlib.util
import math
import os

import jax
import pytest

from open_o3_video_tpu.models.qwen25vl import params as P
from open_o3_video_tpu.models.qwen25vl.config import Qwen25VLConfig
from open_o3_video_tpu.parallel.mesh import make_mesh, shard_params

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "hbm_feasibility", os.path.join(REPO, "scripts", "hbm_feasibility.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def tool():
    return _load_tool()


@pytest.mark.parametrize("mesh_shape", [(1, 8, 1), (1, 4, 2), (2, 2, 2)])
def test_analytic_matches_placed_bytes(tool, mesh_shape):
    from jax.sharding import AbstractMesh

    cfg = Qwen25VLConfig.tiny()
    params = P.init(cfg)
    data, fsdp, tensor = mesh_shape
    mesh = make_mesh(data=data, fsdp=fsdp, tensor=tensor)
    sharded = shard_params(params, mesh)
    actual = sum(
        leaf.addressable_shards[0].data.nbytes
        for leaf in jax.tree.leaves(sharded)
    )
    amesh = AbstractMesh((data, fsdp, tensor), ("data", "fsdp", "tensor"))
    shapes = jax.eval_shape(lambda: P.init(cfg))
    analytic = tool.tree_device_bytes(shapes, amesh)
    assert analytic == actual


def test_quantized_tree_eval_shapeable(tool):
    """init(quantize_text=True) must trace (the leaf.delete() guard)."""
    from jax.sharding import AbstractMesh

    cfg = Qwen25VLConfig.tiny()
    shapes = jax.eval_shape(lambda: P.init(cfg, quantize_text=True))
    amesh = AbstractMesh((1, 4, 2), ("data", "fsdp", "tensor"))
    n = tool.tree_device_bytes(shapes, amesh)
    plain = tool.tree_device_bytes(jax.eval_shape(lambda: P.init(cfg)), amesh)
    assert 0 < n < plain  # int8 leaves shrink the tree


def test_account_7b_runs_and_is_consistent(tool):
    """The 7B accounting itself: param count matches Qwen2.5-VL-7B public
    total (~8.29B), and the train total is params+grads+opt+activations."""
    r = tool.account((1, 8, 1), 16384, 1, 1024, 16.0, "train", False)
    assert abs(r["n_params"] - 8.29e9) / 8.29e9 < 0.01
    total = (
        r["params_gb"] + r["grads_gb"] + r["opt_state_gb"] + r["activations_gb"]
    )
    assert math.isclose(total, r["total_gb"], rel_tol=1e-6)
    assert r["fits"]  # the README-promised fsdp=8 full-param envelope

    r2 = tool.account((2, 4, 1), 16384, 2, 1024, 16.0, "train", False)
    assert not r2["fits"]  # fsdp=4 full-param does NOT fit 16 GB
