"""Mesh/sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, forward, get_rope_index, params as P
from open_o3_video_tpu.parallel import make_mesh, param_sharding_rules, shard_params


@pytest.fixture(scope="module")
def tiny():
    cfg = Qwen25VLConfig.tiny()
    return cfg, P.init(cfg, seed=0)


def test_mesh_shapes():
    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    assert dict(mesh.shape) == {"data": 2, "fsdp": 2, "tensor": 2}
    mesh = make_mesh(tensor=4)  # fsdp absorbs the rest
    assert dict(mesh.shape) == {"data": 1, "fsdp": 2, "tensor": 4}


def test_sharding_rules_divisibility_fallback(tiny):
    cfg, params = tiny
    mesh = make_mesh(data=1, fsdp=2, tensor=4)
    specs = param_sharding_rules(params, mesh)
    # 64-dim hidden shards over tensor=4 (16 each); fsdp=2 divides 64 too.
    q_spec = specs["text"]["layers"][0]["q_w"]
    assert q_spec == jax.sharding.PartitionSpec("fsdp", "tensor")


@pytest.mark.parametrize("mesh_shape", [(1, 1, 8), (1, 8, 1), (2, 2, 2)])
def test_sharded_forward_matches_single_device(tiny, mesh_shape):
    """Logits must be identical (up to fp assoc.) under any mesh layout."""
    cfg, params = tiny
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 400, size=(2, 16))
    pos, _ = get_rope_index(cfg, ids)

    ref_logits, _ = forward(params, cfg, jnp.asarray(ids), jnp.asarray(pos))
    ref = np.asarray(ref_logits)

    data, fsdp, tensor = mesh_shape
    mesh = make_mesh(data=data, fsdp=fsdp, tensor=tensor)
    sharded = shard_params(params, mesh)
    out, _ = jax.jit(lambda p, i, q: forward(p, cfg, i, q))(
        sharded, jnp.asarray(ids), jnp.asarray(pos)
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)


def test_sharded_vision_forward(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(1)
    grid = np.array([[1, 8, 8]], dtype=np.int64)
    patches = rng.normal(0, 1, (64, cfg.vision.patch_dim)).astype(np.float32)
    ids = np.array([[5, 6, cfg.vision_start_token_id] + [cfg.image_token_id] * 16 + [cfg.vision_end_token_id, 7]])
    pos, _ = get_rope_index(cfg, ids, image_grid_thw=grid)

    ref, _ = forward(params, cfg, jnp.asarray(ids), jnp.asarray(pos),
                     pixel_patches=jnp.asarray(patches), grid_thw=grid)

    mesh = make_mesh(data=1, fsdp=2, tensor=4)
    sharded = shard_params(params, mesh)
    out, _ = forward(sharded, cfg, jnp.asarray(ids), jnp.asarray(pos),
                     pixel_patches=jnp.asarray(patches), grid_thw=grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)
