"""Attention-logit telemetry (O3V_LOGIT_STATS=1, ops/attention.py).

The fixed-m kernels clamp at 60.0 assuming O(30) logits; this hook lets a
real-checkpoint run measure the actual max masked logit (VERDICT r4 weak
#3). Pinned: the recorded value equals the analytic masked max for both
the causal and the segment (ViT) paths, and masked-out positions are
excluded."""

import numpy as np
import pytest

import jax.numpy as jnp

from open_o3_video_tpu.ops import attention as A


@pytest.fixture(autouse=True)
def _stats_env(monkeypatch):
    monkeypatch.setenv("O3V_LOGIT_STATS", "1")
    A.reset_logit_stats()
    yield
    A.reset_logit_stats()


def test_causal_hook_records_masked_max():
    B, S, Hq, Hkv, D, T = 1, 2, 4, 2, 128, 16
    q = np.zeros((B, S, Hq, D), np.float32)
    k = np.zeros((B, T, Hkv, D), np.float32)
    v = np.random.default_rng(0).normal(size=(B, T, Hkv, D)).astype(np.float32)
    # position (s=1, h=0) vs key t=3: logit = 42; a LARGER one (t=10) is
    # causally masked for every query and must not be recorded
    q[0, 1, 0, 0] = 42.0 * np.sqrt(D)
    k[0, 3, 0, 0] = 1.0
    k[0, 10, 0, 0] = 100.0
    qpos = jnp.asarray([[0, 5]], jnp.int32)
    kvpos = jnp.arange(T, dtype=jnp.int32)[None, :]
    A.causal_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                       q_positions=qpos, kv_positions=kvpos, impl="xla")
    assert A.LOGIT_STATS["calls"] == 1
    np.testing.assert_allclose(A.LOGIT_STATS["max"], 42.0, rtol=1e-5)


def test_segment_hook_records_max_and_respects_ids():
    N, W, H, D = 1, 8, 2, 128
    q = np.zeros((N, W, H, D), np.float32)
    k = np.zeros((N, W, H, D), np.float32)
    v = np.random.default_rng(1).normal(size=(N, W, H, D)).astype(np.float32)
    # same-segment pair -> logit 17; cross-segment pair with a larger dot
    # is masked out
    q[0, 0, 0, 0] = 17.0 * np.sqrt(D)
    k[0, 1, 0, 0] = 1.0
    q[0, 2, 0, 0] = 99.0 * np.sqrt(D)
    k[0, 5, 0, 0] = 1.0
    ids = np.asarray([[1, 1, 2, 2, 0, 3, 3, 0]], np.int32)
    A.segment_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        jnp.asarray(ids), impl="xla")
    assert A.LOGIT_STATS["calls"] == 1
    np.testing.assert_allclose(A.LOGIT_STATS["max"], 17.0, rtol=1e-5)


def test_off_by_default(monkeypatch):
    monkeypatch.setenv("O3V_LOGIT_STATS", "0")
    A.reset_logit_stats()
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 2, 4, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 8, 2, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 8, 2, 16)).astype(np.float32))
    A.causal_attention(q, k, v, impl="xla")
    assert A.LOGIT_STATS["max"] is None and A.LOGIT_STATS["calls"] == 0
