"""Sampling ops (ops/sampling.py) — the top-p fast path must be EXACT.

The fast path takes top-k logits normalized against the full-vocab
logsumexp and only applies when the nucleus provably lies inside the
top-k set; otherwise it falls back to the full sort. Outputs must be
bit-identical to the full-sort filter in every regime."""

import numpy as np

import jax
import jax.numpy as jnp

from open_o3_video_tpu.ops import sampling as S


def _full(logits, p):
    return np.asarray(S._top_p_full(jnp.asarray(logits), p))


def _fast(logits, p):
    return np.asarray(S.top_p_filter(jnp.asarray(logits), p))


def test_peaked_distribution_uses_fast_path_and_matches():
    rng = np.random.default_rng(0)
    V = 4 * S.TOP_P_FAST_K
    logits = rng.normal(0, 1, size=(3, V)).astype(np.float32)
    logits[0, 7] = 20.0  # concentrated rows -> nucleus tiny
    logits[1, 100] = 15.0
    logits[1, 101] = 14.5
    logits[2, 2000] = 25.0
    for p in (0.5, 0.9, 0.95, 0.99):
        np.testing.assert_array_equal(_fast(logits, p), _full(logits, p))


def test_flat_distribution_falls_back_exactly():
    rng = np.random.default_rng(1)
    V = 4 * S.TOP_P_FAST_K
    logits = rng.normal(0, 0.01, size=(2, V)).astype(np.float32)  # near-uniform
    out_fast = _fast(logits, 0.95)
    out_full = _full(logits, 0.95)
    np.testing.assert_array_equal(out_fast, out_full)
    # sanity: the nucleus really is bigger than the fast-path k
    assert (np.isfinite(out_full[0]).sum()) > S.TOP_P_FAST_K


def test_threshold_ties_keep_identical_sets():
    V = 4 * S.TOP_P_FAST_K
    logits = np.full((1, V), -10.0, np.float32)
    logits[0, :8] = 5.0  # 8-way tie at the threshold
    logits[0, 8] = 4.0
    for p in (0.3, 0.8, 0.999):
        np.testing.assert_array_equal(_fast(logits, p), _full(logits, p))


def test_small_vocab_uses_full_path():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(2, 64)).astype(np.float32)
    np.testing.assert_array_equal(_fast(logits, 0.9), _full(logits, 0.9))


def test_sample_token_distribution_unchanged():
    """Categorical over the filtered logits: same filtered sets -> same
    samples for the same rng keys."""
    rng = np.random.default_rng(3)
    V = 4 * S.TOP_P_FAST_K
    logits = rng.normal(0, 3, size=(4, V)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    a = S.sample_token(key, jnp.asarray(logits), temperature=1.0, top_p=0.95)
    filt = S._top_p_full(jnp.asarray(logits), 0.95)
    b = jax.random.categorical(key, filt, axis=-1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
