"""Microbenchmark: Pallas window attention vs XLA, isolated.

Shapes mirror one vision layer at the bench geometry: 8 videos x 16 frames
of 18x24 patches -> windowed (1088, 64) segments + global (128, 432).
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from open_o3_video_tpu.ops.window_attention import window_attention


def force(x):
    leaf = jax.tree.leaves(x)[0]
    return np.asarray(leaf[tuple(0 for _ in leaf.shape)])


def timed(fn, *args, iters=5):
    force(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.time()
        force(fn(*args))
        ts.append(time.time() - t0)
    return float(np.median(ts)) * 1e3


def xla_attn(q, k, v, valid):
    mask = (valid[:, None, :] & valid[:, :, None])[:, None, :, :]
    return jax.nn.dot_product_attention(q, k, v, mask=mask)


def main():
    rng = np.random.default_rng(0)
    for (n, w, h, d, frac) in [
        (1088, 64, 16, 80, 0.9),
        (128, 432, 16, 80, 1.0),
        (1088, 64, 16, 128, 0.9),   # lane-aligned head_dim
        (128, 432, 16, 128, 1.0),
    ]:
        q, k, v = (
            jnp.asarray(rng.standard_normal((n, w, h, d)), jnp.bfloat16)
            for _ in range(3)
        )
        valid = np.zeros((n, w), bool)
        for i in range(n):
            valid[i, : max(1, int(w * frac))] = True
        valid = jnp.asarray(valid)

        t_x = timed(jax.jit(xla_attn), q, k, v, valid)
        t_p = timed(jax.jit(lambda a, b, c, m: window_attention(a, b, c, m)),
                    q, k, v, valid)
        # 32 layers' worth, to compare against the tower ablation numbers
        print(f"(N={n}, W={w}): xla {t_x:7.2f} ms/layer ({32*t_x:6.0f} ms/tower)  "
              f"pallas {t_p:7.2f} ms/layer ({32*t_p:6.0f} ms/tower)")


if __name__ == "__main__":
    main()
