"""In-program layout experiment for the ViT window attention kernel.

Times 32 chained calls (one jit program each) of:
  wrapper    : window_attention as-is — includes the (N,W,H,D)->(N,H,W,D)
               transposes of _prep on every call
  raw        : the pallas_call on pre-transposed (N,H,W,D) data
  transpose  : just the 4 transposes (there and back), no kernel
  xla        : jax.nn.dot_product_attention on (N,W,H,D)

Run on the chip: python scripts/exp_winattn_layout.py
"""

import os
import sys
import time
import functools

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
import jax.numpy as jnp
from jax.experimental import pallas as pl

from open_o3_video_tpu.ops import window_attention as WA

LAYERS = 32


def force(x):
    leaf = jax.tree.leaves(x)[0]
    return np.asarray(leaf[tuple(0 for _ in leaf.shape)])


def timed(fn, *args, iters=3):
    force(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.time()
        force(fn(*args))
        ts.append(time.time() - t0)
    return float(np.median(ts)) * 1e3


def raw_kernel(qt, kt, vt, val, gn, gh):
    n_pad, h, w, d = qt.shape
    grid = (n_pad // gn, h // gh)
    tile = ((gn, gh, w, d), lambda i, j: (i, j, 0, 0))
    return pl.pallas_call(
        functools.partial(WA._fwd_kernel, scale=d ** -0.5),
        grid=grid,
        in_specs=[
            pl.BlockSpec((gn, 1, w), lambda i, j: (i, 0, 0)),
            pl.BlockSpec(*tile),
            pl.BlockSpec(*tile),
            pl.BlockSpec(*tile),
        ],
        out_specs=pl.BlockSpec(*tile),
        out_shape=jax.ShapeDtypeStruct((n_pad, h, w, d), qt.dtype),
    )(val, qt, kt, vt)


def main():
    rng = np.random.default_rng(0)
    n, w, h, d = 1280, 64, 16, 80
    q, k, v = (
        jnp.asarray(rng.standard_normal((n, w, h, d)) * 0.1, jnp.bfloat16)
        for _ in range(3)
    )
    valid = jnp.asarray(rng.random((n, w)) < 0.9)
    gn, gh = WA._block_shape(n, w, h, d)
    print(f"block shape gn={gn} gh={gh}", file=sys.stderr)
    val32 = valid.astype(jnp.int32)[:, None, :]
    qt = q.transpose(0, 2, 1, 3)

    def run_wrapper(q, k, v, valid):
        return jax.lax.fori_loop(
            0, LAYERS, lambda i, x: WA.window_attention(x, k, v, valid), q
        )

    def run_raw(qt, kt, vt, val32):
        return jax.lax.fori_loop(
            0, LAYERS, lambda i, x: raw_kernel(x, kt, vt, val32, gn, gh), qt
        )

    def run_transpose(q, k, v, _):
        def body(i, x):
            y = x.transpose(0, 2, 1, 3)
            y2 = k.transpose(0, 2, 1, 3)
            y3 = v.transpose(0, 2, 1, 3)
            return (y + y2 + y3).transpose(0, 2, 1, 3)
        return jax.lax.fori_loop(0, LAYERS, body, q)

    def run_xla(q, k, v, valid):
        mask = (valid[:, None, :] & valid[:, :, None])[:, None, :, :]
        return jax.lax.fori_loop(
            0, LAYERS,
            lambda i, x: jax.nn.dot_product_attention(x, k, v, mask=mask), q
        )

    only = set(sys.argv[1:])
    for name, fn, args in [
        ("wrapper", run_wrapper, (q, k, v, valid)),
        ("raw", run_raw,
         (qt, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), val32)),
        ("transpose", run_transpose, (q, k, v, valid)),
        ("xla", run_xla, (q, k, v, valid)),
    ]:
        if only and name not in only:
            continue
        print(f"compiling {name}...", file=sys.stderr, flush=True)
        t = timed(jax.jit(fn), *args)
        print(f"{name:9s}: {t:8.1f} ms / {LAYERS} layers = {t/LAYERS:6.2f} ms/layer")


if __name__ == "__main__":
    main()
