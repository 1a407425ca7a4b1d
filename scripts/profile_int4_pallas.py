"""On-chip benchmark: int4 Pallas group-dequant matmul vs int8 XLA.

Isolated per-matmul timings are dispatch-bound on this tunneled backend
(~1 ms floor dwarfs the weight stream), so the comparison runs the way the
engine's decode actually does: ONE jitted program scanning a 28-layer
decoder-shaped matmul chain + lm_head, weights passed as arguments (baking
them as constants also overflows the remote-compile request limit).

    python scripts/profile_int4_pallas.py [--layers 28] [--rows 8]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from open_o3_video_tpu.ops.int4 import Int4Linear, int4_dense, quantize_weight_int4
from open_o3_video_tpu.ops.quant import QuantizedLinear, dense

D, F, V, KV = 3584, 18944, 152064, 512
NAMES = {"q": (D, D), "k": (D, KV), "v": (D, KV), "o": (D, D),
         "gate": (D, F), "up": (D, F), "down": (F, D)}


def build_stack(mode: str, layers: int, seed: int = 0):
    """Stacked (layers, ...) leaves for one decoder's matmuls + lm_head.

    Weights are generated AND quantized on-device (host RNG + the 38 MB/s
    tunnel would take minutes per mode for ~13 GB of bf16 source weights).
    """
    from open_o3_video_tpu.ops.quant import quantize_weight

    key = jax.random.PRNGKey(seed)

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def gen8(key, K, N):
        w = 0.02 * jax.random.normal(key, (K, N), jnp.float32)
        q = quantize_weight(w)
        return {"w_q": q.w_q, "scale": q.scale}

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def gen4(key, K, N):
        w = 0.02 * jax.random.normal(key, (K, N), jnp.float32)
        q = quantize_weight_int4(w, group=128)
        return {"w_p": q.w_p, "scale": q.scale}

    gen = gen8 if mode == "int8" else gen4
    stack = {}
    i = 0
    for name, (K, N) in NAMES.items():
        per = []
        for _ in range(layers):
            i += 1
            per.append(gen(jax.random.fold_in(key, i), K, N))
        stack[name] = jax.tree.map(lambda *xs: jnp.stack(xs), *per)
        for p in per:
            for leaf in jax.tree.leaves(p):
                leaf.delete()
    lm = gen(jax.random.fold_in(key, i + 1), D, V)
    return stack, lm


def _convert_only_int4(x, w_p):
    """Ceiling probe: bitcast+astype+ONE dot, no group scales (wrong math,
    right traffic) — bounds what any scale plumbing could achieve."""
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from open_o3_video_tpu.ops.int4 import _pick_blocks

    M, K = x.shape
    N = w_p.shape[1]
    g_blk, block_n = _pick_blocks(K, N, 128, M)
    kb = g_blk * 128
    nk = K // kb

    def kern(x_ref, p_ref, o_ref, acc_ref):
        k = pl.program_id(2)
        w = pltpu.bitcast(p_ref[:], jnp.int4).astype(jnp.bfloat16)
        part = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = part

        @pl.when(k > 0)
        def _():
            acc_ref[:] += part

        @pl.when(k == nk - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return pl.pallas_call(
        kern,
        grid=(M // M, N // block_n, nk),
        in_specs=[
            pl.BlockSpec((M, kb), lambda i, j, k: (0, k)),
            pl.BlockSpec((kb // 2, block_n), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((M, block_n), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((M, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )(x, w_p)


def make_fn(mode: str, steps: int):
    """One jitted program chaining ``steps`` full decode-shaped passes —
    per-step time comes from (T(steps) - T(1)) / (steps - 1), cancelling
    the relay dispatch + scalar-fetch round trip (~tens of ms here)."""

    def mat(x, leaf):
        if mode == "int8":
            return dense(x, QuantizedLinear(leaf["w_q"], leaf["scale"]))
        if mode == "int4-ceiling":
            return _convert_only_int4(x, leaf["w_p"])
        return int4_dense(x, Int4Linear(leaf["w_p"], leaf["scale"], 128))

    @jax.jit
    def run(x, stack, lm):
        def one(i, x):
            def body(x, layer):
                a = mat(mat(x, layer["q"]), layer["o"])
                kv = mat(x, layer["k"]) + mat(x, layer["v"])
                h = jax.nn.silu(mat(x, layer["gate"])) * mat(x, layer["up"])
                d = mat(h, layer["down"])
                return (x + a + d + jnp.tile(kv, (1, D // KV))).astype(x.dtype), None

            y, _ = jax.lax.scan(body, x, stack)
            out = mat(y, lm)
            # fold the head output back in (data dependency across steps)
            return jnp.tanh(y + out[:, :D].astype(y.dtype) * 1e-3)

        return jax.lax.fori_loop(0, steps, one, x).sum()

    return run


def gbytes(tree):
    return sum(l.size * l.dtype.itemsize for l in jax.tree.leaves(tree)) / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=28)
    ap.add_argument("--rows", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, size=(args.rows, D)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    results = {}
    K_STEPS = 9
    for mode in ("int8", "int4", "int4-ceiling"):
        stack, lm = build_stack(mode.split("-")[0], args.layers)
        gb = gbytes(stack) + gbytes(lm)
        fn1 = make_fn(mode, 1)
        fnk = make_fn(mode, K_STEPS)
        t0 = time.perf_counter()
        float(fn1(x, stack, lm))
        float(fnk(x, stack, lm))
        compile_s = time.perf_counter() - t0

        def med(fn, n=args.iters):
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                # Full host round trip per call: block_until_ready alone
                # does NOT wait for execution on this relay.
                float(fn(x, stack, lm))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        t1, tk = med(fn1), med(fnk)
        dt = (tk - t1) / (K_STEPS - 1)
        results[mode] = dt
        print(
            f"{mode}: {args.layers}-layer decode-shaped step {dt*1e3:8.3f} ms"
            f"  weights {gb:5.2f} GB -> {gb/dt:6.1f} GB/s"
            f"  (T1 {t1*1e3:.1f} ms, T{K_STEPS} {tk*1e3:.1f} ms,"
            f" compile {compile_s:.1f} s)",
            flush=True,
        )
        for leaf in jax.tree.leaves((stack, lm)):
            leaf.delete()
    print(f"speedup int4 vs int8: {results['int8']/results['int4']:.2f}x"
          f"  (ceiling {results['int8']/results['int4-ceiling']:.2f}x)")


if __name__ == "__main__":
    main()
