"""Isolate where the int4 kernel's time goes on the real chip.

Variants on one gate-proj-shaped matmul (3584 -> 18944), M=16, chained
inside one jit so dispatch amortizes:
  stream   : bf16 dot on the PACKED bytes as-is (wrong math, no unpack) —
             the pure HBM-stream + MXU lower bound for half-size weights
  convert  : bitcast int4 -> bf16, ONE dot, no scales
  grouped  : bitcast + per-group dots + output scaling (the real kernel)
  int8ref  : XLA int8 dense at full (K, N) — the baseline to beat
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K, N = 3584, 18944
GROUP = 128
BM = 16
BN = 4736
CHAIN = 48
K2 = K // 2


def _acc(kern_body, nk):
    def kern(*refs):
        k = pl.program_id(2)
        out_ref, acc_ref = refs[-2], refs[-1]
        part = kern_body(*refs[:-2])

        @pl.when(k == 0)
        def _():
            acc_ref[:] = part

        @pl.when(k > 0)
        def _():
            acc_ref[:] += part

        @pl.when(k == nk - 1)
        def _():
            out_ref[:] = acc_ref[:]

    return kern


def make_stream():
    nk = K2 // 256

    def body(x_ref, p_ref):
        return jax.lax.dot_general(
            x_ref[:], p_ref[:].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return pl.pallas_call(
        _acc(body, nk),
        grid=(1, N // BN, nk),
        in_specs=[
            pl.BlockSpec((BM, 256), lambda i, j, k: (0, k)),
            pl.BlockSpec((256, BN), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((BM, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )


def make_convert():
    nk = K // 512

    def body(x_ref, p_ref):
        w = pltpu.bitcast(p_ref[:], jnp.int4).astype(jnp.bfloat16)
        return jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    return pl.pallas_call(
        _acc(body, nk),
        grid=(1, N // BN, nk),
        in_specs=[
            pl.BlockSpec((BM, 512), lambda i, j, k: (0, k)),
            pl.BlockSpec((256, BN), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((BM, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )


def make_grouped():
    nk = K // 512

    def body(x_ref, p_ref, s_ref):
        w = pltpu.bitcast(p_ref[:], jnp.int4).astype(jnp.bfloat16)
        acc = None
        for g in range(512 // GROUP):
            d = jnp.dot(
                x_ref[:, g * GROUP : (g + 1) * GROUP],
                w[g * GROUP : (g + 1) * GROUP],
                preferred_element_type=jnp.float32,
            ) * s_ref[g].astype(jnp.float32)
            acc = d if acc is None else acc + d
        return acc

    return pl.pallas_call(
        _acc(body, nk),
        grid=(1, N // BN, nk),
        in_specs=[
            pl.BlockSpec((BM, 512), lambda i, j, k: (0, k)),
            pl.BlockSpec((256, BN), lambda i, j, k: (k, j)),
            pl.BlockSpec((4, 1, BN), lambda i, j, k: (k, 0, j)),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((BM, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )


def chained(call):
    """Scan over CHAIN stacked DISTINCT weights (leading axis), mirroring
    the engine's per-layer streaming — a fori_loop re-reading ONE weight
    measured ~40-90 GB/s for every variant including plain int8 XLA (the
    single hot buffer defeats prefetch), so it cannot rank kernels."""

    def run(x, ws):
        def one(x, wslice):
            y = call(x, *wslice)
            return jnp.tanh(x + y[:, :K].astype(x.dtype) * 1e-3), None

        out, _ = jax.lax.scan(one, x, ws)
        return out.sum()

    return jax.jit(run)


def main():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    gen8 = jax.jit(
        lambda k: jnp.clip(
            jnp.round(jax.random.normal(k, (K, N)) * 50), -127, 127
        ).astype(jnp.int8)
    )
    w8 = jnp.stack([gen8(jax.random.fold_in(key, i)) for i in range(CHAIN)])
    wp = jax.jit(lambda w: w[:, 0::2].copy())(w8)  # (CHAIN, K/2, N) packed
    scale = jnp.ones((CHAIN, K // GROUP, 1, N), jnp.float32)
    x = jax.random.normal(jax.random.fold_in(key, 1), (BM, K)).astype(jnp.bfloat16)

    from open_o3_video_tpu.ops.quant import QuantizedLinear, dense

    stream_pc, convert_pc, grouped_pc = make_stream(), make_convert(), make_grouped()
    cases = {
        "stream (K/2 bytes, no unpack)": (
            chained(lambda xx, ww: stream_pc(xx[:, :K2], ww)), (x, (wp,)), K2 * N / 1e9,
        ),
        "convert (bitcast+astype, 1 dot)": (
            chained(lambda xx, ww: convert_pc(xx, ww)), (x, (wp,)), K2 * N / 1e9,
        ),
        "grouped (real kernel)": (
            chained(lambda xx, ww, ss: grouped_pc(xx, ww, ss)),
            (x, (wp, scale)), K2 * N / 1e9,
        ),
        "int8 XLA dense": (
            chained(lambda xx, ww, ss: dense(xx, QuantizedLinear(ww, ss))),
            (x, (w8, jnp.ones((CHAIN, 1, N), jnp.float32))), K * N / 1e9,
        ),
    }
    for name, (fn, args, gb) in cases.items():
        try:
            float(fn(*args))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(fn(*args))
                ts.append(time.perf_counter() - t0)
            dt = float(np.median(ts)) / CHAIN
            print(f"{name:34s} {dt*1e3:7.3f} ms/matmul  {gb/dt:7.1f} GB/s", flush=True)
        except Exception as e:
            print(f"{name:34s} FAILED: {type(e).__name__} {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
