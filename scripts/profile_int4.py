"""On-chip probe: can XLA serve int4 group-quantized weights at the decode
roofline without a custom kernel?

Decode is weight-HBM-bound (int8 7B streams ~9.5 GB/step-batch). int4 halves
that IF the (convert + group-scale multiply) chain fuses into the dot's
weight operand; if XLA materializes a dequantized bf16/int8 copy instead,
traffic doubles and int4 loses. This script times decode-shaped GEMVs
(M=8 rows) per weight format. Timing forces a scalar readback — through the
tunneled TPU, block_until_ready returns before execution finishes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

M = int(os.environ.get("M", "8"))
GROUP = 128
SHAPES = [(3584, 18944, "mlp_up"), (18944, 3584, "mlp_down"), (3584, 152064, "lm_head")]
N_ITERS = 16


def timed(fn, *args):
    float(fn(*args).sum())  # compile + run
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args).sum())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    for K, N, name in SHAPES:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (M, K), jnp.bfloat16)
        w8 = jnp.asarray(np.random.randint(-127, 128, (K, N), np.int8))
        s8 = jnp.ones((1, N), jnp.float32)
        # Native s4 arrays cannot cross jit boundaries on this backend
        # (device_put of S4 with a tiled layout recurses); pack two nibbles
        # per uint8 byte ourselves along K (k=2*i low nibble, k=2*i+1 high).
        w4_vals = np.random.randint(-8, 8, (K, N), np.int8)
        packed = ((w4_vals[0::2] & 0xF) | ((w4_vals[1::2] & 0xF) << 4)).astype(np.uint8)
        w4 = jnp.asarray(packed)  # (K//2, N) uint8
        s4 = jnp.ones((K // GROUP, N), jnp.bfloat16)

        @jax.jit
        def gemv8(x, w, s):
            def body(i, c):
                y = jax.lax.dot_general(
                    c, w.astype(c.dtype), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                m = min(K, N)
                upd = (y[:, :m] * s[:, :m]).astype(c.dtype) * 1e-6
                return c + jnp.pad(upd, ((0, 0), (0, K - m)))
            return jax.lax.fori_loop(0, N_ITERS, body, x)

        @jax.jit
        def gemv4(x, w, s):
            def body(i, c):
                lo = jnp.left_shift(w, 4).astype(jnp.int8) >> 4  # sign-extend
                hi = w.astype(jnp.int8) >> 4
                wq = jnp.stack([lo, hi], axis=1).reshape(K, N)  # (K, N) int8
                wd = (wq.astype(c.dtype).reshape(K // GROUP, GROUP, N)
                      * s.astype(c.dtype)[:, None, :]).reshape(K, N)
                y = jax.lax.dot_general(
                    c, wd, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                m = min(K, N)
                return c + jnp.pad(y[:, :m].astype(c.dtype) * 1e-6,
                                   ((0, 0), (0, K - m)))
            return jax.lax.fori_loop(0, N_ITERS, body, x)

        t8 = timed(gemv8, x, w8, s8) / N_ITERS
        t4 = timed(gemv4, x, w4, s4) / N_ITERS
        gb8 = K * N / 1e9
        gb4 = K * N / 2 / 1e9
        print(f"{name:8s} K={K} N={N}  int8 {t8*1e3:7.3f} ms ({gb8/t8:.0f} GB/s)"
              f"   int4 {t4*1e3:7.3f} ms ({gb4/t4:.0f} GB/s eff)   speedup {t8/t4:.2f}x")


if __name__ == "__main__":
    main()
