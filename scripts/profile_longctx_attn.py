"""Profile chunk-prefill attention at the 81920 envelope (7B dims).

One decoder layer's attention for an 8192-query chunk against a T=81920
KV buffer, per chunk offset — the long-context prefill hot loop. Times the
Pallas flash kernel across the full chunk sweep and prints the implied
whole-prompt attention seconds (28 layers, 10 chunks). Numerical parity
vs the XLA fallback runs at reduced geometry (the full-size XLA path
materializes a (H, S, T) score tensor = 75 GB and cannot run on-chip)."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from open_o3_video_tpu.ops.attention import causal_attention

B, Hq, Hkv, D = 1, 28, 4, 128
S, T = 8192, 81920
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(0, 1, (B, S, Hq, D)), jnp.bfloat16)
k = jnp.asarray(rng.normal(0, 1, (B, T, Hkv, D)), jnp.bfloat16)
v = jnp.asarray(rng.normal(0, 1, (B, T, Hkv, D)), jnp.bfloat16)

def run(impl, c0, q_, k_, v_, T_):
    S_ = q_.shape[1]
    qp = jnp.arange(c0, c0 + S_, dtype=jnp.int32)[None]
    kvp = jnp.arange(T_, dtype=jnp.int32)[None]
    kvm = (jnp.arange(T_)[None] < c0 + S_)
    f = jax.jit(lambda q, k, v: causal_attention(
        q, k, v, q_positions=qp, kv_positions=kvp, kv_mask=kvm, impl=impl))
    o = f(q_, k_, v_); o.block_until_ready()  # compile
    ts = []
    for _ in range(3):
        t0 = time.time(); o = f(q_, k_, v_); o.block_until_ready()
        ts.append(time.time() - t0)
    return min(ts), o

tot = 0.0
for c0 in range(0, T, S):
    t, o = run("pallas", c0, q, k, v, T)
    tot += t
    print(f"chunk@{c0}: pallas {t*1e3:.1f} ms", flush=True)
print(f"implied whole-prompt attention: {tot*28:.1f} s over 28 layers")

# parity vs xla at reduced geometry (S=1024 against T=8192 KV)
Sr, Tr = 1024, 8192
t_x, o_x = run("xla", 4096, q[:, :Sr], k[:, :Tr], v[:, :Tr], Tr)
t_p, o_p = run("pallas", 4096, q[:, :Sr], k[:, :Tr], v[:, :Tr], Tr)
d = float(jnp.max(jnp.abs(o_x.astype(jnp.float32) - o_p.astype(jnp.float32))))
print(f"reduced parity: xla {t_x*1e3:.1f} ms, pallas {t_p*1e3:.1f} ms, maxdiff {d:.4f}")
assert d < 0.02, d
