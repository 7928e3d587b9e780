"""Isolate decode-attention cost: bf16 cache vs int8 cache (logits-side
dequant) vs int8 with on-the-fly operand upcast, 32 layers x R reps."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from valley_tpu.ops.attention import decode_attention

R = 16
L, B, S, H, D = 32, 1, 640, 32, 128


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    return np.asarray(jax.device_get(leaf)).ravel()[:1]


def bench(name, fn, *args, nbytes, iters=3):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"{name}: {t*1e3/R:.3f} ms/pass ({R*nbytes/t/1e9:.0f} GB/s)")


def main():
    kb = jnp.full((L, B, S, H, D), 0.01, jnp.bfloat16)
    vb = jnp.full((L, B, S, H, D), 0.01, jnp.bfloat16)
    ki = jnp.ones((L, B, S, H, D), jnp.int8)
    vi = jnp.ones((L, B, S, H, D), jnp.int8)
    ks = jnp.full((L, B, S, H), 0.01, jnp.bfloat16)
    vs = jnp.full((L, B, S, H), 0.01, jnp.bfloat16)
    q = jnp.full((B, 1, H, D), 0.01, jnp.bfloat16)
    mask = jnp.ones((B, S), bool)
    jax.block_until_ready((kb, vb, ki, vi))

    @jax.jit
    def run_bf16(q, kb, vb):
        def pass_(q, _):
            def layer(q, kv):
                k, v = kv
                o = decode_attention(q, k, v, mask)
                return (q + o * 1e-6).astype(q.dtype), None
            q, _ = jax.lax.scan(layer, q, (kb, vb))
            return q, None
        q, _ = jax.lax.scan(pass_, q, None, length=R)
        return q

    @jax.jit
    def run_int8(q, ki, vi, ks, vs):
        def pass_(q, _):
            def layer(q, kv):
                k, v, s1, s2 = kv
                o = decode_attention(q, k, v, mask, k_scale=s1, v_scale=s2)
                return (q + o * 1e-6).astype(q.dtype), None
            q, _ = jax.lax.scan(layer, q, (ki, vi, ks, vs))
            return q, None
        q, _ = jax.lax.scan(pass_, q, None, length=R)
        return q

    bf_bytes = 2 * L * B * S * H * D * 2
    i8_bytes = 2 * L * B * S * H * D + 2 * L * B * S * H * 2
    bench("attn bf16 cache", run_bf16, q, kb, vb, nbytes=bf_bytes)
    bench("attn int8 cache", run_int8, q, ki, vi, ks, vs, nbytes=i8_bytes)


if __name__ == "__main__":
    main()
