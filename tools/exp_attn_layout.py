"""Decode-attention layout variants: (S,H,D) vs (H,S,D) caches, einsum vs
dot_general, plus a Pallas per-head streaming kernel."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 16
L, B, S, H, D = 32, 1, 640, 32, 128


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    return np.asarray(jax.device_get(leaf)).ravel()[:1]


def bench(name, fn, *args, nbytes, iters=3):
    try:
        out = fn(*args)
        sync(out)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}")
        return
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"{name}: {t*1e3/R:.3f} ms/pass ({R*nbytes/t/1e9:.0f} GB/s)")


def attn_shd(q, k, v, bias):
    # (B,S,H,D) cache — current layout
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (D ** -0.5)
    probs = jax.nn.softmax(logits + bias[:, None, None, :], axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)


def attn_hsd(q, k, v, bias):
    # (B,H,S,D) cache
    logits = jnp.einsum("bqhd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (D ** -0.5)
    probs = jax.nn.softmax(logits + bias[:, None, None, :], axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return jnp.swapaxes(out, 1, 2)


def attn_pallas(q, k, v, bias):
    """k, v: (B, H, S, D). One grid step per (b, h): QK on MXU with q
    stationary, softmax on the (S,) column, PV as VPU broadcast-multiply +
    sublane reduction."""

    def kernel(q_ref, k_ref, v_ref, b_ref, o_ref):
        qh = q_ref[0, 0]                                  # (8, D) padded q
        kh = k_ref[0, 0]                                  # (S, D)
        logits = jax.lax.dot_general(
            kh, qh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (S, 8)
        logits = logits * (D ** -0.5) + b_ref[:]          # bias (S, 8)
        m = jnp.max(logits, axis=0, keepdims=True)
        p = jnp.exp(logits - m)
        z = jnp.sum(p, axis=0, keepdims=True)             # (1, 8)
        pv = p[:, :1].astype(v_ref.dtype) * v_ref[0, 0]   # (S, D)
        o = jnp.sum(pv.astype(jnp.float32), axis=0, keepdims=True)
        o_ref[0, 0] = o / z[:, :1]

    Bq, Hq = q.shape[0], q.shape[2]
    q8 = jnp.broadcast_to(q[:, 0][:, :, None, :], (Bq, Hq, 8, D))
    bias8 = jnp.broadcast_to(bias[0][:, None], (S, 8))
    out = pl.pallas_call(
        kernel,
        grid=(Bq, Hq),
        in_specs=[
            pl.BlockSpec((1, 1, 8, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 8), lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, D), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bq, Hq, 1, D), jnp.float32),
    )(q8, k, v, bias8)
    return jnp.swapaxes(out, 1, 2)                        # (B, 1, H, D)


def main():
    q = jnp.full((B, 1, H, D), 0.01, jnp.bfloat16)
    bias = jnp.zeros((B, S), jnp.float32)
    nbytes = 2 * L * B * S * H * D * 2

    k1 = jnp.full((L, B, S, H, D), 0.01, jnp.bfloat16)
    v1 = jnp.full((L, B, S, H, D), 0.01, jnp.bfloat16)
    jax.block_until_ready((k1, v1))

    def loop(attn, kk, vv):
        @jax.jit
        def run(q, kk, vv):
            def pass_(q, _):
                def layer(q, kv):
                    k, v = kv
                    o = attn(q, k, v, bias)
                    return (q + o * 1e-6).astype(q.dtype), None
                q, _ = jax.lax.scan(layer, q, (kk, vv))
                return q, None
            q, _ = jax.lax.scan(pass_, q, None, length=R)
            return q
        return run

    bench("attn (S,H,D) einsum", loop(attn_shd, k1, v1), q, k1, v1,
          nbytes=nbytes)
    k2 = jnp.swapaxes(k1, 2, 3).copy()
    v2 = jnp.swapaxes(v1, 2, 3).copy()
    del k1, v1
    jax.block_until_ready((k2, v2))
    bench("attn (H,S,D) einsum", loop(attn_hsd, k2, v2), q, k2, v2,
          nbytes=nbytes)
    bench("attn (H,S,D) pallas", loop(attn_pallas, k2, v2), q, k2, v2,
          nbytes=nbytes)


if __name__ == "__main__":
    main()
