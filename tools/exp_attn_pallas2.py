"""Pallas decode attention with head-chunked grid: (B, H//HC) steps, each
DMA-ing (HC, S, D) K/V blocks, per-head MXU QK (k streaming) + VPU PV.
Checks correctness vs the XLA oracle and benches vs the einsum path."""

from __future__ import annotations

import functools
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


def decode_attn_pallas(q, k, v, bias, *, hc=16):
    """q (B,1,H,D); k,v (B,H,S,D); bias (B,S) additive fp32.
    Returns (B,1,H,D) fp32."""
    Bq, _, Hq, Dq = q.shape
    Sq = k.shape[2]
    q8 = jnp.broadcast_to(q[:, 0][:, :, None, :], (Bq, Hq, 8, Dq))

    def kernel(q_ref, k_ref, v_ref, b_ref, o_ref):
        bias_col = b_ref[:].reshape(Sq, 1)                 # (S, 1) hmm 2D ok
        for i in range(hc):
            kh = k_ref[0, i]                               # (S, D)
            qh = q_ref[0, i]                               # (8, D)
            logits = jax.lax.dot_general(
                kh, qh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (S, 8)
            logits = logits * (Dq ** -0.5) + bias_col
            m = jnp.max(logits[:, :1], axis=0, keepdims=True)
            p = jnp.exp(logits[:, :1] - m)                 # (S, 1)
            z = jnp.sum(p, axis=0, keepdims=True)
            pv = p.astype(v_ref.dtype) * v_ref[0, i]       # (S, D)
            o = jnp.sum(pv.astype(jnp.float32), axis=0, keepdims=True)
            o_ref[0, i, :] = (o / z)[0]

    out = pl.pallas_call(
        kernel,
        grid=(Bq, Hq // hc),
        in_specs=[
            pl.BlockSpec((1, hc, 8, Dq), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc, Sq, Dq), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc, Sq, Dq), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sq), lambda b, h: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hc, Dq), lambda b, h: (b, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bq, Hq, Dq), jnp.float32),
    )(q8, k, v, bias)
    return out[:, None]                                    # (B,1,H,D)


def attn_xla(q, k, v, bias):
    logits = jnp.einsum("bqhd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (D ** -0.5)
    probs = jax.nn.softmax(logits + bias[:, None, None, :], axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return jnp.swapaxes(out, 1, 2)


def bench(name, fn, *args, nbytes, iters=3):
    try:
        out = fn(*args)
        sync(out)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")
        return
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"{name}: {t*1e3/R:.3f} ms/pass ({R*nbytes/t/1e9:.0f} GB/s)")


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.bfloat16)
    k1 = jnp.asarray(rng.standard_normal((B, H, S, D)) * 0.3, jnp.bfloat16)
    v1 = jnp.asarray(rng.standard_normal((B, H, S, D)) * 0.3, jnp.bfloat16)
    bias = jnp.where(jnp.arange(S)[None] < 500, 0.0, -1e9).astype(jnp.float32)

    ref = attn_xla(q, k1, v1, bias)
    for hc in (8, 16):
        got = decode_attn_pallas(q, k1, v1, bias, hc=hc)
        err = float(jnp.max(jnp.abs(got - ref)))
        print(f"hc={hc} max err vs XLA: {err:.4f}")

    nbytes = 2 * L * B * S * H * D * 2
    kk = jnp.full((L, B, H, S, D), 0.01, jnp.bfloat16)
    vv = jnp.full((L, B, H, S, D), 0.01, jnp.bfloat16)
    jax.block_until_ready((kk, vv))

    def loop(attn):
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

    bench("xla einsum (H,S,D)", loop(attn_xla), q, kk, vv, nbytes=nbytes)
    for hc in (8, 16):
        bench(f"pallas hc={hc}",
              loop(functools.partial(decode_attn_pallas, hc=hc)),
              q, kk, vv, nbytes=nbytes)


if __name__ == "__main__":
    main()
