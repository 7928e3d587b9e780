"""Pallas decode attention, stacked-cache edition: the kernel takes the
FULL (L,B,H,S,D) cache and picks the layer block via a scalar-prefetch
index — no per-layer slice materialization inside the decode scan."""

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


def decode_attn_stacked(q, k_all, v_all, bias, li, *, hc=16):
    """q (B,1,H,D); k_all/v_all (L,B,H,S,D); bias (B,S); li scalar layer.
    Returns (B,1,H,D) fp32."""
    Bq, _, Hq, Dq = q.shape
    Sq = k_all.shape[3]
    q8 = jnp.broadcast_to(q[:, 0][:, :, None, :], (Bq, Hq, 8, Dq))

    def kernel(li_ref, q_ref, k_ref, v_ref, b_ref, o_ref):
        del li_ref
        bias_col = b_ref[:].reshape(Sq, 1)
        for i in range(hc):
            kh = k_ref[0, 0, i]                            # (S, D)
            qh = q_ref[0, i]                               # (8, D)
            logits = jax.lax.dot_general(
                kh, qh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (S, 8)
            logits = logits * (Dq ** -0.5) + bias_col
            m = jnp.max(logits[:, :1], axis=0, keepdims=True)
            p = jnp.exp(logits[:, :1] - m)
            z = jnp.sum(p, axis=0, keepdims=True)
            pv = p.astype(v_ref.dtype) * v_ref[0, 0, i]
            o = jnp.sum(pv.astype(jnp.float32), axis=0, keepdims=True)
            o_ref[0, i, :] = (o / z)[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bq, Hq // hc),
        in_specs=[
            pl.BlockSpec((1, hc, 8, Dq),
                         lambda b, h, li: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, hc, Sq, Dq),
                         lambda b, h, li: (li[0], b, h, 0, 0)),
            pl.BlockSpec((1, 1, hc, Sq, Dq),
                         lambda b, h, li: (li[0], b, h, 0, 0)),
            pl.BlockSpec((1, Sq), lambda b, h, li: (b, 0)),
        ],
        out_specs=pl.BlockSpec((1, hc, Dq), lambda b, h, li: (b, h, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bq, Hq, Dq), jnp.float32),
    )(jnp.asarray([li], jnp.int32), q8, k_all, v_all, bias)
    return out[:, None]


def attn_xla(q, k, v, bias):
    logits = jnp.einsum("bqhd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (D ** -0.5)
    probs = jax.nn.softmax(logits + bias[:, None, None, :], axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return jnp.swapaxes(out, 1, 2)


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.bfloat16)
    bias = jnp.where(jnp.arange(S)[None] < 500, 0.0,
                     -1e9).astype(jnp.float32)
    k_all = jnp.asarray(rng.standard_normal((4, B, H, S, D)) * 0.3,
                        jnp.bfloat16)
    v_all = jnp.asarray(rng.standard_normal((4, B, H, S, D)) * 0.3,
                        jnp.bfloat16)

    ref = attn_xla(q, k_all[2], v_all[2], bias)
    got = decode_attn_stacked(q, k_all, v_all, bias, 2)
    print("max err vs XLA:", float(jnp.max(jnp.abs(got - ref))))

    del k_all, v_all
    kk = jnp.full((L, B, H, S, D), 0.01, jnp.bfloat16)
    vv = jnp.full((L, B, H, S, D), 0.01, jnp.bfloat16)
    jax.block_until_ready((kk, vv))
    nbytes = 2 * L * B * S * H * D * 2

    def loop(hc):
        @jax.jit
        def run(q, kk, vv):
            def pass_(q, _):
                def layer(carry, _):
                    q, li = carry
                    o = decode_attn_stacked(q, kk, vv, bias, li, hc=hc)
                    return ((q + o * 1e-6).astype(q.dtype), li + 1), None
                (q, _), _ = jax.lax.scan(layer, (q, jnp.int32(0)), None,
                                         length=L)
                return q, None
            q, _ = jax.lax.scan(pass_, q, None, length=R)
            return q
        return run

    for hc in (8, 16, 32):
        try:
            fn = loop(hc)
            out = fn(q, kk, vv)
            sync(out)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(q, kk, vv)
                sync(out)
                ts.append(time.perf_counter() - t0)
            t = min(ts)
            print(f"pallas stacked hc={hc}: {t*1e3/R:.3f} ms/pass "
                  f"({R*nbytes/t/1e9:.0f} GB/s)")
        except Exception as e:
            print(f"hc={hc}: FAIL {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
