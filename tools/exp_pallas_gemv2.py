"""Pallas matvec v2: VPU multiply-accumulate instead of MXU dot.

out[f] = sum_h x[h] * w[h, f] computed as (hb,1)*(hb,fb) broadcast multiply
+ sum over sublanes, with x pre-broadcast to (H, 128) so the kernel slices
an (hb, 1) column without relayout. fp32 accumulation.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 8


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    return np.asarray(jax.device_get(leaf)).ravel()[:1]


def matvec_vpu(xcol, w, *, hb, fb):
    """xcol (H, 128) lane-replicated x; w (H, F) -> (1, F) fp32."""
    H, F = w.shape

    def kernel(x_ref, w_ref, o_ref):
        ih = pl.program_id(1)

        @pl.when(ih == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        xb = x_ref[:, :1].astype(jnp.float32)          # (hb, 1)
        prod = w_ref[:].astype(jnp.float32) * xb       # (hb, fb)
        o_ref[:] += jnp.sum(prod, axis=0, keepdims=True)

    return pl.pallas_call(
        kernel,
        grid=(F // fb, H // hb),
        in_specs=[
            pl.BlockSpec((hb, 128), lambda f, h: (h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, fb), lambda f, h: (h, f),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, fb), lambda f, h: (0, f),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, F), jnp.float32),
    )(xcol, w)


def matvec_vpu_bf16acc(xcol, w, *, hb, fb):
    """Same but multiply in bf16, upcast per-vreg-free: accumulate the bf16
    product into an fp32 total via jnp.sum dtype arg."""
    H, F = w.shape

    def kernel(x_ref, w_ref, o_ref):
        ih = pl.program_id(1)

        @pl.when(ih == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        prod = w_ref[:] * x_ref[:, :1]                  # bf16 (hb, fb)
        o_ref[:] += jnp.sum(prod, axis=0, keepdims=True,
                            dtype=jnp.float32)

    return pl.pallas_call(
        kernel,
        grid=(F // fb, H // hb),
        in_specs=[
            pl.BlockSpec((hb, 128), lambda f, h: (h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, fb), lambda f, h: (h, f),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, fb), lambda f, h: (0, f),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, F), jnp.float32),
    )(xcol, w)


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
    print(f"{name}: {t*1e3/R:.3f} ms/pass -> {R*nbytes/t/1e9:.1f} GB/s")


def chain(mv1, mv2):
    def run(x, w, w2):
        def pass_(x, _):
            def body(x, ws):
                a, b = ws
                y = mv1(x, a).astype(jnp.bfloat16)       # (1, F)
                ycol = jnp.broadcast_to(y[0, :, None], (y.shape[1], 128))
                z = mv2(ycol, b).astype(jnp.bfloat16)    # (1, H)
                zcol = jnp.broadcast_to(z[0, :, None] * 1e-3,
                                        (z.shape[1], 128))
                return zcol, None
            x, _ = jax.lax.scan(body, x, (w, w2))
            return x, None
        x, _ = jax.lax.scan(pass_, x, None, length=R)
        return x
    return jax.jit(run)


def main():
    L, H, F = 32, 4096, 11008
    dt = jnp.bfloat16
    w = jnp.full((L, H, F), 0.01, dt)
    w2 = jnp.full((L, F, H), 0.01, dt)
    nbytes = 2 * w.size * 2
    jax.block_until_ready((w, w2))
    xcol = jnp.full((H, 128), 0.01, dt)

    for mk, tag in [(matvec_vpu, "f32mul"), (matvec_vpu_bf16acc, "bf16mul")]:
        for hb1, fb1, hb2, fb2 in [
            (512, 256, 256, 512),
            (512, 5504, 5504, 512),
            (1024, 5504, 5504, 1024),
            (256, 5504, 5504, 256),
            (4096, 256, 5504, 512),
        ]:
            mv1 = functools.partial(mk, hb=hb1, fb=fb1)
            mv2 = functools.partial(mk, hb=hb2, fb=fb2)
            bench(f"vpu-{tag} ({hb1},{fb1})/({hb2},{fb2})",
                  chain(mv1, mv2), xcol, w, w2, nbytes=nbytes)


if __name__ == "__main__":
    main()
