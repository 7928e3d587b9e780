"""Raw read bandwidth by array shape: XLA reduce and a Pallas sum kernel
over (a) the 5D KV-cache shape, (b) an equal-bytes 2D array."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 8
L, B, S, H, D = 32, 1, 640, 32, 128
NB = L * B * S * H * D * 2


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


def xla_reduce(x):
    @jax.jit
    def run(x, seed):
        def body(acc, _):
            s = jnp.sum(x.astype(jnp.float32) * acc)
            return acc * 0.999 + s * 1e-30, None
        acc, _ = jax.lax.scan(body, seed, None, length=R)
        return acc
    return lambda: run(x, jnp.float32(1.0))


def pallas_sum_2d(x, rb=2048):
    N, Dd = x.shape

    def kernel(s_ref, x_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[0, 0] += jnp.sum(x_ref[:], dtype=jnp.float32) * s_ref[0, 0]

    call = pl.pallas_call(
        kernel,
        grid=(N // rb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((rb, Dd), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )

    @jax.jit
    def run(x, seed):
        def body(acc, _):
            s = call(acc.reshape(1, 1), x)[0, 0]
            return acc * 0.999 + s * 1e-30, None
        acc, _ = jax.lax.scan(body, seed, None, length=R)
        return acc
    return lambda: run(x, jnp.float32(1.0))


def main():
    cache = jnp.full((L, B, H, S, D), 0.01, jnp.bfloat16)
    flat = jnp.full((L * B * H * S, D), 0.01, jnp.bfloat16)
    wide = jnp.full((NB // 2 // 2048, 2048), 0.01, jnp.bfloat16)
    jax.block_until_ready((cache, flat, wide))

    bench("xla reduce 5D cache", xla_reduce(cache), nbytes=NB)
    bench("xla reduce 2D (N,128)", xla_reduce(flat), nbytes=NB)
    bench("xla reduce 2D (N,2048)", xla_reduce(wide), nbytes=NB)
    bench("pallas sum 2D (N,128) rb=4096", pallas_sum_2d(flat, 4096),
          nbytes=NB)
    bench("pallas sum 2D (N,2048) rb=512", pallas_sum_2d(wide, 512),
          nbytes=NB)


if __name__ == "__main__":
    main()
