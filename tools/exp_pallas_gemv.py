"""Pallas bf16 matvec: can grid-pipelined weight-tile streaming beat XLA's
533 GB/s bs=1 GEMV? Sweeps block sizes and accumulation styles."""

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


def matvec(x, w, *, hb, fb, rows=1):
    """x (rows, H) @ w (H, F) -> (rows, F) fp32, grid-pipelined."""
    H, F = w.shape

    def kernel(x_ref, w_ref, o_ref):
        ih = pl.program_id(1)

        @pl.when(ih == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                            preferred_element_type=jnp.float32)

    return pl.pallas_call(
        kernel,
        grid=(F // fb, H // hb),
        in_specs=[
            pl.BlockSpec((rows, hb), lambda f, h: (0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, fb), lambda f, h: (h, f),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, fb), lambda f, h: (0, f),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, F), jnp.float32),
    )(x, w)


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
    print(f"{name}: {t*1e3/R:.3f} ms/pass -> {R*nbytes/t/1e9:.1f} GB/s")


def chain(mv1, mv2):
    """Alternate H->F->H matvecs over stacked weights, repeated R times."""
    def run(x, w, w2):
        def pass_(x, _):
            def body(x, ws):
                a, b = ws
                y = mv1(x, a).astype(jnp.bfloat16)
                return mv2(y, b).astype(jnp.bfloat16) * 1e-3, None
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
    x1 = jnp.full((1, H), 0.01, dt)

    # Constraints: block last dim %128 == 0, second-to-last %8 == 0, and
    # blocks must divide the array dims (4096, 11008) / (11008, 4096).
    # 11008 = 128*86, so F-axis (lane) blocks: 256 or 5504; as a leading
    # (sublane) dim any multiple of 8 dividing 11008 works (1376, 2752...).
    # hb is also the x-block LAST dim -> %128 too; on the 11008 axis that
    # leaves only 256 / 5504.
    for hb1, fb1, hb2, fb2 in [
        (512, 256, 256, 512),
        (1024, 256, 256, 1024),
        (4096, 256, 256, 2048),
        (512, 5504, 5504, 512),
        (2048, 256, 5504, 256),
        (1024, 256, 5504, 512),
    ]:
        try:
            mv1 = functools.partial(matvec, hb=hb1, fb=fb1)
            mv2 = functools.partial(matvec, hb=hb2, fb=fb2)
            bench(f"pallas ({hb1},{fb1})/({hb2},{fb2})",
                  chain(mv1, mv2), x1, w, w2, nbytes=nbytes)
        except Exception as e:
            print(f"pallas ({hb1},{fb1}): FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
