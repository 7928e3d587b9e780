"""Microbenchmark: achievable HBM bandwidth of bs=1 GEMV chains, amortizing
the ~25 ms axon dispatch by repeating the whole chain R times inside one
executable (carry-dependent so nothing can be CSE'd)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

R = 8  # repeats per executable


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
    print(f"{name}: {t*1e3/R:.2f} ms/pass -> {R*nbytes/t/1e9:.1f} GB/s")


def repeat(body):
    """Run body R times with a carried x inside one jit."""
    def outer(x, *ws):
        def step(x, _):
            return body(x, *ws), None
        x, _ = jax.lax.scan(step, x, None, length=R)
        return x
    return jax.jit(outer)


def main():
    L, H, F = 32, 4096, 11008
    dt = jnp.bfloat16
    w = jnp.full((L, H, F), 0.01, dt)
    w2 = jnp.full((L, F, H), 0.01, dt)
    nbytes = 2 * w.size * w.dtype.itemsize
    jax.block_until_ready((w, w2))

    def chain(x, w, w2):
        def body(x, ws):
            a, b = ws
            return ((x @ a) @ b) * 1e-3, None
        x, _ = jax.lax.scan(body, x, (w, w2))
        return x

    x1 = jnp.full((1, H), 0.01, dt)
    x8 = jnp.full((8, H), 0.01, dt)
    bench("gemv bs=1 chain", repeat(chain), x1, w, w2, nbytes=nbytes)
    bench("gemv bs=8 chain", repeat(chain), x8, w, w2, nbytes=nbytes)

    def chain_silu(x, w, w2):
        def body(x, ws):
            a, b = ws
            y = jax.nn.silu((x @ a).astype(jnp.float32)).astype(dt)
            return ((y @ b)) * 1e-3, None
        x, _ = jax.lax.scan(body, x, (w, w2))
        return x

    bench("gemv bs=1 +silu fp32", repeat(chain_silu), x1, w, w2,
          nbytes=nbytes)

    def reduce_pass(x, w, w2):
        s = jnp.sum(w, dtype=jnp.float32) + jnp.sum(w2, dtype=jnp.float32)
        return x * (1.0 + s * 1e-30)

    bench("reduce same bytes", repeat(reduce_pass),
          jnp.full((1, H), 0.01, jnp.float32), w, w2, nbytes=nbytes)

    # unstacked (no scan over L): 64 separate dots in a chain
    ws = [jnp.full((H if i % 2 == 0 else F, F if i % 2 == 0 else H),
                   0.01, dt) for i in range(16)]
    jax.block_until_ready(ws)

    def unrolled(x, *ws):
        for a in ws:
            x = (x @ a) * 1e-2
        return x

    bench("gemv bs=1 unrolled16", repeat(unrolled), x1, *ws,
          nbytes=sum(a.size * 2 for a in ws))


if __name__ == "__main__":
    main()
