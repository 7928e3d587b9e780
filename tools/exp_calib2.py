"""True HBM calibration (carry-scaled reduce, no hoistable subexpressions)
+ GEMV layout variants."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

R = 6


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
    print(f"{name}: {t*1e3/R:.3f} ms/pass -> {R*nbytes/t/1e9:.1f} GB/s")


def main():
    L, H, F = 32, 4096, 11008
    dt = jnp.bfloat16
    w = jnp.full((L, H, F), 0.01, dt)
    w2 = jnp.full((L, F, H), 0.01, dt)
    nbytes = 2 * w.size * 2
    jax.block_until_ready((w, w2))

    # calib: every element is multiplied by the carry before reduction,
    # so no pass can be hoisted or CSE'd
    @jax.jit
    def reduce_carry(w, w2, seed):
        def body(acc, _):
            s = (jnp.sum(w.astype(jnp.float32) * acc)
                 + jnp.sum(w2.astype(jnp.float32) * acc))
            return acc * 0.999 + s * 1e-30, None
        acc, _ = jax.lax.scan(body, seed, None, length=R)
        return acc

    bench("calib reduce*carry", reduce_carry, w, w2, jnp.float32(1.0),
          nbytes=nbytes)

    x1 = jnp.full((1, H), 0.01, dt)

    def mk_chain(body):
        def run(x, w, w2):
            def pass_(x, _):
                def step(x, ws):
                    return body(x, *ws), None
                x, _ = jax.lax.scan(step, x, (w, w2))
                return x, None
            x, _ = jax.lax.scan(pass_, x, None, length=R)
            return x
        return jax.jit(run)

    def plain(x, a, b):
        return ((x @ a) @ b) * 1e-3

    bench("xla x@W (baseline)", mk_chain(plain), x1, w, w2, nbytes=nbytes)

    # transposed: contract over the LAST dim of wT
    wT = jnp.full((L, F, H), 0.01, dt)   # acts as (F, H) per layer
    w2T = jnp.full((L, H, F), 0.01, dt)

    def transposed(x, aT, bT):
        y = jnp.einsum("bh,fh->bf", x, aT)
        return jnp.einsum("bf,hf->bh", y, bT) * 1e-3

    bench("xla x@W^T", mk_chain(transposed), x1, wT, w2T, nbytes=nbytes)

    # fp32 accum preferred type
    def pref(x, a, b):
        y = jnp.einsum("bh,hf->bf", x, a,
                       preferred_element_type=jnp.float32).astype(dt)
        return jnp.einsum("bf,fh->bh", y, b,
                          preferred_element_type=jnp.float32).astype(dt) * 1e-3

    bench("xla pref_f32", mk_chain(pref), x1, w, w2, nbytes=nbytes)


if __name__ == "__main__":
    main()
