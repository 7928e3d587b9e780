"""Does XLA read int4 weights at int4 bandwidth on this chip?

GEMV y = x @ W.astype(bf16) * scale for W stored bf16 / int8 / int4:
if the convert fuses into the dot (no materialized dequant copy), the
per-call time should scale with the STORED bytes — int4 at ~half the
int8 time would unlock a ~170 tok/s single-stream decode.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_int4.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=20):
    fn(*args)  # compile
    float(jnp.sum(fn(*args)))  # sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))        # forced transfer (axon sync quirk)
    return (time.perf_counter() - t0) / iters


def main():
    k, n, reps = 4096, 11008, 8   # ~8 layers' worth of one ffn matrix
    rng = np.random.default_rng(0)
    w_f = rng.standard_normal((reps, k, n), np.float32).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((1, k)), jnp.bfloat16)

    w_bf = jnp.asarray(w_f, jnp.bfloat16)
    scale = jnp.asarray(np.abs(w_f).max(axis=1) / 7.0,
                        jnp.bfloat16)            # (reps, n)
    w_i8 = jnp.asarray(np.clip(np.round(
        w_f / np.asarray(scale, np.float32)[:, None, :]), -127, 127),
        jnp.int8)
    w_i4 = w_i8.astype(jnp.int4)

    @jax.jit
    def dot_bf(x, w):
        def body(c, wi):
            return c, x @ wi
        _, ys = jax.lax.scan(body, 0, w)
        return ys

    @jax.jit
    def dot_q(x, w, s):
        def body(c, args):
            wi, si = args
            return c, (x @ wi.astype(jnp.bfloat16)) * si
        _, ys = jax.lax.scan(body, 0, (w, s))
        return ys

    t_bf = bench(dot_bf, x, w_bf)
    t_i8 = bench(dot_q, x, w_i8, scale)
    t_i4 = bench(dot_q, x, w_i4, scale)
    nbytes = reps * k * n
    for name, t, b in (("bf16", t_bf, 2 * nbytes),
                       ("int8", t_i8, nbytes),
                       ("int4", t_i4, nbytes / 2)):
        print(f"{name}: {t * 1e3:.2f} ms/call = "
              f"{b / t / 1e9:.0f} GB/s effective "
              f"({2 * nbytes / t / 1e9:.0f} GB/s bf16-equivalent)")
    # numerics sanity: int4 dequant dot close to the int8 one
    y8 = np.asarray(dot_q(x, w_i8, scale), np.float32)
    y4 = np.asarray(dot_q(x, w_i4, scale), np.float32)
    denom = np.abs(y8).mean() or 1.0
    print(f"int4-vs-int8 rel err {np.abs(y4 - y8).mean() / denom:.4f} "
          f"(int4 clips to [-8,7]: expected nonzero)")


if __name__ == "__main__":
    main()
