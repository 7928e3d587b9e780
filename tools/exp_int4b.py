"""int4 GEMV bandwidth WITHIN one executable.

Passing device-resident int4 arrays between jits crashes this
toolchain's transfer layer (relayout recursion — see exp_int4.py), so
this variant converts int8 -> int4 once INSIDE the executable and scans
the dequant-dot with a data-dependent carry (defeats CSE/hoisting):
per-iteration time isolates the steady-state read rate of the stored
weights.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_int4b.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    k, n, reps = 4096, 11008, 8
    rng = np.random.default_rng(0)
    w8 = jnp.asarray(rng.integers(-7, 8, (reps, k, n)), jnp.int8)
    scale = jnp.asarray(rng.standard_normal((reps, n)) * 0.01,
                        jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((1, k)), jnp.bfloat16)

    def make_loop(cast_dtype):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(x, w8, s, iters):
            w = w8.astype(cast_dtype)

            def body(x_c, _):
                def inner(ci, args):
                    wi, si = args
                    y = (x_c @ wi.astype(jnp.bfloat16)) * si
                    return ci + jnp.sum(y.astype(jnp.float32)), None
                acc, _ = jax.lax.scan(inner, 0.0, (w, s))
                # data-dependent next input: forces every iteration to
                # actually run (no CSE/hoisting)
                x_next = (x_c *
                          (1.0 + 1e-12 * acc).astype(jnp.bfloat16))
                return x_next, acc
            x_fin, accs = jax.lax.scan(body, x, None, length=iters)
            return jnp.sum(accs) + jnp.sum(x_fin.astype(jnp.float32))
        return loop

    nbytes = reps * k * n
    for name, dtype, stored in (("bf16", jnp.bfloat16, 2 * nbytes),
                                ("int8", jnp.int8, nbytes),
                                ("int4", jnp.int4, nbytes / 2)):
        loop = make_loop(dtype)
        times = {}
        for iters in (4, 24):
            out = float(loop(x, w8, scale, iters))       # compile
            t0 = time.perf_counter()
            out = float(loop(x, w8, scale, iters))
            times[iters] = time.perf_counter() - t0
        per_iter = (times[24] - times[4]) / 20
        print(f"{name}: {per_iter * 1e3:.2f} ms/iter = "
              f"{stored / per_iter / 1e9:.0f} GB/s stored-bytes, "
              f"{2 * nbytes / per_iter / 1e9:.0f} GB/s bf16-equivalent "
              f"(checksum {out:.1f})", flush=True)


if __name__ == "__main__":
    main()
